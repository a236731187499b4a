"""From-scratch T5 building blocks (no HuggingFace, no torch).

Numerics follow the T5 v1.0 recipe the reference fine-tunes (HF t5-base via
T5Stack; reference call sites modeling/t5_generative_retriever.py:358-416):
RMSNorm without mean-centering, pre-norm residuals, relative-position-bucket
attention bias in the first layer of each stack only, and *unscaled* dot-product
attention (the 1/sqrt(d_k) factor is absorbed into initialization).

All modules take a ``dtype`` (compute precision, bf16 on TPU) and keep params
in ``param_dtype`` (fp32). Attention exposes projection methods separately so
the decode path can build KV caches functionally (threaded through lax.scan)
instead of via mutable collections.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ripor_tpu.models.config import T5Config

NEG_INF = -1e9  # additive mask value; matches reference masking (generation.py:460-463)


class RMSNorm(nn.Module):
    """T5 LayerNorm: no mean subtraction, no bias (HF T5LayerNorm semantics)."""

    dim: int
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale.astype(jnp.float32)).astype(self.dtype)


def relative_position_bucket(relative_position: jnp.ndarray,
                             bidirectional: bool,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """T5 relative-position bucketing (key_pos - query_pos -> bucket id)."""
    ret = jnp.zeros_like(relative_position)
    n = relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = -jnp.minimum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # log-spaced buckets for larger distances; clamp log arg away from 0
    n_safe = jnp.maximum(n, 1).astype(jnp.float32)
    val_if_large = max_exact + (
        jnp.log(n_safe / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """Bucketed relative-position bias -> [1, heads, q_len, k_len]."""

    cfg: T5Config
    bidirectional: bool
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_len: int, k_len: int):
        cfg = self.cfg
        table = self.param(
            "rel_embedding",
            nn.initializers.normal(stddev=1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads),
            self.param_dtype,
        )
        q_pos = jnp.arange(q_len)[:, None]
        k_pos = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            k_pos - q_pos,
            bidirectional=self.bidirectional,
            num_buckets=cfg.relative_attention_num_buckets,
            max_distance=cfg.relative_attention_max_distance,
        )
        bias = table[buckets]  # [q, k, heads]
        return jnp.transpose(bias, (2, 0, 1))[None].astype(self.dtype)  # [1, H, q, k]


def dot_product_attention(q, k, v, bias=None, dtype=jnp.float32):
    """Unscaled T5 attention. q: [B, Lq, H, D]; k, v: [B, Lk, H, D].

    bias: additive [B or 1, H, Lq, Lk] (relpos bias + mask), accumulated fp32.
    """
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class Attention(nn.Module):
    """T5 multi-head attention with separately callable projections.

    The stack calls ``__call__`` for full-sequence paths and the
    (project_q / project_kv / attend / out) pieces for cached decoding.
    """

    cfg: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        inner = cfg.inner_dim
        dense = lambda name, fan_out, std: nn.Dense(
            fan_out, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(stddev=std), name=name)
        # T5 init: q absorbs the 1/sqrt(d_k) attention scale
        self.q = dense("q", inner, (cfg.d_model * cfg.d_kv) ** -0.5)
        self.k = dense("k", inner, cfg.d_model ** -0.5)
        self.v = dense("v", inner, cfg.d_model ** -0.5)
        self.o = dense("o", cfg.d_model, inner ** -0.5)

    def _split(self, x):
        b, l, _ = x.shape
        return x.reshape(b, l, self.cfg.num_heads, self.cfg.d_kv)

    def project_q(self, x):
        return self._split(self.q(x))

    def project_kv(self, x):
        return self._split(self.k(x)), self._split(self.v(x))

    def out(self, attn):
        b, l = attn.shape[:2]
        return self.out_flat(attn.reshape(b, l, self.cfg.inner_dim))

    def out_flat(self, attn_flat):
        """Output projection on pre-flattened [B, L, inner] attention.
        Under tensor parallelism (cfg.tp_axis) each device holds a head
        shard and a row shard of o — the partial products all-reduce here
        (the megatron pattern)."""
        y = self.o(attn_flat)
        if self.cfg.tp_axis is not None:
            y = jax.lax.psum(y, self.cfg.tp_axis)
        return y

    def __call__(self, x, kv_input=None, bias=None):
        kv_input = x if kv_input is None else kv_input
        q = self.project_q(x)
        k, v = self.project_kv(kv_input)
        attn = dot_product_attention(q, k, v, bias=bias, dtype=self.dtype)
        return self.out(attn)


class FeedForward(nn.Module):
    """T5 FFN: wi -> relu -> wo (v1.0) or gated variant (v1.1)."""

    cfg: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        dense = lambda name, fan_out, std: nn.Dense(
            fan_out, use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(stddev=std), name=name)
        if cfg.is_gated:
            act = {"gated-gelu": nn.gelu, "gated-silu": nn.silu}[cfg.feed_forward_proj]
            h = act(dense("wi_0", cfg.d_ff, cfg.d_model ** -0.5)(x))
            h = h * dense("wi_1", cfg.d_ff, cfg.d_model ** -0.5)(x)
        else:
            h = nn.relu(dense("wi", cfg.d_ff, cfg.d_model ** -0.5)(x))
        h = nn.Dropout(cfg.dropout_rate)(h, deterministic=deterministic)
        y = dense("wo", cfg.d_model, cfg.d_ff ** -0.5)(h)
        if cfg.tp_axis is not None:   # megatron row-parallel wo all-reduce
            y = jax.lax.psum(y, cfg.tp_axis)
        return y


def padding_bias(mask: jnp.ndarray) -> jnp.ndarray:
    """[B, Lk] 1/0 mask -> additive [B, 1, 1, Lk] bias."""
    return jnp.where(mask[:, None, None, :] > 0, 0.0, NEG_INF)


def causal_bias(length: int) -> jnp.ndarray:
    """Additive [1, 1, L, L] causal mask."""
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    return jnp.where(j <= i, 0.0, NEG_INF)[None, None]
