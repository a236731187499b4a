"""T5 encoder / decoder stacks, from scratch in flax.linen.

Capability parity with the reference's use of HF ``T5Stack``
(modeling/t5_generative_retriever.py:95-101, 358-416), rebuilt TPU-first:

* the decoder has a *functional* KV-cache decode path (``decode_step``) whose
  state is an explicit pytree, so constrained beam search runs as one
  ``lax.scan`` with zero host synchronization (contrast: reference
  tasks/generation.py:423-530 reorders HF cache tuples on host each step);
* beams are a first-class axis: decode-step attention einsums carry a beam
  dim ``n`` and attend to *unexpanded* encoder KV ([B, S, H, D] shared across
  beams) instead of materializing encoder states x num_beams (contrast:
  reference expand at tasks/generation.py:230-233).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ripor_tpu.models.config import T5Config
from ripor_tpu.models.layers import (
    Attention,
    FeedForward,
    NEG_INF,
    RMSNorm,
    RelativePositionBias,
    causal_bias,
    dot_product_attention,
    padding_bias,
)

# Decode cache: ONE stacked array [L, 2, B, N, M, H, D] (k=index 0, v=1).
# A single buffer keeps the beam reorder a single kernel call on a reshape
# view (no per-layer stack/unstack copies) and lets scan donate it in place.
Cache = jnp.ndarray
CrossKV = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]


class EncoderLayer(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.attn_norm = RMSNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, **kw)
        self.attn = Attention(self.cfg, **kw)
        self.ffn_norm = RMSNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, **kw)
        self.ffn = FeedForward(self.cfg, **kw)
        self.dropout = nn.Dropout(self.cfg.dropout_rate)

    def __call__(self, x, bias, deterministic: bool = True):
        h = self.attn(self.attn_norm(x), bias=bias)
        x = x + self.dropout(h, deterministic=deterministic)
        h = self.ffn(self.ffn_norm(x), deterministic=deterministic)
        return x + self.dropout(h, deterministic=deterministic)


class Encoder(nn.Module):
    """T5 encoder over already-embedded inputs (token embedding lives in the
    top-level model so it can be shared/tied)."""

    cfg: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.rel_bias = RelativePositionBias(self.cfg, bidirectional=True, **kw)
        self.layers = [EncoderLayer(self.cfg, name=f"layer_{i}", **kw)
                       for i in range(self.cfg.num_layers)]
        self.final_norm = RMSNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, **kw)
        self.dropout = nn.Dropout(self.cfg.dropout_rate)

    def __call__(self, embeds, mask, deterministic: bool = True):
        L = embeds.shape[1]
        bias = self.rel_bias(L, L) + padding_bias(mask).astype(jnp.float32)
        x = self.dropout(embeds, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, bias, deterministic=deterministic)
        x = self.final_norm(x)
        return self.dropout(x, deterministic=deterministic)


def _step_self_attention(q, cache_k, cache_v, bias_row, dtype):
    """Single-position self-attention over cached keys.

    q: [B, N, H, D]; cache: [B, N, M, H, D]; bias_row: [H, M] (relpos row t
    + causal mask for positions > t). Returns [B, N, H, D].
    """
    scores = jnp.einsum("bnhd,bnmhd->bnhm", q, cache_k, preferred_element_type=jnp.float32)
    scores = scores + bias_row[None, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bnhm,bnmhd->bnhd", probs, cache_v)


def _step_cross_attention(q, enc_k, enc_v, enc_bias, dtype):
    """Beam-shared cross-attention: q [B, N, H, D] x enc [B, S, H, D].

    enc_bias: [B, S] additive padding bias. Encoder KV is NOT expanded per
    beam — the einsum broadcasts it (key TPU memory/bandwidth win vs the
    reference's x num_beams expansion).
    """
    scores = jnp.einsum("bnhd,bshd->bnhs", q, enc_k, preferred_element_type=jnp.float32)
    scores = scores + enc_bias[:, None, None, :].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    return jnp.einsum("bnhs,bshd->bnhd", probs, enc_v)


class DecoderLayer(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        eps = self.cfg.layer_norm_epsilon
        self.self_attn_norm = RMSNorm(self.cfg.d_model, eps, **kw)
        self.self_attn = Attention(self.cfg, **kw)
        self.cross_attn_norm = RMSNorm(self.cfg.d_model, eps, **kw)
        self.cross_attn = Attention(self.cfg, **kw)
        self.ffn_norm = RMSNorm(self.cfg.d_model, eps, **kw)
        self.ffn = FeedForward(self.cfg, **kw)
        self.dropout = nn.Dropout(self.cfg.dropout_rate)

    def __call__(self, x, enc, self_bias, cross_bias, deterministic: bool = True):
        h = self.self_attn(self.self_attn_norm(x), bias=self_bias)
        x = x + self.dropout(h, deterministic=deterministic)
        h = self.cross_attn(self.cross_attn_norm(x), kv_input=enc, bias=cross_bias)
        x = x + self.dropout(h, deterministic=deterministic)
        h = self.ffn(self.ffn_norm(x), deterministic=deterministic)
        return x + self.dropout(h, deterministic=deterministic)

    def cross_kv(self, enc):
        """Precompute cross-attention K/V from encoder output (once per query)."""
        return self.cross_attn.project_kv(enc)

    def step_qkv(self, x):
        """Self-attention projections for one decode position. x: [B, N, d]
        -> (q, k, v) each [B, N, H, D]. The stack writes k/v into the shared
        cache buffer (in place under scan) before calling step_finish."""
        h = self.self_attn_norm(x)
        q = self.self_attn.project_q(h)
        k, v = self.self_attn.project_kv(h)
        return q, k, v

    def step_finish(self, x, q, cache_k, cache_v, enc_k, enc_v, enc_bias,
                    self_bias_row):
        """Attention over the (already updated) cache slices + cross + FFN."""
        attn = _step_self_attention(q, cache_k, cache_v, self_bias_row, self.dtype)
        x = x + self._proj_out(attn)
        h = self.cross_attn_norm(x)
        cq = self.cross_attn.project_q(h)
        attn = _step_cross_attention(cq, enc_k, enc_v, enc_bias, self.dtype)
        x = x + self._proj_out_cross(attn)
        x = x + self.ffn(self.ffn_norm(x), deterministic=True)
        return x

    def _proj_out(self, attn):
        b, n = attn.shape[:2]
        return self.self_attn.o(attn.reshape(b, n, self.cfg.inner_dim))

    def _proj_out_cross(self, attn):
        b, n = attn.shape[:2]
        return self.cross_attn.o(attn.reshape(b, n, self.cfg.inner_dim))


class Decoder(nn.Module):
    """T5 decoder over already-embedded inputs, with full-seq and step paths.

    Keeps the final layer norm (the reference's no-final-norm DecoderT5Stack
    is gated off: modeling/t5_generative_retriever.py:67)."""

    cfg: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.rel_bias = RelativePositionBias(self.cfg, bidirectional=False, **kw)
        self.layers = [DecoderLayer(self.cfg, name=f"layer_{i}", **kw)
                       for i in range(self.cfg.num_decoder_layers)]
        self.final_norm = RMSNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, **kw)
        self.dropout = nn.Dropout(self.cfg.dropout_rate)

    def __call__(self, embeds, enc, enc_mask, deterministic: bool = True):
        L = embeds.shape[1]
        self_bias = self.rel_bias(L, L) + causal_bias(L).astype(jnp.float32)
        cross_bias = padding_bias(enc_mask).astype(jnp.float32)
        x = self.dropout(embeds, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, enc, self_bias, cross_bias, deterministic=deterministic)
        x = self.final_norm(x)
        return self.dropout(x, deterministic=deterministic)

    # ---- decode path ----

    def full_self_bias(self, max_len: int) -> jnp.ndarray:
        """[H, M, M] relpos+causal bias, computed once before the scan."""
        bias = self.rel_bias(max_len, max_len)[0]  # [H, M, M]
        return bias + causal_bias(max_len)[0, 0].astype(jnp.float32)

    def precompute_cross_kv(self, enc) -> CrossKV:
        return tuple(layer.cross_kv(enc) for layer in self.layers)

    def init_cache(self, batch: int, num_beams: int, max_len: int) -> Cache:
        cfg = self.cfg
        return jnp.zeros((cfg.num_decoder_layers, 2, batch, num_beams,
                          max_len, cfg.num_heads, cfg.d_kv), self.dtype)

    def decode_step(self, x, cache: Cache, cross_kv: CrossKV, enc_bias,
                    self_bias_full, t):
        """x: [B, N, d] input embeds at position t. cache: [L, 2, B, N, Mc,
        H, D] where Mc is the live slot budget (may be < full M under
        segmented decoding). Returns (hidden, new_cache)."""
        cache_len = cache.shape[4]
        bias_row = jax.lax.dynamic_index_in_dim(self_bias_full, t, axis=1,
                                                keepdims=False)[:, :cache_len]
        # mask future key positions (cache slots > t are zeros/garbage)
        key_pos = jnp.arange(cache_len)
        bias_row = bias_row + jnp.where(key_pos <= t, 0.0, NEG_INF)[None, :]
        for l, (layer, (enc_k, enc_v)) in enumerate(zip(self.layers, cross_kv)):
            q, k, v = layer.step_qkv(x)
            cache = jax.lax.dynamic_update_slice(
                cache, k[None, None, :, :, None], (l, 0, 0, 0, t, 0, 0))
            cache = jax.lax.dynamic_update_slice(
                cache, v[None, None, :, :, None], (l, 1, 0, 0, t, 0, 0))
            x = layer.step_finish(x, q, cache[l, 0], cache[l, 1],
                                  enc_k, enc_v, enc_bias, bias_row)
        return self.final_norm(x), cache
