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

from typing import Tuple

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
        layer_cls = EncoderLayer
        if self.cfg.remat_layers:   # deterministic (argnum 3) is static
            layer_cls = nn.remat(EncoderLayer, static_argnums=(3,))
        self.layers = [layer_cls(self.cfg, name=f"layer_{i}", **kw)
                       for i in range(self.cfg.num_layers)]
        self.final_norm = RMSNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, **kw)
        self.dropout = nn.Dropout(self.cfg.dropout_rate)

    def __call__(self, embeds, mask, deterministic: bool = True):
        L = embeds.shape[1]
        bias = self.rel_bias(L, L) + padding_bias(mask).astype(jnp.float32)
        x = self.dropout(embeds, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, bias, deterministic)
        x = self.final_norm(x)
        return self.dropout(x, deterministic=deterministic)


def _step_self_attention(q, cache_k, cache_v, bias_row, dtype):
    """Single-position self-attention over cached keys.

    q: [B, N, H, D]; cache: [B, N, M, H, D]; bias_row: [H, M] (relpos row t
    + causal mask for positions > t). Returns [B, N, H, D].

    Deliberately NOT a dot_general: per-beam decode attention is a batched
    matvec, and XLA's dot layout assignment wants the beam axis minor —
    which fights the default layout the pallas beam-reorder kernel pins on
    the KV cache, inserting two full-cache relayout copies per decode step
    (~40% of step time at beam 1000). As broadcast-multiply + reduce the op
    lowers to a layout-agnostic VPU fusion that reads the cache in place;
    the FLOPs (2*N*M*d_model per layer) are trivially VPU-affordable.
    """
    scores = (q[:, :, None].astype(jnp.float32)
              * cache_k.astype(jnp.float32)).sum(-1)        # [B, N, M, H]
    scores = scores + bias_row.T[None, None].astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=2)
    return (probs[..., None].astype(jnp.float32)
            * cache_v.astype(jnp.float32)).sum(2).astype(dtype)  # [B, N, H, D]


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
        return self.step_finish_with_attn(x, attn.reshape(
            x.shape[0], x.shape[1], self.cfg.inner_dim), enc_k, enc_v, enc_bias)

    def step_finish_with_attn(self, x, attn_flat, enc_k, enc_v, enc_bias,
                              ffn_q=None):
        """Residual + output proj for a precomputed self-attention result
        [B, N, inner_dim] (pallas step_attention path), then cross + FFN.
        ``ffn_q``: optional (wi_q, wi_s, wo_q, wo_s) int8 FFN weights for
        THIS layer (ops/int8_ffn.py) — replaces the bf16 FFN matmuls with
        int8 MXU dots (2x rate on v5e)."""
        x = x + self.self_attn.out_flat(attn_flat)
        h = self.cross_attn_norm(x)
        cq = self.cross_attn.project_q(h)
        attn = _step_cross_attention(cq, enc_k, enc_v, enc_bias, self.dtype)
        x = x + self._proj_out_cross(attn)
        if ffn_q is not None:
            from ripor_tpu.ops.int8_ffn import ffn_int8_apply
            return x + ffn_int8_apply(self.ffn_norm(x), *ffn_q,
                                      tp_axis=self.cfg.tp_axis)
        x = x + self.ffn(self.ffn_norm(x), deterministic=True)
        return x

    def _proj_out(self, attn):
        b, n = attn.shape[:2]
        return self.self_attn.out_flat(attn.reshape(b, n, self.cfg.inner_dim))

    def _proj_out_cross(self, attn):
        b, n = attn.shape[:2]
        return self.cross_attn.out_flat(attn.reshape(b, n, self.cfg.inner_dim))


class Decoder(nn.Module):
    """T5 decoder over already-embedded inputs, with full-seq and step paths.

    Keeps the final layer norm (the reference's no-final-norm DecoderT5Stack
    is gated off: modeling/t5_generative_retriever.py:67)."""

    cfg: T5Config
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # "xla" (reduce-fusion, CPU-safe) | "pallas" (step_attention kernel; on
    # TPU keeps the KV cache layout pinned so no relayout copies appear
    # between the attention and the beam-reorder kernel)
    step_attn_impl: str = "xla"

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.rel_bias = RelativePositionBias(self.cfg, bidirectional=False, **kw)
        layer_cls = DecoderLayer
        if self.cfg.remat_layers:   # deterministic (argnum 5) is static
            layer_cls = nn.remat(DecoderLayer, static_argnums=(5,))
        self.layers = [layer_cls(self.cfg, name=f"layer_{i}", **kw)
                       for i in range(self.cfg.num_decoder_layers)]
        self.final_norm = RMSNorm(self.cfg.d_model, self.cfg.layer_norm_epsilon, **kw)
        self.dropout = nn.Dropout(self.cfg.dropout_rate)

    def __call__(self, embeds, enc, enc_mask, deterministic: bool = True):
        L = embeds.shape[1]
        self_bias = self.rel_bias(L, L) + causal_bias(L).astype(jnp.float32)
        cross_bias = padding_bias(enc_mask).astype(jnp.float32)
        x = self.dropout(embeds, deterministic=deterministic)
        for layer in self.layers:
            x = layer(x, enc, self_bias, cross_bias, deterministic)
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
        """KV cache [L, 2, B, N, Mc, H*D]: heads kept MERGED in storage so
        the minor dims (Mc, H*D=768) tile exactly to the TPU (8, 128) layout
        — a [.., H=12, D=64] cache pads to (16, 128) per tile, a 2.7x memory
        and bandwidth tax on every cache touch (attention reads + the beam
        reorder each step). Heads are split transiently at the einsum."""
        cfg = self.cfg
        return jnp.zeros((cfg.num_decoder_layers, 2, batch, num_beams,
                          max_len, cfg.inner_dim), self.dtype)

    def decode_step(self, x, cache: Cache, cross_kv: CrossKV, enc_bias,
                    self_bias_full, t):
        """x: [B, N, d] input embeds at position t. cache: [L, 2, B, N, Mc,
        H*D] where Mc is the live slot budget (may be < full M under
        segmented decoding).

        Returns (hidden, cache, kv_new): on the XLA path kv_new is None and
        ``cache`` has position t's k/v written at its slot; on the pallas
        path the cache is returned UNTOUCHED and kv_new [L, 2, B, N, H*D]
        carries the new rows — the beam loop folds them in during the
        reorder (ops/beam_gather.py::beam_gather_update), so the cache has
        exactly one writer per step and XLA never copies it."""
        cfg = self.cfg
        B, N = x.shape[:2]
        cache_len = cache.shape[4]
        bias_row = jax.lax.dynamic_index_in_dim(self_bias_full, t, axis=1,
                                                keepdims=False)[:, :cache_len]
        key_pos = jnp.arange(cache_len)
        if self.step_attn_impl == "pallas":
            return self._decode_step_pallas(x, cache, cross_kv, enc_bias,
                                            bias_row, key_pos, t)
        # mask future key positions (cache slots > t are zeros/garbage)
        bias_row = bias_row + jnp.where(key_pos <= t, 0.0, NEG_INF)[None, :]
        heads = (B, N, cache_len, cfg.num_heads, cfg.d_kv)
        for l, (layer, (enc_k, enc_v)) in enumerate(zip(self.layers, cross_kv)):
            q, k, v = layer.step_qkv(x)
            cache = jax.lax.dynamic_update_slice(
                cache, k.reshape(B, N, -1)[None, None, :, :, None],
                (l, 0, 0, 0, t, 0))
            cache = jax.lax.dynamic_update_slice(
                cache, v.reshape(B, N, -1)[None, None, :, :, None],
                (l, 1, 0, 0, t, 0))
            x = layer.step_finish(x, q, cache[l, 0].reshape(heads),
                                  cache[l, 1].reshape(heads),
                                  enc_k, enc_v, enc_bias, bias_row)
        return self.final_norm(x), cache, None

    def init_cache_merged(self, batch: int, num_beams: int, max_len: int,
                          quantized: "bool | str" = False) -> jnp.ndarray:
        """K|V-merged cache [L, B, N, Mc, 2*H*D] for the deferred decode
        path: one row carries a beam's keys AND values so the gather moves
        it with a single DMA (ops/attend_reorder.py layout contract).
        ``quantized``: True/"int8" — int8 rows with SCALE_COLS extra columns
        of per-head power-of-2 exponents (halves the decode loop's cache
        bandwidth); "int4" — packed nibble rows [inner + SCALE_COLS]
        (quarter bandwidth; K in low nibbles, V in high)."""
        cfg = self.cfg
        if quantized:
            from ripor_tpu.ops.attend_reorder import SCALE_COLS
            payload = (cfg.inner_dim if quantized == "int4"
                       else 2 * cfg.inner_dim)
            return jnp.zeros((cfg.num_decoder_layers, batch, num_beams,
                              max_len, payload + SCALE_COLS), jnp.int8)
        return jnp.zeros((cfg.num_decoder_layers, batch, num_beams,
                          max_len, 2 * cfg.inner_dim), self.dtype)

    def decode_step_deferred(self, x, cache_src, cache_dst, src, kvg,
                             cross_kv: CrossKV, enc_bias, self_bias_full, t,
                             write_back: bool = True, ar_chunk=None,
                             ffn_q=None):
        """TPU decode step with the beam reorder DEFERRED one step and fused
        into the attention kernel (ops/attend_reorder.py): per layer, rows
        are gathered from ``cache_src`` by ``src`` (previous step's beam
        permutation), step t-1's k/v (``kvg``, already in current beam
        order) complete the reorder at slot t-1, and the ordered rows are
        written back to ``cache_dst`` while attention computes. Cuts the
        per-step cache traffic from three passes to two, both at
        parallel-DMA bandwidth.

        x: [B, N, d] position-t input embeds (current beams);
        cache_src/cache_dst: [L, B, N, Mc, 2F] K|V-merged ping-pong pair
        (init_cache_merged); src: [B, N] int32; kvg: [B, N, L*2F]
        (layer-major rows — one gather DMA moves a beam's k/v for ALL
        layers; the kernel slices its layer via the scalar-prefetched
        layer index). Returns (hidden, new_cache, kv_new [B, N, L*2F]);
        new_cache is cache_dst's buffer (stale when write_back=False).
        """
        from ripor_tpu.ops.attend_reorder import step_attend_reorder
        cfg = self.cfg
        B, N = x.shape[:2]
        cache_len = cache_src.shape[3]
        bias_row = jax.lax.dynamic_index_in_dim(self_bias_full, t, axis=1,
                                                keepdims=False)[:, :cache_len]
        key_pos = jnp.arange(cache_len)
        bias_hist = (bias_row
                     + jnp.where(key_pos < t, 0.0, NEG_INF)[None, :]).T
        bias_new = jax.lax.dynamic_index_in_dim(
            bias_row, t, axis=1, keepdims=False)[None, :]    # [1, H]
        kvnews = []
        cache = cache_dst
        for l, (layer, (enc_k, enc_v)) in enumerate(zip(self.layers, cross_kv)):
            q, k, v = layer.step_qkv(x)
            qf = q.reshape(B, N, -1)
            kvf = jnp.concatenate([k.reshape(B, N, -1),
                                   v.reshape(B, N, -1)], axis=-1)
            attn, cache = step_attend_reorder(
                qf, kvf, kvg, cache_src, cache, src, l, t,
                bias_hist, bias_new, cfg.num_heads, write_back=write_back,
                chunk=ar_chunk)
            lq = None if ffn_q is None else tuple(a[l] for a in ffn_q)
            x = layer.step_finish_with_attn(x, attn, enc_k, enc_v, enc_bias,
                                            ffn_q=lq)
            kvnews.append(kvf)
        kv_new = jnp.stack(kvnews, axis=2).reshape(B, N, -1)
        return self.final_norm(x), cache, kv_new

    def init_cache_megarow(self, batch: int, num_beams: int, max_len: int,
                           quantized: "bool | str" = False) -> jnp.ndarray:
        """Beam-major K|V-merged cache [B, N, L, Mc, RW] for the megarow
        decode path (ops/megarow.py): one beam's rows for ALL layers are
        contiguous, so the per-step reorder moves them with a single DMA.
        Same row widths/quant encoding as init_cache_merged."""
        cfg = self.cfg
        if quantized:
            from ripor_tpu.ops.attend_reorder import SCALE_COLS
            payload = (cfg.inner_dim if quantized == "int4"
                       else 2 * cfg.inner_dim)
            return jnp.zeros((batch, num_beams, cfg.num_decoder_layers,
                              max_len, payload + SCALE_COLS), jnp.int8)
        return jnp.zeros((batch, num_beams, cfg.num_decoder_layers,
                          max_len, 2 * cfg.inner_dim), self.dtype)

    def decode_step_megarow(self, x, cache_src, cache_dst, src, kvg,
                            cross_kv: CrossKV, enc_bias, self_bias_full, t,
                            ar_chunk=None, ffn_q=None, emit_quant=None):
        """TPU decode step over the beam-major megarow cache: ONE all-layers
        reorder kernel completes the deferred beam permutation (+ slot t-1
        insert) up front, then each layer's attention streams its already
        ordered rows sequentially (ops/megarow.py — descriptor-count
        restructure of decode_step_deferred; same pending-reorder dataflow).

        x: [B, N, d]; cache_src/cache_dst: [B, N, L, Mc, RW] ping-pong pair
        (init_cache_megarow); src: [B, N] int32; kvg: [B, N, L*2F] — in
        RIPOR_MR_FUSED_KVG mode this is step t-1's UN-permuted kv_new and
        the reorder kernel gathers rows by src itself.
        Returns (hidden, new_cache, kv_new [B, N, L*2F]).

        ``emit_quant`` ("int8"/"int4", RIPOR_MR_QFUSE): the attention
        kernel additionally emits each layer's fresh kv quantized to
        cache-layout rows, and the returned kv_new is the int8
        [B, N, L*RW] stack — the caller gathers it and the next step's
        reorder inserts it verbatim (kvg_pre), skipping both the in-kernel
        quantize and any standalone XLA quantize pass."""
        from ripor_tpu.ops.megarow import (FUSED_KVG, reorder_cache_all,
                                           step_attention_seq)
        cfg = self.cfg
        B, N = x.shape[:2]
        cache_len = cache_src.shape[3]
        bias_row = jax.lax.dynamic_index_in_dim(self_bias_full, t, axis=1,
                                                keepdims=False)[:, :cache_len]
        key_pos = jnp.arange(cache_len)
        bias_hist = (bias_row
                     + jnp.where(key_pos < t, 0.0, NEG_INF)[None, :]).T
        bias_new = jax.lax.dynamic_index_in_dim(
            bias_row, t, axis=1, keepdims=False)[None, :]    # [1, H]
        cache = reorder_cache_all(kvg, cache_src, cache_dst, src, t,
                                  cfg.num_heads, fused_kvg=FUSED_KVG)
        kvnews = []
        for l, (layer, (enc_k, enc_v)) in enumerate(zip(self.layers, cross_kv)):
            q, k, v = layer.step_qkv(x)
            qf = q.reshape(B, N, -1)
            kvf = jnp.concatenate([k.reshape(B, N, -1),
                                   v.reshape(B, N, -1)], axis=-1)
            attn = step_attention_seq(qf, kvf, cache, l, bias_hist, bias_new,
                                      cfg.num_heads, chunk=ar_chunk,
                                      emit_quant=emit_quant)
            if emit_quant:
                attn, kvq = attn
                kvnews.append(kvq)
            else:
                kvnews.append(kvf)
            lq = None if ffn_q is None else tuple(a[l] for a in ffn_q)
            x = layer.step_finish_with_attn(x, attn, enc_k, enc_v, enc_bias,
                                            ffn_q=lq)
        kv_new = jnp.stack(kvnews, axis=2).reshape(B, N, -1)
        return self.final_norm(x), cache, kv_new

    def _decode_step_pallas(self, x, cache, cross_kv, enc_bias, bias_row,
                            key_pos, t):
        """TPU decode step: pallas step_attention_fused over the full cache
        (position t's k/v folded into the softmax directly). The cache is
        NOT written here — the new k/v rows are returned and merged during
        the beam reorder — so no XLA op ever reads or writes the cache and
        buffer assignment cannot materialize protective copies of it."""
        from ripor_tpu.ops.step_attention import step_attention_fused
        cfg = self.cfg
        B, N = x.shape[:2]
        # history excludes slot t (its value is stale; k_new enters directly)
        bias_hist = (bias_row
                     + jnp.where(key_pos < t, 0.0, NEG_INF)[None, :]).T
        bias_new = jax.lax.dynamic_index_in_dim(
            bias_row, t, axis=1, keepdims=False)[None, :]    # [1, H]
        knews, vnews = [], []
        for l, (layer, (enc_k, enc_v)) in enumerate(zip(self.layers, cross_kv)):
            q, k, v = layer.step_qkv(x)
            qf = q.reshape(B, N, -1)
            kf = k.reshape(B, N, -1)
            vf = v.reshape(B, N, -1)
            attn = step_attention_fused(qf, kf, vf, cache, l, bias_hist,
                                        bias_new, cfg.num_heads)
            x = layer.step_finish_with_attn(x, attn, enc_k, enc_v, enc_bias)
            knews.append(kf)
            vnews.append(vf)
        kv = jnp.stack([jnp.stack(knews), jnp.stack(vnews)], axis=1)
        return self.final_norm(x), cache, kv
