"""Pallas cached self-attention for one decode position.

Why a kernel: during constrained beam search the KV cache is the dominant
buffer (~GBs at beam 1000) and is ALSO consumed by the pallas beam-reorder
kernel, which pins the default descending layout. Any XLA op that touches
the cache (the k/v dynamic-update-slice fused with attention math) gets
assigned a beam-minor layout by XLA's dot/fusion cost model, forcing two
full-cache relayout copies per decode step (~40% of step time measured on
v5e). With attention in pallas, no XLA op reads the cache and the layout
stays pinned end to end.

Math trick — per-head scores WITHOUT splitting the merged head dim (a
[.., H, D] cache would pad (12, 64) tiles to (16, 128): 2.7x memory/BW; a
lane-splitting reshape inside the kernel is a VREG shuffle storm):

  scores[m, h] = K[m, :] @ (q * head_mask[:, h])      # block-diag q, MXU
  out[d]       = sum_m V[m, d] * (probs @ head_mask.T)[m, d]

head_mask[d, h] = 1 iff d // d_head == h is built from iota in-kernel.

Reference analogue: the decoder self-attention step inside the beam loop
(HF T5Attention with past_key_value, used via tasks/generation.py:435-442).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

DEFAULT_CHUNK = 8
FUSED_CHUNK = 40


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *, num_heads: int):
    # blocks: q [1, C, F]; k/v [1, C, Mc, F]; bias [Mc, H]; out [1, C, F]
    C, F = q_ref.shape[1], q_ref.shape[2]
    Mc = k_ref.shape[2]
    H = num_heads
    q = q_ref[0]                                     # [C, F]
    bias = bias_ref[...].astype(jnp.float32)         # [Mc, H]
    # head_mask[d, h] = 1 iff d belongs to head h
    head_of = jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // (F // H)
    head_mask = (head_of == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1))
    head_mask = head_mask.astype(q.dtype)            # [F, H]

    # minor-dim insertion must happen in f32 (Mosaic bf16 limitation), then
    # cast back so the dot runs on the MXU's bf16 path
    qb = (q.astype(jnp.float32)[:, :, None]
          * head_mask.astype(jnp.float32)[None]).astype(q.dtype)  # [C, F, H]
    k = k_ref[0]                                     # [C, Mc, F]
    scores = jax.lax.dot_general(
        k, qb, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # [C, Mc, H]
    scores = scores + bias[None]
    probs = jax.nn.softmax(scores, axis=1)           # over key positions
    pe = jax.lax.dot_general(
        probs.astype(q.dtype), head_mask.T, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [C, Mc, F]
    out = (pe * v_ref[0].astype(jnp.float32)).sum(axis=1)   # [C, F]
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "chunk", "interpret"))
def step_attention(q: jnp.ndarray, cache_k: jnp.ndarray, cache_v: jnp.ndarray,
                   bias: jnp.ndarray, num_heads: int,
                   chunk: int = DEFAULT_CHUNK,
                   interpret: bool = None) -> jnp.ndarray:
    """One-position cached self-attention.

    q: [B, N, F] (F = num_heads * d_head); cache_k/v: [B, N, Mc, F] with the
    current position's k/v already written at its slot; bias: [Mc, H] f32 =
    relpos bias + NEG_INF mask for slots > t. Returns [B, N, F].
    """
    if interpret is None:  # CPU tests run the kernel in interpret mode
        interpret = jax.default_backend() != "tpu"
    B, N, F = q.shape
    Mc = cache_k.shape[2]
    assert cache_k.shape == (B, N, Mc, F), (cache_k.shape, (B, N, Mc, F))
    assert bias.shape == (Mc, num_heads), bias.shape
    if N % chunk != 0:
        pad = chunk - N % chunk
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(cache_k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vp = jnp.pad(cache_v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return step_attention(qp, kp, vp, bias, num_heads, chunk=chunk,
                              interpret=interpret)[:, :N]

    kernel = functools.partial(_kernel, num_heads=num_heads)
    return pl.pallas_call(
        kernel,
        grid=(B, N // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, F), lambda b, c: (b, c, 0)),
            pl.BlockSpec((1, chunk, Mc, F), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((1, chunk, Mc, F), lambda b, c: (b, c, 0, 0)),
            pl.BlockSpec((Mc, num_heads), lambda b, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, F), lambda b, c: (b, c, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, F), q.dtype),
        interpret=interpret,
    )(q, cache_k, cache_v, bias)


# ---------------------------------------------------------------------------
# Fused variant: whole-cache operand + current-position k/v as inputs
# ---------------------------------------------------------------------------
# Passing per-layer cache SLICES to a kernel makes XLA materialize each
# slice as a custom-call operand buffer (a full-cache copy per step across
# 24 slices), and the in-loop k/v dynamic-update-slice loses in-place-ness
# against the custom call. This variant takes the FULL stacked cache
# [L, 2, B, N, Mc, F] as a single ANY-space ref (no slicing), selects the
# layer with a scalar-prefetched index via manual block DMAs, and folds the
# current position's k/v into the softmax directly (no in-loop cache write;
# the step writes all layers' k/v once, after the layer loop).

from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _fused_kernel(l_ref, q_ref, knew_ref, vnew_ref, bias_hist_ref,
                  bias_new_ref, k_ref, v_ref, out_ref, *, num_heads: int):
    # blocks: q/knew/vnew [1, C, F]; k/v [1, 1, 1, C, Mc, F] (auto-DMA'd,
    # double-buffered across grid cells by the pallas pipeline — manual
    # per-row DMAs here were latency-bound at ~0.4 ms/call)
    C, F = q_ref.shape[1], q_ref.shape[2]
    Mc = k_ref.shape[4]
    H = num_heads

    q32 = q_ref[0].astype(jnp.float32)               # [C, F]
    head_of = jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // (F // H)
    head_mask = (head_of == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1))
    head_mask32 = head_mask.astype(jnp.float32)      # [F, H]

    # scores[c,m,h] = sum_d K[c,m,d]*q[c,d]*mask[d,h]: elementwise K*q on
    # the VPU, then ONE [C*Mc, F] x [F, H] dot — a batched-over-C dot here
    # unrolls into C tiny MXU ops (N=H pads 12->128, 10x waste each).
    # (Kernel time is block-DMA bound — ablation shows compute ~0 — so the
    # dots stay f32 for precision.)
    kq = (k_ref[0, 0, 0].astype(jnp.float32)
          * q32[:, None, :]).reshape(C * Mc, F)      # [C*Mc, F] f32
    s_hist = jax.lax.dot(kq, head_mask32,
                         preferred_element_type=jnp.float32).reshape(C, Mc, H)
    s_hist = s_hist + bias_hist_ref[...].astype(jnp.float32)[None]
    # current position's score: same trick on the [C, F] new keys
    s_new = jax.lax.dot(knew_ref[0].astype(jnp.float32) * q32, head_mask32,
                        preferred_element_type=jnp.float32)        # [C, H]
    s_new = s_new + bias_new_ref[...].astype(jnp.float32)

    scores = jnp.concatenate([s_hist, s_new[:, None, :]], axis=1)
    probs = jax.nn.softmax(scores, axis=1)           # [C, Mc+1, H]
    # out[c,d] = sum_m V[c,m,d] * (probs @ mask.T)[c,m,d] — again one dot
    pe = jax.lax.dot(probs[:, :Mc].reshape(C * Mc, H), head_mask32.T,
                     preferred_element_type=jnp.float32).reshape(C, Mc, F)
    out = (pe * v_ref[0, 0, 0].astype(jnp.float32)).sum(axis=1)
    pn = jax.lax.dot(probs[:, Mc], head_mask32.T,
                     preferred_element_type=jnp.float32)           # [C, F]
    out = out + pn * vnew_ref[0].astype(jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "chunk", "interpret"))
def step_attention_fused(q, k_new, v_new, cache, layer, bias_hist, bias_new,
                         num_heads: int, chunk: int = FUSED_CHUNK,
                         interpret: bool = None):
    """One-position cached self-attention over the stacked cache.

    q/k_new/v_new: [B, N, F] (position t's projections, NOT yet in cache);
    cache: [L, 2, B, N, Mc, F] with valid history in slots [0, t);
    layer: scalar int32; bias_hist: [Mc, H] f32 (relpos row + NEG_INF at
    slots >= t); bias_new: [1, H] f32 (position t's self bias).
    Returns attention output [B, N, F].
    """
    if interpret is None:  # CPU tests run the kernel in interpret mode
        interpret = jax.default_backend() != "tpu"
    B, N, F = q.shape
    Mc = cache.shape[4]
    if N % chunk != 0:
        pad = chunk - N % chunk
        qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k_new, ((0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v_new, ((0, 0), (0, pad), (0, 0)))
        cp = jnp.pad(cache, ((0, 0),) * 3 + ((0, pad), (0, 0), (0, 0)))
        return step_attention_fused(qp, kp, vp, cp, layer, bias_hist,
                                    bias_new, num_heads, chunk=chunk,
                                    interpret=interpret)[:, :N]
    kernel = functools.partial(_fused_kernel, num_heads=num_heads)
    # cache passed twice (K plane, V plane): the index_map reads the
    # scalar-prefetched layer index, so the operand is the FULL cache (no
    # XLA slice materialization) while blocks stream through the pallas
    # pipeline with double buffering.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, F), lambda b, c, l: (b, c, 0)),
            pl.BlockSpec((1, chunk, F), lambda b, c, l: (b, c, 0)),
            pl.BlockSpec((1, chunk, F), lambda b, c, l: (b, c, 0)),
            pl.BlockSpec((Mc, num_heads), lambda b, c, l: (0, 0)),
            pl.BlockSpec((1, num_heads), lambda b, c, l: (0, 0)),
            pl.BlockSpec((1, 1, 1, chunk, Mc, F),
                         lambda b, c, l: (l[0], 0, b, c, 0, 0)),
            pl.BlockSpec((1, 1, 1, chunk, Mc, F),
                         lambda b, c, l: (l[0], 1, b, c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, chunk, F), lambda b, c, l: (b, c, 0)),
    )
    lidx = jnp.asarray(layer, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, F), q.dtype),
        interpret=interpret,
    )(lidx, q, k_new, v_new, bias_hist, bias_new, cache, cache)
