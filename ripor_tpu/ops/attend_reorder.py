"""Pallas fused gather + cached attention + deferred beam-reorder writeback.

The decode loop's cache traffic with separate kernels is THREE full passes
per step — attention block-streaming (~150 GB/s: one big sequential DMA per
block rides a single queue) plus the beam reorder's read and write (~433
GB/s combined via parallel per-row DMAs). This kernel collapses them into
TWO passes at parallel-DMA bandwidth by deferring the physical beam reorder
one step and folding it into the next step's attention:

  invariant at step t: ``cache_src`` holds slots [0, t-1) physically
  ordered for the PREVIOUS step's beams; ``src`` maps current beams to
  previous rows; ``kvg`` holds step t-1's k/v already permuted to current
  beam order.

  per (layer, chunk) grid cell:
    1. parallel row DMAs: cache_src[l, b, src[n]] -> VMEM buffer
    2. insert kvg at slot t-1 (one writer; completes the reorder one step
       late), start writeback DMAs of the now-ordered rows into cache_dst
    3. attention math on the VMEM rows + position-t k/v folded directly
       into the softmax (same formulation as step_attention._fused_kernel)

so the separate beam_gather_update pass disappears entirely and the
attention read runs at parallel-DMA bandwidth. Row DMAs are double-buffered
across grid cells (cell i+1's reads are issued before cell i's compute,
cell i's writeback retired when its buffer half is next reused) so the DMA
queues never drain. ``cache_dst`` is the ping-pong partner buffer (aliased
to the output) exactly as in ops/beam_gather.py::beam_gather_update.

Cache layout here is K|V-MERGED: [L, B, N, Mc, 2F] with K in columns
[0, F) and V in [F, 2F) — one DMA moves a beam row's keys AND values
(the gather is DMA-descriptor-issue bound, so halving the descriptor
count buys bandwidth; 2F = 1536 lanes still tile exactly).

Reference analogue: the decoder self-attention step + _reorder_cache pair
inside the beam loop (tasks/generation.py:435-442,511-518; HF T5Attention
with past_key_value).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# default rows per grid cell (DMAs in flight per direction); env override
# for tuning. Throughput is flat in chunk size (24/40/56 measured equal on
# v5e — the row DMAs are bandwidth-bound) but the double buffer must fit
# scoped VMEM: pick_chunk() shrinks it for wide-row geometries (t5-3b).
CHUNK = int(os.environ.get("RIPOR_AR_CHUNK", "40"))
# scoped-VMEM budget for the double row buffer (bytes); the measured-safe
# ceiling on v5e is the t5-base config's 15.7 MB buffer
_VMEM_BUDGET = 15_900_000


def pick_chunk(mc_max: int, row_width: int, itemsize: int) -> int:
    """Largest multiple-of-8 chunk (capped at CHUNK) that keeps the kernel
    within Mosaic's 16 MB scoped-VMEM stack. Two empirical bounds: the
    [2, chunk, mc_max, row_width] double row buffer, and the attention-math
    temporaries (~20 B per chunk*mc*F element, calibrated on measured
    compile OOMs at F=4096 and chunk=80). Throughput is flat in chunk on
    v5e (24/40/56 equal), so conservative is free. Call with the LARGEST
    segment's slot count so every per-layer kernel call in a decode uses
    the same chunk (the beam axis is padded to it once)."""
    f_elems = row_width // 2      # K half; scale cols are negligible
    c_buf = _VMEM_BUDGET // max(1, 2 * mc_max * row_width * itemsize)
    c = min(CHUNK, c_buf)
    if f_elems > 2048:
        # wide rows (t5-3b F=4096): the attention-math temporaries bind
        # (~13 B per chunk*mc*F element, calibrated on measured compile
        # OOMs); inside the measured-good envelope (F <= 2048, chunk 40,
        # mc 32) the full CHUNK is known to fit AND is ~8% faster at
        # batch 8 than chunk 24, so don't shrink there.
        c = min(c, 15_500_000 // max(1, 13 * mc_max * f_elems))
    if c < 8:
        # even the minimum 8-row chunk would blow scoped VMEM (very wide
        # rows x long cache, e.g. t5-3b with mc_max > 64): refuse rather
        # than hand Mosaic a kernel that fails to compile — the caller
        # should shrink cache segments (smaller Mc per buffer)
        raise ValueError(
            f"attend_reorder cannot fit an 8-row chunk in scoped VMEM "
            f"(mc_max={mc_max}, row_width={row_width}, itemsize={itemsize}); "
            f"use more/smaller cache segments so mc_max shrinks")
    return (c // 8) * 8
# writeback rows per DMA descriptor. The gather READ is per-row by nature
# (scattered sources) but the writeback destination rows are CONTIGUOUS
# (dest index = c*CHUNK + j), so they can share descriptors. Measured
# NEUTRAL on v5e at t5-base rows (the per-row DMA path is bandwidth/
# latency-bound, not issue-bound) — kept because fewer descriptors cost
# nothing and relieve queue pressure for bigger geometries.
WGROUP = int(os.environ.get("RIPOR_AR_WGROUP", "8"))
# force f32 score/prob dots in the deferred kernel even for bf16 caches —
# exact-parity audit mode (ADVICE r1: deferred bf16 dots shift decode
# numerics ~1e-3 relative vs the non-deferred kernel's f32 dots)
_F32_DOTS = os.environ.get("RIPOR_AR_F32_DOTS", "0") == "1"
# int8 cache rows append this many int8 columns; the first 2H hold the
# per-head power-of-2 quantization exponents (K heads then V heads)
SCALE_COLS = 128
# int4 rows halve the payload again: byte j of the [F] payload packs
# (k_j, v_j) as offset-binary nibbles (+8; K in the LOW nibble, V in the
# HIGH) so unpacking needs no interleave — the low-nibble plane IS the K
# half of the merged row and the high-nibble plane IS the V half. Same
# SCALE_COLS exponent tail, with e = ceil(log2(absmax/7)) per head.
_INT4_OFFSET = 8


def _quantize_rows(x, num_heads: int):
    """Quantize bf16/f32 K|V rows [C, 2F] to int8 with one power-of-2
    scale per head group: e = ceil(log2(absmax/127)), q8 = round(x*2^-e).
    Power-of-2 scales are exact in any float dtype, so dequantization is
    a lossless multiply; each cache slot is quantized exactly ONCE (at
    insert) and moved verbatim afterwards — no requantization drift.
    Returns (q8 [C, 2F] int8, epad [C, SCALE_COLS] int8)."""
    C, F2 = x.shape
    G = 2 * num_heads
    D = F2 // G
    qs, es = [], []
    for g in range(G):
        xg = x[:, g * D:(g + 1) * D].astype(jnp.float32)
        am = jnp.max(jnp.abs(xg), axis=1, keepdims=True)       # [C, 1]
        e = jnp.ceil(jnp.log2(jnp.maximum(am, 1e-30) / 127.0))
        e = jnp.clip(e, -100.0, 100.0)
        qs.append(jnp.round(xg * jnp.exp2(-e)).astype(jnp.int8))
        es.append(e.astype(jnp.int8))
    q8 = jnp.concatenate(qs, axis=1)                           # [C, 2F]
    e8 = jnp.concatenate(es, axis=1)                           # [C, G]
    epad = jnp.pad(e8, ((0, 0), (0, SCALE_COLS - G)))
    return q8, epad


def _quantize_rows_int4(x, num_heads: int):
    """Quantize bf16/f32 K|V rows [C, 2F] to PACKED int4 [C, F]: byte j
    holds (k_j + 8) | ((v_j + 8) << 4) with per-head power-of-2 scales
    e = ceil(log2(absmax/7)) — 4x smaller rows than bf16 (the row DMAs are
    the decode budget's dominant term), ~7% element error (validate
    retrieval-transparency per geometry with tools/validate_int8_e2e.py's
    pattern before trusting rankings). Returns (packed [C, F] int8,
    epad [C, SCALE_COLS] int8)."""
    C, F2 = x.shape
    F = F2 // 2
    G = 2 * num_heads
    D = F2 // G

    def quant_half(xh):                  # [C, F] -> (int32 in [0,15], e8)
        qs, es = [], []
        for h in range(num_heads):
            xg = xh[:, h * D:(h + 1) * D].astype(jnp.float32)
            am = jnp.max(jnp.abs(xg), axis=1, keepdims=True)
            e = jnp.ceil(jnp.log2(jnp.maximum(am, 1e-30) / 7.0))
            e = jnp.clip(e, -100.0, 100.0)
            q = jnp.clip(jnp.round(xg * jnp.exp2(-e)), -8, 7)
            qs.append(q.astype(jnp.int32) + _INT4_OFFSET)
            es.append(e.astype(jnp.int8))
        return (jnp.concatenate(qs, axis=1),
                jnp.concatenate(es, axis=1))

    qk, ek = quant_half(x[:, :F])
    qv, ev = quant_half(x[:, F:])
    p = qk | (qv << 4)                                  # int32 in [0, 255]
    packed = jnp.where(p >= 128, p - 256, p).astype(jnp.int8)
    e8 = jnp.concatenate([ek, ev], axis=1)              # [C, G]
    epad = jnp.pad(e8, ((0, 0), (0, SCALE_COLS - G)))
    return packed, epad


def _unpack_int4(raw):
    """[..., F] packed int4 bytes -> (k, v) bf16 planes [..., F]."""
    r = raw.astype(jnp.int32)
    k = ((r & 15) - _INT4_OFFSET).astype(jnp.bfloat16)
    v = (((r >> 4) & 15) - _INT4_OFFSET).astype(jnp.bfloat16)
    return k, v


def quantize_rows_xla(x, num_heads: int):
    """XLA-side batched mirror of ``_quantize_rows``: [..., 2F] bf16/f32 ->
    [..., 2F+SCALE_COLS] int8 rows (q8 then per-head exponents then pad).
    Running this ONCE per decode step over kv_new (before the beam-order
    gather) halves the kvg gather's bytes and removes the in-kernel
    quantize from every layer call (CLAUDE.md batch-8 budget lever)."""
    G = 2 * num_heads
    lead, F2 = x.shape[:-1], x.shape[-1]
    D = F2 // G
    xg = x.reshape(*lead, G, D).astype(jnp.float32)
    am = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
    e = jnp.ceil(jnp.log2(jnp.maximum(am, 1e-30) / 127.0))
    e = jnp.clip(e, -100.0, 100.0)
    q8 = jnp.round(xg * jnp.exp2(-e)).astype(jnp.int8).reshape(*lead, F2)
    e8 = e[..., 0].astype(jnp.int8)                        # [..., G]
    pad = [(0, 0)] * len(lead) + [(0, SCALE_COLS - G)]
    return jnp.concatenate([q8, jnp.pad(e8, pad)], axis=-1)


def quantize_rows_xla_int4(x, num_heads: int):
    """XLA-side batched mirror of ``_quantize_rows_int4``: [..., 2F] ->
    [..., F + SCALE_COLS] int8 packed rows (identical encoding: per-head
    power-of-2 scales e = ceil(log2(absmax/7)), nibbles offset by +8, K in
    the low nibble / V in the high, then the exponent tail). Quantization
    commutes with the beam gather, so running it once per step before the
    gather (megarow path) moves 4x fewer kvg bytes with bit-identical
    inserted rows."""
    H = num_heads
    lead, F2 = x.shape[:-1], x.shape[-1]
    F = F2 // 2
    D = F // H

    def quant_half(xh):                      # [..., F] -> int32 in [0, 15]
        xg = xh.reshape(*lead, H, D).astype(jnp.float32)
        am = jnp.max(jnp.abs(xg), axis=-1, keepdims=True)
        e = jnp.ceil(jnp.log2(jnp.maximum(am, 1e-30) / 7.0))
        e = jnp.clip(e, -100.0, 100.0)
        q = jnp.clip(jnp.round(xg * jnp.exp2(-e)), -8, 7)
        return (q.astype(jnp.int32) + _INT4_OFFSET).reshape(*lead, F), \
            e[..., 0].astype(jnp.int8)       # [..., H]
    qk, ek = quant_half(x[..., :F])
    qv, ev = quant_half(x[..., F:])
    p = qk | (qv << 4)
    packed = jnp.where(p >= 128, p - 256, p).astype(jnp.int8)
    e8 = jnp.concatenate([ek, ev], axis=-1)  # [..., 2H]
    pad = [(0, 0)] * len(lead) + [(0, SCALE_COLS - 2 * H)]
    return jnp.concatenate([packed, jnp.pad(e8, pad)], axis=-1)


def _attn_math_q8(q_ref, kvnew_ref, kvg_ref, bias_hist_ref, bias_new_ref,
                  buf, t, num_heads: int):
    """_attn_math for int8 cache rows [C, Mc, 2F+SCALE_COLS]: dequantize
    scores per head with the stored exponents. Slot t-1 (not yet in the
    cache) comes from ``kvg``: either EXACT bf16 [C, 2F] rows (in-kernel
    quantize mode) or pre-quantized int8 [C, RW] rows (XLA-quantize mode,
    where the row simply overwrites slot t-1 before uniform dequant math).
    Returns [C, F] f32."""
    C, F = q_ref.shape[1], q_ref.shape[2]
    Mc = buf.shape[1]
    H = num_heads
    kvg_q8 = kvg_ref.dtype == jnp.int8
    head_of = jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // (F // H)
    head_mask = (head_of == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1))
    hm = head_mask.astype(jnp.bfloat16)
    slot_m = jax.lax.broadcasted_iota(jnp.int32, (1, Mc, 1), 1)

    raw = buf[...]                                       # [C, Mc, RW] int8
    if kvg_q8:
        # pre-quantized kvg row (same layout as cache rows): complete the
        # deferred insert in-register, then ALL slots go through one
        # uniform dequant path
        raw = jnp.where(slot_m == t - 1, kvg_ref[0][:, None, :], raw)
    # int8 -> bf16 is EXACT (|v| <= 127 fits bf16's 8-bit mantissa); bf16
    # products keep the [C, Mc, F] temporaries half the size of f32 (the
    # scoped-VMEM stack is the binding constraint for wide rows)
    k8 = raw[:, :, :F].astype(jnp.bfloat16)
    v8 = raw[:, :, F:2 * F].astype(jnp.bfloat16)
    ef = raw[:, :, 2 * F:].astype(jnp.float32)           # [C, Mc, SCALE_COLS]
    ek = jnp.exp2(ef[:, :, :H])                          # [C, Mc, H]
    ev = jnp.exp2(ef[:, :, H:2 * H])

    qb = q_ref[0].astype(jnp.bfloat16)
    kq = (k8 * qb[:, None, :]).reshape(C * Mc, F)
    s_hist = jax.lax.dot(kq, hm,
                         preferred_element_type=jnp.float32).reshape(C, Mc, H)
    s_hist = s_hist * ek
    if not kvg_q8:
        kvg_k = kvg_ref[0][:, :F].astype(jnp.bfloat16)
        kvg_v = kvg_ref[0][:, F:].astype(jnp.bfloat16)
        s_t1 = jax.lax.dot(kvg_k * qb, hm,
                           preferred_element_type=jnp.float32)     # [C, H]
        s_hist = jnp.where(slot_m == t - 1, s_t1[:, None, :], s_hist)
    s_hist = s_hist + bias_hist_ref[...].astype(jnp.float32)[None]

    k_new = kvnew_ref[0][:, :F].astype(jnp.bfloat16)
    v_new = kvnew_ref[0][:, F:]
    s_new = jax.lax.dot(k_new * qb,
                        hm, preferred_element_type=jnp.float32)    # [C, H]
    s_new = s_new + bias_new_ref[...].astype(jnp.float32)

    scores = jnp.concatenate([s_hist, s_new[:, None, :]], axis=1)
    probs = jax.nn.softmax(scores, axis=1)               # [C, Mc+1, H]
    # fold the per-(slot, head) V scale into the probs BEFORE the head
    # expansion: out_f = sum_m probs[c,m,h(f)] * 2^ev[c,m,h(f)] * v8 —
    # saves a second [H, F] expansion dot and a f32 [C, Mc, F] multiply.
    # In-kernel-quantize mode slot t-1 uses the exact bf16 kvg_v (scale 1).
    if kvg_q8:
        ps = probs[:, :Mc] * ev
        vb = v8
    else:
        ps = probs[:, :Mc] * jnp.where(slot_m == t - 1, 1.0, ev)
        vb = jnp.where(slot_m == t - 1, kvg_v[:, None, :], v8)   # bf16
    pe = jax.lax.dot(ps.reshape(C * Mc, H).astype(jnp.bfloat16),
                     hm.T, preferred_element_type=jnp.float32).reshape(C, Mc, F)
    out = jnp.sum(pe.astype(jnp.bfloat16) * vb, axis=1, dtype=jnp.float32)
    pn = jax.lax.dot(probs[:, Mc].astype(jnp.bfloat16), hm.T,
                     preferred_element_type=jnp.float32)           # [C, F]
    return out + pn * v_new.astype(jnp.float32)


def _attn_math_q4(q_ref, kvnew_ref, kvg_ref, bias_hist_ref, bias_new_ref,
                  buf, t, num_heads: int):
    """_attn_math for PACKED int4 cache rows [C, Mc, F+SCALE_COLS]: the low
    nibble plane is the K half, the high nibble plane the V half (no
    interleave — see _INT4_OFFSET note). Slot t-1 (not yet in the cache) is
    taken EXACTLY from the bf16 ``kvg``. Returns [C, F] f32."""
    C, F = q_ref.shape[1], q_ref.shape[2]
    Mc = buf.shape[1]
    H = num_heads
    head_of = jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // (F // H)
    head_mask = (head_of == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1))
    hm = head_mask.astype(jnp.bfloat16)
    slot_m = jax.lax.broadcasted_iota(jnp.int32, (1, Mc, 1), 1)

    raw = buf[...]                               # [C, Mc, F+SC] packed int8
    k4, v4 = _unpack_int4(raw[:, :, :F])         # bf16 planes (exact ints)
    ef = raw[:, :, F:].astype(jnp.float32)       # [C, Mc, SCALE_COLS]
    ek = jnp.exp2(ef[:, :, :H])                  # [C, Mc, H]
    ev = jnp.exp2(ef[:, :, H:2 * H])

    qb = q_ref[0].astype(jnp.bfloat16)
    kq = (k4 * qb[:, None, :]).reshape(C * Mc, F)
    s_hist = jax.lax.dot(kq, hm,
                         preferred_element_type=jnp.float32).reshape(C, Mc, H)
    s_hist = s_hist * ek
    kvg_k = kvg_ref[0][:, :F].astype(jnp.bfloat16)
    kvg_v = kvg_ref[0][:, F:].astype(jnp.bfloat16)
    s_t1 = jax.lax.dot(kvg_k * qb, hm,
                       preferred_element_type=jnp.float32)         # [C, H]
    s_hist = jnp.where(slot_m == t - 1, s_t1[:, None, :], s_hist)
    s_hist = s_hist + bias_hist_ref[...].astype(jnp.float32)[None]

    k_new = kvnew_ref[0][:, :F].astype(jnp.bfloat16)
    v_new = kvnew_ref[0][:, F:]
    s_new = jax.lax.dot(k_new * qb,
                        hm, preferred_element_type=jnp.float32)    # [C, H]
    s_new = s_new + bias_new_ref[...].astype(jnp.float32)

    scores = jnp.concatenate([s_hist, s_new[:, None, :]], axis=1)
    probs = jax.nn.softmax(scores, axis=1)               # [C, Mc+1, H]
    # per-(slot, head) V scale folded into probs pre-expansion (same trick
    # as _attn_math_q8); slot t-1 uses the exact bf16 kvg_v (scale 1)
    ps = probs[:, :Mc] * jnp.where(slot_m == t - 1, 1.0, ev)
    pe = jax.lax.dot(ps.reshape(C * Mc, H).astype(jnp.bfloat16),
                     hm.T, preferred_element_type=jnp.float32).reshape(C, Mc, F)
    vb = jnp.where(slot_m == t - 1, kvg_v[:, None, :], v4)   # bf16
    out = jnp.sum(pe.astype(jnp.bfloat16) * vb, axis=1, dtype=jnp.float32)
    pn = jax.lax.dot(probs[:, Mc].astype(jnp.bfloat16), hm.T,
                     preferred_element_type=jnp.float32)           # [C, F]
    return out + pn * v_new.astype(jnp.float32)


def _attn_math(q_ref, kvnew_ref, kvg_ref, bias_hist_ref, bias_new_ref,
               buf, t, num_heads: int):
    """Attention on VMEM rows [C, Mc, 2F] (K|V merged) with slot t-1 taken
    from kvg and position t's k/v folded directly into the softmax.
    Returns [C, F] f32."""
    C, F = q_ref.shape[1], q_ref.shape[2]
    Mc = buf.shape[1]
    H = num_heads
    q32 = q_ref[0].astype(jnp.float32)               # [C, F]
    head_of = jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // (F // H)
    head_mask = (head_of == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1))

    slot = jax.lax.broadcasted_iota(jnp.int32, (Mc, 1), 0)
    rows = buf[...]                                  # [C, Mc, 2F]
    # history rows with slot t-1 overwritten by the gathered kv (the DMA'd
    # row still holds the previous beam's stale slot t-1)
    rows = jnp.where(slot[None] == t - 1, kvg_ref[0][:, None, :], rows)
    k_hist = rows[:, :, :F]
    v_hist = rows[:, :, F:]

    # Unlike the block-pipelined kernel (where compute hides under the
    # operand DMAs), compute here is serialized after the manual row DMAs —
    # so the big N-padded (12->128) mask dots run at the CACHE dtype (bf16
    # in production: 4x the f32 MXU rate; products are rounded to bf16
    # before the f32 accumulation, ~1e-3 relative, inside the decode path's
    # bf16 tolerance — f32 models keep exact-parity f32 dots).
    # RIPOR_AR_F32_DOTS=1 forces the f32 path for bf16 models too
    # (exact-parity audits vs the non-deferred kernel on hardware; costs
    # VMEM headroom — not for F > 2048 rows).
    dot_dt = jnp.float32 if _F32_DOTS else buf.dtype
    hm = head_mask.astype(dot_dt)
    if dot_dt == jnp.float32:
        # exact path (CPU parity tests with f32 models)
        kq = (k_hist.astype(jnp.float32)
              * q32[:, None, :]).reshape(C * Mc, F)
        kn = k_new = kvnew_ref[0][:, :F].astype(jnp.float32) * q32
    else:
        # bf16 models: form the products directly in bf16 — the f32
        # [C, Mc, F] intermediates otherwise blow the 16 MB scoped-VMEM
        # stack for wide rows (t5-3b F=4096); same rounding class as
        # f32-multiply-then-round (~1e-3 relative)
        qb = q_ref[0].astype(dot_dt)
        kq = (k_hist * qb[:, None, :]).reshape(C * Mc, F)
        kn = kvnew_ref[0][:, :F] * qb
    v_new = kvnew_ref[0][:, F:]
    s_hist = jax.lax.dot(kq.astype(dot_dt), hm,
                         preferred_element_type=jnp.float32).reshape(C, Mc, H)
    s_hist = s_hist + bias_hist_ref[...].astype(jnp.float32)[None]
    s_new = jax.lax.dot(kn.astype(dot_dt), hm,
                        preferred_element_type=jnp.float32)        # [C, H]
    s_new = s_new + bias_new_ref[...].astype(jnp.float32)

    scores = jnp.concatenate([s_hist, s_new[:, None, :]], axis=1)
    probs = jax.nn.softmax(scores, axis=1)           # [C, Mc+1, H]
    pe = jax.lax.dot(probs[:, :Mc].reshape(C * Mc, H).astype(dot_dt), hm.T,
                     preferred_element_type=jnp.float32).reshape(C, Mc, F)
    if dot_dt == jnp.float32:
        out = (pe * v_hist.astype(jnp.float32)).sum(axis=1)
    else:
        out = jnp.sum(pe.astype(dot_dt) * v_hist, axis=1,
                      dtype=jnp.float32)
    pn = jax.lax.dot(probs[:, Mc].astype(dot_dt), hm.T,
                     preferred_element_type=jnp.float32)           # [C, F]
    return out + pn * v_new.astype(jnp.float32)


def _kernel(src_ref, lt_ref, q_ref, kvnew_ref, kvg_ref, bias_hist_ref,
            bias_new_ref, cache_ref, dst_ref, cache_out_ref, attn_ref,
            buf, isems, osems, *, num_heads: int, write_back: bool,
            pipelined: bool, quant: "str | None", chunk: int):
    """Grid cell body. ``pipelined``: double-buffer the row DMAs across grid
    cells — cell i+1's gather reads are issued before cell i's compute, and
    cell i's writeback is only waited when its buffer half is next reused —
    so the DMA queues never drain. The interpret path (CPU tests) uses the
    simple single-buffered schedule (cross-cell semaphore state is exact on
    hardware but not modeled by the interpreter)."""
    del dst_ref  # aliased to cache_out_ref's buffer
    b = pl.program_id(0)
    c = pl.program_id(1)
    nb = pl.num_programs(0)
    nc = pl.num_programs(1)
    l = lt_ref[0]
    t = lt_ref[1]
    Mc = buf.shape[2]
    slot = jax.lax.broadcasted_iota(jnp.int32, (Mc, 1), 0)
    i = b * nc + c
    cur = jax.lax.rem(i, 2)
    nxt = 1 - cur

    # One semaphore per buffer slot, shared by all chunk row DMAs (per-row
    # semaphores exhaust the TPU's tiny sflag space past ~chunk 100). A
    # shared sem means completions are anonymous: ALL of a slot's in-DMAs
    # are waited before any row is touched.
    def issue_ins(b2, c2, s2):
        for j in range(chunk):
            row = src_ref[b2, c2 * chunk + j]
            pltpu.make_async_copy(cache_ref.at[l, b2, row],
                                  buf.at[s2, j], isems.at[s2]).start()

    def wait_ins(s2):
        for j in range(chunk):
            pltpu.make_async_copy(cache_ref.at[l, b, src_ref[b, c * chunk + j]],
                                  buf.at[s2, j], isems.at[s2]).wait()

    wg = WGROUP if chunk % WGROUP == 0 else 1

    def wait_outs(s2):
        # reconstructed descriptors: a DMA wait only consumes the semaphore
        # by the transfer size, so same-shaped refs stand in for the
        # originals issued in an earlier grid cell
        for j in range(0, chunk, wg):
            pltpu.make_async_copy(
                buf.at[s2, pl.ds(j, wg)],
                cache_out_ref.at[l, b, pl.ds(c * chunk + j, wg)],
                osems.at[s2]).wait()

    if pipelined:
        @pl.when(i == 0)
        def _prologue():
            issue_ins(b, c, cur)

        if write_back:
            @pl.when(i >= 1)
            def _retire_prev_outs():   # cell i-1's writeback used slot nxt
                wait_outs(nxt)

        @pl.when(i + 1 < nb * nc)
        def _prefetch_next():
            wrap = c + 1 == nc
            b2 = jnp.where(wrap, b + 1, b)
            c2 = jnp.where(wrap, 0, c + 1)
            issue_ins(b2, c2, nxt)
    else:
        issue_ins(b, c, cur)

    wait_ins(cur)
    if write_back:
        # complete the deferred reorder: slot t-1 := gathered kv (one
        # vectorized insert over the whole chunk; quantized caches get the
        # row int8-quantized HERE, exactly once), then stream the ordered
        # rows out in contiguous WGROUP-row descriptors
        if quant == "int4":
            q4, epad = _quantize_rows_int4(kvg_ref[0], num_heads)
            ins_row = jnp.concatenate([q4, epad], axis=1)
        elif quant == "int8" and kvg_ref.dtype != jnp.int8:
            # in-kernel quantize mode: kvg is exact bf16, quantize at insert
            q8, epad = _quantize_rows(kvg_ref[0], num_heads)
            ins_row = jnp.concatenate([q8, epad], axis=1)
        else:
            # bf16 cache, or XLA-quantize mode (kvg already int8 rows in
            # cache layout — quantize_rows_xla ran once before the gather)
            ins_row = kvg_ref[0]
        buf[cur] = jnp.where(slot[None] == t - 1, ins_row[:, None, :],
                             buf[cur])
        for j in range(0, chunk, wg):
            pltpu.make_async_copy(
                buf.at[cur, pl.ds(j, wg)],
                cache_out_ref.at[l, b, pl.ds(c * chunk + j, wg)],
                osems.at[cur]).start()

    math_fn = {"int8": _attn_math_q8, "int4": _attn_math_q4,
               None: _attn_math}[quant]
    out = math_fn(q_ref, kvnew_ref, kvg_ref, bias_hist_ref, bias_new_ref,
                  buf.at[cur], t, num_heads)
    attn_ref[0] = out.astype(attn_ref.dtype)
    if write_back:
        if pipelined:
            @pl.when(i + 1 >= nb * nc)   # epilogue: retire the final outs
            def _retire_last_outs():
                wait_outs(cur)
        else:
            wait_outs(cur)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "write_back", "interpret", "chunk"))
def step_attend_reorder(q, kv_new, kvg, cache_src, cache_dst, src, layer, t,
                        bias_hist, bias_new, num_heads: int,
                        write_back: bool = True, interpret: bool = None,
                        chunk: int = None):
    """Fused gather + one-position cached self-attention + deferred-reorder
    writeback for ONE decoder layer over the K|V-merged cache.

    q: [B, N, F]; kv_new: [B, N, 2F] position-t K|V for CURRENT beams;
    kvg: [B, N, L*2F] step t-1's K|V for ALL layers permuted to current
    beam order, layer-major within the row — the beam.py gather moves one
    36 KB row per beam instead of L separate 3 KB rows, and this kernel
    slices its own layer out via a scalar-prefetch-dependent block index;
    cache_src: [L, B, N, Mc, 2F] ordered for the previous step's beams
    (slots [0, t-1) valid); cache_dst: ping-pong partner, receives rows
    reordered by ``src`` [B, N] with slot t-1 inserted (aliased output);
    bias_hist: [Mc, H] f32 with slots >= t masked; bias_new: [1, H].

    Returns (attn [B, N, F], new_cache) — new_cache is cache_dst's buffer
    (with write_back=False — the final step — no rows are written and the
    returned cache holds stale data the caller must discard).
    """
    if interpret is None:  # CPU tests run the kernel in interpret mode
        interpret = jax.default_backend() != "tpu"
    B, N, F = q.shape
    L = cache_src.shape[0]
    Mc = cache_src.shape[3]
    # quant mode is encoded by dtype + row width: int8 rows are
    # [2F + SCALE_COLS], packed-int4 rows are [F + SCALE_COLS]
    if cache_src.dtype == jnp.int8:
        quant = "int4" if cache_src.shape[4] == F + SCALE_COLS else "int8"
    else:
        quant = None
    RW = {None: 2 * F, "int8": 2 * F + SCALE_COLS,
          "int4": F + SCALE_COLS}[quant]
    # XLA-quantize mode: kvg arrives pre-quantized in cache-row layout
    kvg_q8 = kvg.dtype == jnp.int8
    assert not kvg_q8 or quant == "int8", "int8 kvg needs an int8 cache"
    kvg_rw = RW if kvg_q8 else 2 * F
    assert cache_src.shape[1] == B and cache_src.shape[2] == N, cache_src.shape
    assert cache_src.shape[4] == RW, (cache_src.shape, RW)
    assert kv_new.shape == (B, N, 2 * F), kv_new.shape
    assert kvg.shape == (B, N, L * kvg_rw), kvg.shape
    assert src.shape == (B, N), src.shape
    if chunk is None:
        chunk = pick_chunk(Mc, RW, cache_src.dtype.itemsize)
    if N % chunk != 0:
        pad = chunk - N % chunk
        padded = step_attend_reorder(
            jnp.pad(q, ((0, 0), (0, pad), (0, 0))),
            jnp.pad(kv_new, ((0, 0), (0, pad), (0, 0))),
            jnp.pad(kvg, ((0, 0), (0, pad), (0, 0))),
            jnp.pad(cache_src, ((0, 0),) * 2 + ((0, pad), (0, 0), (0, 0))),
            jnp.pad(cache_dst, ((0, 0),) * 2 + ((0, pad), (0, 0), (0, 0))),
            jnp.pad(src, ((0, 0), (0, pad))),
            layer, t, bias_hist, bias_new, num_heads,
            write_back=write_back, interpret=interpret, chunk=chunk)
        attn, cache = padded
        return attn[:, :N], cache[:, :, :N]

    kernel = functools.partial(_kernel, num_heads=num_heads,
                               write_back=write_back,
                               pipelined=not interpret,
                               quant=quant, chunk=chunk)
    lt = jnp.stack([jnp.asarray(layer, jnp.int32),
                    jnp.asarray(t, jnp.int32)]).reshape(2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, N // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, F), lambda b, c, s, lt_: (b, c, 0)),
            pl.BlockSpec((1, chunk, 2 * F), lambda b, c, s, lt_: (b, c, 0)),
            # kvg is [B, N, L*kvg_rw]; block index lt_[0] slices THIS
            # layer's [kvg_rw] span out of the layer-major row
            pl.BlockSpec((1, chunk, kvg_rw), lambda b, c, s, lt_: (b, c, lt_[0])),
            pl.BlockSpec((Mc, num_heads), lambda b, c, s, lt_: (0, 0)),
            pl.BlockSpec((1, num_heads), lambda b, c, s, lt_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, chunk, F), lambda b, c, s, lt_: (b, c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, chunk, Mc, RW), cache_src.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    new_cache, attn = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(cache_src.shape, cache_src.dtype),
            jax.ShapeDtypeStruct((B, N, F), q.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        # operand index counts the scalar-prefetch args: (src, lt, q,
        # kv_new, kvg, bias_hist, bias_new, cache_src, cache_dst=8)
        input_output_aliases={8: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src, lt, q, kv_new, kvg, bias_hist, bias_new, cache_src, cache_dst)
    return attn, new_cache
