"""Megarow decode path: all-layers beam reorder + sequential-read attention.

The deferred kernel (ops/attend_reorder.py) is descriptor-latency-bound at
production geometry: its gather reads issue ONE DMA per (layer, beam) row —
B*N*L ~ 97k descriptors/step at batch 8 — and the measured ~188 ns/descriptor
aggregate caps reads at ~95 GB/s while the grouped writeback runs ~310 GB/s
(CLAUDE.md batch-8 int4 budget: reads+insert 18.2 ms of a 34.4 ms step).

This module restructures the cache so the SAME bytes move in 12x fewer,
12x larger descriptors:

  cache layout: [B, N, L, Mc, RW]  (beam-major; one beam's rows for ALL
  layers are contiguous — a single DMA moves ~344 KB at t5-base/int4)

  kernel A  ``reorder_cache_all``  (once per step): gathers each current
  beam's all-layer row block from ``cache_src`` by ``src``, inserts step
  t-1's k/v (``kvg``, quantized here exactly once) at slot t-1 for every
  layer, and writes the ordered slab to ``cache_dst`` — per-beam descriptors
  both ways, bandwidth-bound instead of issue-bound.

  kernel B  ``step_attention_seq``  (per layer): attention over the already
  REORDERED cache — reads are sequential [wg, Mc, RW] strided blocks (no
  gather, ~29-230 KB/descriptor), math identical to attend_reorder's but
  with no slot-(t-1) special case (the insert already happened in kernel A).

Total traffic rises from 2 cache passes/step to ~3 (kernel B re-reads what
kernel A wrote), but every pass runs at parallel-DMA bandwidth rather than
descriptor-issue latency. Numerics note: at step t the freshly inserted
slot t-1 is read back QUANTIZED (attend_reorder uses the exact bf16 kvg for
that one step) — one extra quantization-rounding on the newest slot, inside
the validated int8/int4 error envelope.

Reference analogue: same as ops/attend_reorder.py — the decoder
self-attention step + _reorder_cache pair inside the beam loop
(/root/reference/t5_pretrainer/tasks/generation.py:435-442,511-518).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ripor_tpu.ops.attend_reorder import (
    SCALE_COLS, _quantize_rows, _quantize_rows_int4, _unpack_int4,
    _VMEM_BUDGET, pick_chunk)

import os

# beams per reorder grid cell. Must divide the (chunkB-padded) beam count:
# kernel B pads N to a multiple of its chunk (40 by default), and 8 | 40.
# 8 in-flight ~344 KB reads (x2 buffers) saturate the parallel-DMA ceiling;
# larger values only cost VMEM.
REORDER_CHUNK = int(os.environ.get("RIPOR_MR_CHUNK", "8"))
# beams per read descriptor in kernel B (contiguous [wg, Mc, RW] runs share
# one strided descriptor; the beam stride is L*Mc*RW). 0 = whole chunk —
# the measured best (7.57 vs 7.41 qps at wg=8, b8/beam1000/int4)
SEQ_WG = int(os.environ.get("RIPOR_MR_WG", "0"))
# kernel B grid-cell width override (beams per cell). The dma-stub ablation
# shows kernel B's reads are fully hidden under its math; the remaining
# non-math cost is ~1.7 us/grid-cell fixed overhead — so fewer, larger
# cells win. Applied only when it divides the (padded) beam count and the
# double row buffer fits VMEM; the math runs in SEQ_MTILE-beam sub-tiles to
# keep its temporaries bounded regardless of the cell width. 0 = pick_chunk.
SEQ_CHUNK = int(os.environ.get("RIPOR_MR_BCHUNK", "0"))
# beam sub-tile for kernel B's attention math ([tile*Mc, F] temporaries must
# fit scoped VMEM; 40 matches the measured-good pick_chunk envelope)
SEQ_MTILE = int(os.environ.get("RIPOR_MR_MTILE", "40"))
# kernel B read mode: "manual" (explicit double-buffered DMAs) or "stream"
# (BlockSpec auto-pipelining, as step_attention_fused does)
SEQ_MODE = os.environ.get("RIPOR_MR_SEQ", "manual")


# revolving-buffer depth in the reorder kernel: reads for NSLOTS-1 cells
# stay in flight (the 2-slot version measured 293 GB/s combined vs the 433
# ceiling — not enough DMA depth at 8 descriptors/cell)
NSLOTS = int(os.environ.get("RIPOR_MR_NSLOTS", "4"))
# RIPOR_MR_FUSED_KVG: carry step t-1's kv_new UN-permUTED through the scan
# and let the reorder kernel gather each beam's kvg row by ``src`` itself
# (one extra small DMA per (beam, layer-group) cell, hidden under the big
# row reads) instead of running a standalone XLA beam_gather_rows pass —
# saves the gather's full read+write over [B, N, L*2F] every step
# (CLAUDE.md b8 budget: kvg gather ~1.9-2.1 ms/step).
# MEASURED DEAD END ON HARDWARE (r3): Mosaic rejects the per-beam kvg
# slice — `tpu.memref_slice` of the 3-D [B, N, L*2F] HBM operand takes a
# size-1 dynamic slice of dim 1, and N is a TILED dim there ("slice shape
# along dimension 1 must be aligned to tiling (8)"); interpret mode hid
# it, exactly like RIPOR_MR_INS=dma. A legal layout needs kvg as 5-D
# [B, N, G, lg, krow] so only (lg, krow) are tiled — at lg∉8ℤ that pads
# every tile 25-33%, and the in-kernel [chunk, lg, krow]->[chunk*lg, krow]
# merge is a further relayout risk. Superseded by RIPOR_MR_QFUSE below,
# which removes most of the same gather bytes with no Mosaic exposure.
# Kept for interpret-mode parity coverage; do not enable on TPU.
FUSED_KVG = os.environ.get("RIPOR_MR_FUSED_KVG", "0") == "1"
# RIPOR_MR_QFUSE: for quantized caches, kernel B quantizes each layer's
# fresh kv rows to cache layout as an EXTRA OUTPUT (kvf is already in VMEM
# as its pipelined operand — the quantize rides the existing cell, ~free),
# so the scan carries int8 cache-layout kvg and the XLA beam gather moves
# 2-4x fewer bytes. This is RIPOR_MR_KVG_XLA without the standalone
# quantize pass that made that mode 12% SLOWER (the pass re-read+wrote
# ~455 MB/step of kv_new that the kernel sees for free). Bit-identical to
# the in-kernel-insert default: same _quantize_rows* helpers on the same
# values, and per-row quantization commutes with the row gather.
# Default ON for quantized megarow caches since r3: measured 8.18 vs 8.09
# qps (b12/beam1000/int4, one v5e chip) — the gather shrinks 4x but the
# extra kernel-B output write claws back part of it.
QFUSE = os.environ.get("RIPOR_MR_QFUSE", "1") == "1"
# ablation instrumentation (tools/bench_decode_ablate.py mr_dma_stub): shrink
# kernel B's row reads to an [8, 128] corner per beam group — keeps the
# descriptor count and the full attention math (on stale buffer contents) so
# the timing difference vs mr_full isolates the DMA *bytes*. Never set in
# production.
_DMA_STUB = os.environ.get("RIPOR_MR_DMA_STUB", "0") == "1"
# RIPOR_MR_MXU: run kernel B's quantized score/expand passes as batched
# per-beam MXU dots ([Mc, F] @ [F, H] and [Mc, H]^T @ [Mc, F]) instead of
# the VPU elementwise-multiply + block-diag formulation. Built to settle
# VERDICT r3 #7: the ceiling doc rejected this lever on an ESTIMATE
# (~5.7 ms vs the 1.8 ms VPU pass it replaces — N=12 heads pads to the
# 128-wide MXU tile). Same products, same f32 accumulation — parity-tested
# against the default formulation (tests/test_megarow.py).
MXU_MATH = os.environ.get("RIPOR_MR_MXU", "0") == "1"


def pick_layer_group(L: int, Mc: int, RW: int, isz: int,
                     f2: int = 0, fused_kv_bytes: int = 0) -> int:
    """Largest divisor of L whose [NSLOTS, REORDER_CHUNK, lg, Mc, RW]
    revolving row buffer PLUS the in-kernel quantize's f32 temporaries
    (~9 live copies of the [chunk*lg, f2] kvg rows — calibrated against a
    measured Mosaic scoped-VMEM usage of 16.11 MB at lg=12/NSLOTS=4/int4,
    11.0 MB buffer) fits scoped VMEM. ``f2`` is the bf16 kvg row width per
    layer (2F), 0 if pre-quantized. ``fused_kv_bytes`` is the per-(beam,
    layer) kvg row byte width when the kernel gathers kvg itself
    (FUSED_KVG): it adds a second [NSLOTS, chunk, lg, krow] revolving
    buffer."""
    for lg in sorted((d for d in range(1, L + 1) if L % d == 0),
                     reverse=True):
        need = (NSLOTS * REORDER_CHUNK * lg * Mc * RW * isz
                + 9 * REORDER_CHUNK * lg * f2 * 4
                + NSLOTS * REORDER_CHUNK * lg * fused_kv_bytes)
        if need <= _VMEM_BUDGET:
            return lg
    raise ValueError(
        f"megarow reorder cannot fit a single-layer row chunk in VMEM "
        f"(L={L}, Mc={Mc}, RW={RW}, itemsize={isz}); shrink cache segments")


def _reorder_kernel(src_ref, tt_ref, kvg_ref, cache_ref, dst_ref,
                    cache_out_ref, buf, *rest, num_heads: int,
                    quant: "str | None", kvg_pre: bool, chunk: int, lg: int,
                    krow: int, fused: bool, pipelined: bool):
    """Grid cell: gather ``chunk`` beams' [lg, Mc, RW] row blocks by src,
    insert kvg at slot t-1, write the ordered slab back. Reads for the
    next NSLOTS-1 cells revolve through the buffer slots (2-slot double
    buffering measured 293 GB/s combined vs the 433 ceiling — per-cell
    descriptor depth was too shallow). In ``fused`` mode kvg is an HBM
    operand holding UN-permuted kv_new rows; each beam's [lg*krow] slice is
    gathered by src through a second revolving buffer (the small copies
    hide under the big row reads)."""
    if fused:
        kvbuf, isems, osems, ksems = rest
    else:
        isems, osems = rest
        kvbuf = ksems = None
    del dst_ref  # aliased to cache_out_ref's buffer
    b = pl.program_id(0)
    g = pl.program_id(1)
    c = pl.program_id(2)
    ng = pl.num_programs(1)
    nc = pl.num_programs(2)
    total = pl.num_programs(0) * ng * nc
    t = tt_ref[0]
    Mc = buf.shape[3]
    ns = buf.shape[0]
    i = (b * ng + g) * nc + c
    cur = jax.lax.rem(i, ns)

    def coords(i2):
        b2 = i2 // (ng * nc)
        r = jax.lax.rem(i2, ng * nc)
        return b2, r // nc, jax.lax.rem(r, nc)

    def issue_ins(i2, s2):
        b2, g2, c2 = coords(i2)
        for j in range(chunk):
            row = src_ref[b2, c2 * chunk + j]
            pltpu.make_async_copy(
                cache_ref.at[b2, row, pl.ds(g2 * lg, lg)],
                buf.at[s2, j], isems.at[s2]).start()
            if fused:
                pltpu.make_async_copy(
                    kvg_ref.at[b2, row, pl.ds(g2 * lg * krow, lg * krow)],
                    kvbuf.at[s2, j], ksems.at[s2]).start()

    def wait_ins(s2):
        for j in range(chunk):
            pltpu.make_async_copy(
                cache_ref.at[b, src_ref[b, c * chunk + j], pl.ds(g * lg, lg)],
                buf.at[s2, j], isems.at[s2]).wait()
            if fused:
                pltpu.make_async_copy(
                    kvg_ref.at[b, src_ref[b, c * chunk + j],
                               pl.ds(g * lg * krow, lg * krow)],
                    kvbuf.at[s2, j], ksems.at[s2]).wait()

    def wait_outs(s2):
        # reconstructed same-shaped descriptor (the wait consumes the
        # semaphore by transfer size only)
        pltpu.make_async_copy(
            buf.at[s2],
            cache_out_ref.at[b, pl.ds(c * chunk, chunk), pl.ds(g * lg, lg)],
            osems.at[s2]).wait()

    # prepare the slot-(t-1) insert rows FIRST when kvg is a pipelined
    # operand (already in VMEM): the quantize compute overlaps the row DMAs
    # being waited below instead of sitting between wait and writeback.
    # In fused mode the rows arrive with wait_ins, so this moves below.
    F2 = krow
    if not fused:
        kvrows = kvg_ref[0].reshape(chunk * lg, F2)
    def make_ins(kvrows):
        if kvg_pre:
            ins = kvrows   # pre-quantized cache-layout rows: insert verbatim
        elif quant == "int4":
            q4, epad = _quantize_rows_int4(kvrows, num_heads)
            ins = jnp.concatenate([q4, epad], axis=1)
        elif quant == "int8":
            q8, epad = _quantize_rows(kvrows, num_heads)
            ins = jnp.concatenate([q8, epad], axis=1)
        else:
            ins = kvrows
        return ins.reshape(chunk, lg, 1, ins.shape[-1])

    if not fused:
        ins = make_ins(kvrows)

    if pipelined:
        @pl.when(i == 0)
        def _prologue():
            for d in range(min(ns - 1, total)):
                issue_ins(jnp.int32(d), d)

        @pl.when(i >= 1)
        def _retire_prev_outs():
            # cell i-1's writeback used slot (i-1) % ns — retire it before
            # the prefetch below reuses that slot for cell i+ns-1's reads
            wait_outs(jax.lax.rem(i - 1 + ns, ns))

        @pl.when(i + ns - 1 < total)
        def _prefetch():
            issue_ins(i + ns - 1, jax.lax.rem(i + ns - 1, ns))
    else:
        issue_ins(i, cur)

    wait_ins(cur)
    if fused:
        ins = make_ins(kvbuf[cur].reshape(chunk * lg, F2))
    # complete the deferred reorder: slot t-1 := step t-1's k/v for every
    # layer in this group (quantized caches quantize exactly once). A
    # read-modify-write of the ALIGNED 8-slot window around t-1, NOT a
    # whole-buffer where(): the where's two [chunk, lg, Mc, RW] temporaries
    # blow scoped VMEM at lg=12/NSLOTS=4, and Mosaic requires sublane-dim
    # stores to be provably 8-aligned (hence the multiple_of hint). At t=0
    # the clamped window writes slot 0 with the all-zero initial kvg;
    # harmless — slots >= t are bias-masked and slot 0 is properly written
    # at t=1.
    tm = jnp.maximum(t - 1, 0)
    base = pl.multiple_of((tm // 8) * 8, 8)
    win = buf[cur, :, :, pl.ds(base, 8), :]
    slot_w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
    buf[cur, :, :, pl.ds(base, 8), :] = jnp.where(slot_w == tm - base,
                                                  ins, win)
    pltpu.make_async_copy(
        buf.at[cur],
        cache_out_ref.at[b, pl.ds(c * chunk, chunk), pl.ds(g * lg, lg)],
        osems.at[cur]).start()
    if pipelined:
        @pl.when(i + 1 >= total)      # epilogue: retire the final slab
        def _retire_last_outs():
            wait_outs(cur)
    else:
        wait_outs(cur)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                             "chunk", "lg", "fused_kvg"))
def reorder_cache_all(kvg, cache_src, cache_dst, src, t, num_heads: int,
                      interpret: bool = None, chunk: int = None,
                      lg: int = None, fused_kvg: bool = False):
    """Beam-reorder the ENTIRE megarow cache (all layers) in one pass.

    kvg: [B, N, L*2F] step t-1's K|V for all layers (layer-major rows,
    exact bf16/f32 — or cache-layout int8 rows when pre-quantized). When
    ``fused_kvg`` is False the rows are already permuted to current beam
    order; when True they are UN-permuted (row j is previous-beam j's) and
    the kernel gathers row src[b, n] itself alongside the cache row reads
    (RIPOR_MR_FUSED_KVG — saves the standalone XLA gather pass);
    cache_src: [B, N, L, Mc, RW] ordered for the previous step's beams
    (slots [0, t-1) valid); cache_dst: ping-pong partner (aliased output);
    src: [B, N] int32 current-beam -> previous-row map.

    Returns the reordered cache (cache_dst's buffer) with slot t-1
    inserted for every layer. Quant mode is inferred from dtype + row
    width exactly as in attend_reorder.step_attend_reorder.
    """
    if interpret is None:  # CPU tests run the kernel in interpret mode
        interpret = jax.default_backend() != "tpu"
    B, N, L, Mc, RW = cache_src.shape
    # pre-quantized kvg (quantize_rows_xla{,_int4} ran before the gather)
    # arrives in cache-row layout and is inserted verbatim
    kvg_pre = kvg.dtype == jnp.int8
    assert not kvg_pre or cache_src.dtype == jnp.int8, \
        "int8 kvg rows need a quantized cache"
    krow = RW if kvg_pre else kvg.shape[2] // L       # per-layer row width
    if cache_src.dtype == jnp.int8 and not kvg_pre:
        quant = "int4" if RW == krow // 2 + SCALE_COLS else "int8"
    else:
        quant = None
    assert cache_dst.shape == cache_src.shape, cache_dst.shape
    assert kvg.shape == (B, N, L * krow), kvg.shape
    assert src.shape == (B, N), src.shape
    if lg is None:
        lg = pick_layer_group(L, Mc, RW, cache_src.dtype.itemsize,
                              f2=0 if kvg_pre else krow,
                              fused_kv_bytes=(krow * kvg.dtype.itemsize
                                              if fused_kvg else 0))
    if chunk is None:
        chunk = REORDER_CHUNK
    if N % chunk != 0:
        pad = chunk - N % chunk
        padded = reorder_cache_all(
            jnp.pad(kvg, ((0, 0), (0, pad), (0, 0))),
            jnp.pad(cache_src, ((0, 0), (0, pad)) + ((0, 0),) * 3),
            jnp.pad(cache_dst, ((0, 0), (0, pad)) + ((0, 0),) * 3),
            jnp.pad(src, ((0, 0), (0, pad))),
            t, num_heads, interpret=interpret, chunk=chunk, lg=lg,
            fused_kvg=fused_kvg)
        return padded[:, :N]

    kernel = functools.partial(_reorder_kernel, num_heads=num_heads,
                               quant=quant, kvg_pre=kvg_pre, chunk=chunk,
                               lg=lg, krow=krow, fused=fused_kvg,
                               pipelined=not interpret)
    tt = jnp.asarray(t, jnp.int32).reshape(1)
    if fused_kvg:
        # kvg lives in HBM; the kernel gathers [lg*krow] row slices by src
        kvg_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [
            pltpu.VMEM((NSLOTS, chunk, lg, Mc, RW), cache_src.dtype),
            pltpu.VMEM((NSLOTS, chunk, lg * krow), kvg.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ]
    else:
        # kvg is [B, N, L*krow] layer-major: group g covers layers
        # [g*lg, (g+1)*lg) = columns [g*lg*krow, ...) -> block index g
        kvg_spec = pl.BlockSpec((1, chunk, lg * krow),
                                lambda b, g, c, s_, t_: (b, c, g))
        scratch = [
            pltpu.VMEM((NSLOTS, chunk, lg, Mc, RW), cache_src.dtype),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
            pltpu.SemaphoreType.DMA((NSLOTS,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, L // lg, N // chunk),
        in_specs=[
            kvg_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=scratch,
    )
    new_cache = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(cache_src.shape, cache_src.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        # operands: (src, tt, kvg, cache_src, cache_dst=4)
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src, tt, kvg, cache_src, cache_dst)
    return new_cache


# ---------------------------------------------------------------------------
# kernel B: one-position attention over the reordered megarow cache
# ---------------------------------------------------------------------------

def _seq_math(qb, kvnew, bias_hist, bias_new, rows, num_heads: int):
    """Attention on VMEM rows [C, Mc, 2F] (K|V merged, slot t-1 already
    inserted) with position t's k/v folded into the softmax. Same math as
    attend_reorder._attn_math minus the kvg slot special-case; dots run at
    the cache dtype (see that kernel's precision note). All inputs are
    VALUES (the kernel slices its refs into SEQ_MTILE-beam sub-tiles before
    calling). Returns [C, F] f32."""
    C, F = qb.shape
    Mc = rows.shape[1]
    H = num_heads
    head_of = jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // (F // H)
    head_mask = (head_of == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1))
    dot_dt = rows.dtype
    hm = head_mask.astype(dot_dt)
    qb = qb.astype(dot_dt)
    k_hist = rows[:, :, :F]
    v_hist = rows[:, :, F:]
    kq = (k_hist * qb[:, None, :]).reshape(C * Mc, F)
    s_hist = jax.lax.dot(kq.astype(dot_dt), hm,
                         preferred_element_type=jnp.float32).reshape(C, Mc, H)
    s_hist = s_hist + bias_hist.astype(jnp.float32)[None]
    kn = kvnew[:, :F].astype(dot_dt) * qb
    v_new = kvnew[:, F:]
    s_new = jax.lax.dot(kn, hm, preferred_element_type=jnp.float32)  # [C, H]
    s_new = s_new + bias_new.astype(jnp.float32)

    scores = jnp.concatenate([s_hist, s_new[:, None, :]], axis=1)
    probs = jax.nn.softmax(scores, axis=1)               # [C, Mc+1, H]
    pe = jax.lax.dot(probs[:, :Mc].reshape(C * Mc, H).astype(dot_dt), hm.T,
                     preferred_element_type=jnp.float32).reshape(C, Mc, F)
    if dot_dt == jnp.float32:
        out = (pe * v_hist.astype(jnp.float32)).sum(axis=1)
    else:
        out = jnp.sum(pe.astype(dot_dt) * v_hist, axis=1, dtype=jnp.float32)
    pn = jax.lax.dot(probs[:, Mc].astype(dot_dt), hm.T,
                     preferred_element_type=jnp.float32)             # [C, F]
    return out + pn * v_new.astype(jnp.float32)


def _seq_math_quant(qb, kvnew, bias_hist, bias_new, rows,
                    num_heads: int, quant: str):
    """_seq_math for int8/int4 rows [C, Mc, RW]: uniform per-(slot, head)
    power-of-2 dequantization (every slot incl. the fresh t-1 is quantized —
    see module numerics note). Mirrors attend_reorder._attn_math_q8/_q4's
    uniform paths. Inputs are values (sub-tile slices). Returns [C, F] f32."""
    C, F = qb.shape
    Mc = rows.shape[1]
    H = num_heads
    head_of = jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // (F // H)
    head_mask = (head_of == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1))
    hm = head_mask.astype(jnp.bfloat16)

    if quant == "int4":
        k8, v8 = _unpack_int4(rows[:, :, :F])            # bf16 planes
        ef = rows[:, :, F:].astype(jnp.float32)          # [C, Mc, SCALE_COLS]
    else:
        k8 = rows[:, :, :F].astype(jnp.bfloat16)         # exact int8->bf16
        v8 = rows[:, :, F:2 * F].astype(jnp.bfloat16)
        ef = rows[:, :, 2 * F:].astype(jnp.float32)
    ek = jnp.exp2(ef[:, :, :H])                          # [C, Mc, H]
    ev = jnp.exp2(ef[:, :, H:2 * H])

    qb = qb.astype(jnp.bfloat16)
    kq = (k8 * qb[:, None, :]).reshape(C * Mc, F)
    s_hist = jax.lax.dot(kq, hm,
                         preferred_element_type=jnp.float32).reshape(C, Mc, H)
    s_hist = s_hist * ek
    s_hist = s_hist + bias_hist.astype(jnp.float32)[None]

    k_new = kvnew[:, :F].astype(jnp.bfloat16)
    v_new = kvnew[:, F:]
    s_new = jax.lax.dot(k_new * qb, hm,
                        preferred_element_type=jnp.float32)          # [C, H]
    s_new = s_new + bias_new.astype(jnp.float32)

    scores = jnp.concatenate([s_hist, s_new[:, None, :]], axis=1)
    probs = jax.nn.softmax(scores, axis=1)               # [C, Mc+1, H]
    # fold the per-(slot, head) V scale into probs pre-expansion.
    # MEASURED DEAD END: a bf16-accumulating expansion dot (to skip the
    # f32->bf16 convert pass) is rejected by Mosaic — 'matmul acc must be
    # 32-bit'. The convert pass stays.
    ps = probs[:, :Mc] * ev
    pe = jax.lax.dot(ps.reshape(C * Mc, H).astype(jnp.bfloat16), hm.T,
                     preferred_element_type=jnp.float32).reshape(C, Mc, F)
    out = jnp.sum(pe.astype(jnp.bfloat16) * v8, axis=1, dtype=jnp.float32)
    pn = jax.lax.dot(probs[:, Mc].astype(jnp.bfloat16), hm.T,
                     preferred_element_type=jnp.float32)             # [C, F]
    return out + pn * v_new.astype(jnp.float32)


def _seq_math_quant_mxu(qb, kvnew, bias_hist, bias_new, rows,
                        num_heads: int, quant: str):
    """_seq_math_quant with the two [C, Mc, F]-element VPU passes replaced
    by batched per-beam MXU dots (RIPOR_MR_MXU=1):

      scores: s[c] = k8[c] @ (q[c] ⊙ head_mask)    [Mc, F] @ [F, H]
      expand: o[c] = (ps[c])ᵀ @ v8[c]              [H, Mc] @ [Mc, F]

    head_mask is 0/1 so q⊙mask is exact; both dots accumulate f32 over the
    same bf16 products as the default path (the expand even skips the
    default's pe f32→bf16 round-trip) — differences are reduction-order
    only. The lever trades VPU element passes for MXU tiles padded H=12→128
    (scores) / K=Mc→tile (expand); the ceiling doc estimated this loses
    ~3x — this implementation exists to measure it (VERDICT r3 #7)."""
    C, F = qb.shape
    Mc = rows.shape[1]
    H = num_heads
    head_of = jax.lax.broadcasted_iota(jnp.int32, (F, H), 0) // (F // H)
    head_mask = (head_of == jax.lax.broadcasted_iota(jnp.int32, (F, H), 1))
    hm = head_mask.astype(jnp.bfloat16)

    if quant == "int4":
        k8, v8 = _unpack_int4(rows[:, :, :F])            # bf16 planes
        ef = rows[:, :, F:].astype(jnp.float32)
    else:
        k8 = rows[:, :, :F].astype(jnp.bfloat16)
        v8 = rows[:, :, F:2 * F].astype(jnp.bfloat16)
        ef = rows[:, :, 2 * F:].astype(jnp.float32)
    ek = jnp.exp2(ef[:, :, :H])
    ev = jnp.exp2(ef[:, :, H:2 * H])

    qb = qb.astype(jnp.bfloat16)
    # NOTE Mosaic-on-hardware: the earlier [C,F]->[C,F,H] broadcast
    # (qb[:, :, None] * hm) inserts a non-no-op MINOR dim on bf16, which
    # Mosaic only supports for 32-bit types (interpret mode hid it; the
    # chip compile failed). Contract k8⊙q against the 0/1 head mask
    # instead — same products, no minor-dim insertion, one fewer [C,F,H]
    # temporary.
    kq = k8 * qb[:, None, :]                             # [C, Mc, F]
    s_hist = jax.lax.dot_general(
        kq, hm, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [C, Mc, H]
    s_hist = s_hist * ek + bias_hist.astype(jnp.float32)[None]

    k_new = kvnew[:, :F].astype(jnp.bfloat16)
    v_new = kvnew[:, F:]
    s_new = jax.lax.dot(k_new * qb, hm,
                        preferred_element_type=jnp.float32)          # [C, H]
    s_new = s_new + bias_new.astype(jnp.float32)

    scores = jnp.concatenate([s_hist, s_new[:, None, :]], axis=1)
    probs = jax.nn.softmax(scores, axis=1)               # [C, Mc+1, H]
    ps = (probs[:, :Mc] * ev).astype(jnp.bfloat16)       # [C, Mc, H]
    outh = jax.lax.dot_general(
        ps, v8, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [C, H, F]
    out = jnp.sum(outh * hm.T[None], axis=1)             # [C, F]
    pn = jax.lax.dot(probs[:, Mc].astype(jnp.bfloat16), hm.T,
                     preferred_element_type=jnp.float32)             # [C, F]
    return out + pn * v_new.astype(jnp.float32)


def _emit_quant_rows(kvnew_ref, kvq_ref, num_heads: int, emit_quant: str):
    """QFUSE: quantize this cell's fresh [chunk, 2F] kv rows (already in
    VMEM as the kvnew pipelined operand) to cache layout and write them to
    the extra output — same helpers as the reorder kernel's insert, so the
    carried kvg is bit-identical to what kernel A would have produced."""
    kvr = kvnew_ref[0]
    if emit_quant == "int4":
        qq, ee = _quantize_rows_int4(kvr, num_heads)
    else:
        qq, ee = _quantize_rows(kvr, num_heads)
    kvq_ref[0] = jnp.concatenate([qq, ee], axis=1)


def _seq_kernel(lt_ref, q_ref, kvnew_ref, bias_hist_ref, bias_new_ref,
                cache_ref, attn_ref, *rest, num_heads: int,
                quant: "str | None", chunk: int, wg: int, mtile: int,
                emit_quant: "str | None", pipelined: bool):
    """Grid cell: stream this layer's [chunk, Mc, RW] reordered rows in
    wg-beam strided descriptors (double-buffered across cells), then run
    the attention math in ``mtile``-beam sub-tiles (bounds the math's
    [tile*Mc, F] temporaries so the cell width can grow past pick_chunk's
    envelope — fewer cells = less of the ~1.7 us/cell fixed overhead the
    dma-stub ablation isolated)."""
    if emit_quant:
        kvq_ref, buf, isems = rest
    else:
        kvq_ref = None
        buf, isems = rest
    b = pl.program_id(0)
    c = pl.program_id(1)
    nc = pl.num_programs(1)
    total = pl.num_programs(0) * nc
    l = lt_ref[0]
    i = b * nc + c
    cur = jax.lax.rem(i, 2)
    nxt = 1 - cur

    def issue_ins(b2, c2, s2):
        for j in range(0, chunk, wg):
            if _DMA_STUB:       # ablation: same descriptors, ~28x fewer bytes
                pltpu.make_async_copy(
                    cache_ref.at[b2, pl.ds(c2 * chunk + j, wg), l,
                                 pl.ds(0, 8), pl.ds(0, 128)],
                    buf.at[s2, pl.ds(j, wg), pl.ds(0, 8), pl.ds(0, 128)],
                    isems.at[s2]).start()
            else:
                pltpu.make_async_copy(
                    cache_ref.at[b2, pl.ds(c2 * chunk + j, wg), l],
                    buf.at[s2, pl.ds(j, wg)], isems.at[s2]).start()

    def wait_ins(s2):
        for j in range(0, chunk, wg):
            if _DMA_STUB:
                pltpu.make_async_copy(
                    cache_ref.at[b, pl.ds(c * chunk + j, wg), l,
                                 pl.ds(0, 8), pl.ds(0, 128)],
                    buf.at[s2, pl.ds(j, wg), pl.ds(0, 8), pl.ds(0, 128)],
                    isems.at[s2]).wait()
            else:
                pltpu.make_async_copy(
                    cache_ref.at[b, pl.ds(c * chunk + j, wg), l],
                    buf.at[s2, pl.ds(j, wg)], isems.at[s2]).wait()

    if pipelined:
        @pl.when(i == 0)
        def _prologue():
            issue_ins(b, c, cur)

        @pl.when(i + 1 < total)
        def _prefetch_next():
            wrap = c + 1 == nc
            b2 = jnp.where(wrap, b + 1, b)
            c2 = jnp.where(wrap, 0, c + 1)
            issue_ins(b2, c2, nxt)
    else:
        issue_ins(b, c, cur)

    if emit_quant:
        # QFUSE: quantize this cell's fresh kv rows while its row reads are
        # in flight (kvnew is already VMEM-resident as a pipelined operand)
        _emit_quant_rows(kvnew_ref, kvq_ref, num_heads, emit_quant)

    wait_ins(cur)
    bh = bias_hist_ref[...]
    bn = bias_new_ref[...]
    for j0 in range(0, chunk, mtile):
        rows = buf[cur, j0:j0 + mtile]
        qb = q_ref[0, j0:j0 + mtile]
        kvn = kvnew_ref[0, j0:j0 + mtile]
        if quant:
            fn = _seq_math_quant_mxu if MXU_MATH else _seq_math_quant
            out = fn(qb, kvn, bh, bn, rows, num_heads, quant)
        else:
            out = _seq_math(qb, kvn, bh, bn, rows, num_heads)
        attn_ref[0, j0:j0 + mtile] = out.astype(attn_ref.dtype)


def _seq_kernel_stream(lt_ref, q_ref, kvnew_ref, bias_hist_ref,
                       bias_new_ref, rows_ref, attn_ref, *rest,
                       num_heads: int, quant: "str | None", chunk: int,
                       mtile: int, emit_quant: "str | None"):
    """BlockSpec-streaming variant: the pallas pipeline DMAs this layer's
    [1, chunk, 1, Mc, RW] block (double-buffered across cells) — same math."""
    if emit_quant:
        _emit_quant_rows(kvnew_ref, rest[0], num_heads, emit_quant)
    bh = bias_hist_ref[...]
    bn = bias_new_ref[...]
    for j0 in range(0, chunk, mtile):
        rows = rows_ref[0, j0:j0 + mtile, 0]
        qb = q_ref[0, j0:j0 + mtile]
        kvn = kvnew_ref[0, j0:j0 + mtile]
        if quant:
            fn = _seq_math_quant_mxu if MXU_MATH else _seq_math_quant
            out = fn(qb, kvn, bh, bn, rows, num_heads, quant)
        else:
            out = _seq_math(qb, kvn, bh, bn, rows, num_heads)
        attn_ref[0, j0:j0 + mtile] = out.astype(attn_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                             "chunk", "wg", "emit_quant"))
def step_attention_seq(q, kv_new, cache, layer, bias_hist, bias_new,
                       num_heads: int, interpret: bool = None,
                       chunk: int = None, wg: int = None,
                       emit_quant: str = None):
    """One-position cached self-attention over the REORDERED megarow cache.

    q: [B, N, F]; kv_new: [B, N, 2F] position-t K|V (current beams, not in
    cache); cache: [B, N, L, Mc, RW] with slots [0, t) valid and already in
    current beam order (reorder_cache_all ran first this step);
    layer: scalar int32; bias_hist: [Mc, H] f32 (slots >= t masked);
    bias_new: [1, H] f32. Returns attention output [B, N, F].

    ``emit_quant`` ("int8"/"int4", QFUSE): additionally quantize kv_new to
    cache-layout rows inside the kernel and return (attn, kvq [B, N, RW]
    int8) — the rows the NEXT step's reorder inserts verbatim (kvg_pre),
    bit-identical to the in-kernel insert quantizer.
    """
    if interpret is None:  # CPU tests run the kernel in interpret mode
        interpret = jax.default_backend() != "tpu"
    B, N, F = q.shape
    _, _, L, Mc, RW = cache.shape
    if cache.dtype == jnp.int8:
        quant = "int4" if RW == F + SCALE_COLS else "int8"
    else:
        quant = None
    if emit_quant is not None and emit_quant != quant:
        raise ValueError(
            f"emit_quant={emit_quant!r} must match the cache quantization "
            f"({quant!r}) — the emitted rows are next step's verbatim "
            f"cache inserts")
    assert kv_new.shape == (B, N, 2 * F), kv_new.shape
    if chunk is None:
        chunk = pick_chunk(Mc, RW, cache.dtype.itemsize)
    # SEQ_CHUNK widens the grid cells past pick_chunk's math-temporary
    # envelope (the math is sub-tiled below); require divisibility — the
    # pad fallback would copy the whole cache — and a VMEM-safe row buffer
    if (SEQ_CHUNK and N % SEQ_CHUNK == 0
            and 2 * SEQ_CHUNK * Mc * RW * cache.dtype.itemsize
            <= _VMEM_BUDGET - 2_000_000):
        chunk = SEQ_CHUNK
    mtile = SEQ_MTILE if chunk % SEQ_MTILE == 0 else chunk
    if wg is None:
        wg = SEQ_WG or chunk
        wg = wg if chunk % wg == 0 else 1
    if N % chunk != 0:
        pad = chunk - N % chunk
        out = step_attention_seq(
            jnp.pad(q, ((0, 0), (0, pad), (0, 0))),
            jnp.pad(kv_new, ((0, 0), (0, pad), (0, 0))),
            jnp.pad(cache, ((0, 0), (0, pad)) + ((0, 0),) * 3),
            layer, bias_hist, bias_new, num_heads,
            interpret=interpret, chunk=chunk, wg=wg,
            emit_quant=emit_quant)
        if emit_quant:
            return out[0][:, :N], out[1][:, :N]
        return out[:, :N]

    # QFUSE extra output: cache-layout quantized kv rows for this layer
    out_shape = jax.ShapeDtypeStruct((B, N, F), q.dtype)
    out_spec = pl.BlockSpec((1, chunk, F), lambda b, c, l_: (b, c, 0))
    if emit_quant:
        out_shape = [out_shape, jax.ShapeDtypeStruct((B, N, RW), jnp.int8)]
        out_spec = [out_spec,
                    pl.BlockSpec((1, chunk, RW), lambda b, c, l_: (b, c, 0))]

    lt = jnp.asarray(layer, jnp.int32).reshape(1)
    if SEQ_MODE == "stream" and not interpret:
        kernel = functools.partial(_seq_kernel_stream, num_heads=num_heads,
                                   quant=quant, chunk=chunk, mtile=mtile,
                                   emit_quant=emit_quant)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, N // chunk),
            in_specs=[
                pl.BlockSpec((1, chunk, F), lambda b, c, l_: (b, c, 0)),
                pl.BlockSpec((1, chunk, 2 * F), lambda b, c, l_: (b, c, 0)),
                pl.BlockSpec((Mc, num_heads), lambda b, c, l_: (0, 0)),
                pl.BlockSpec((1, num_heads), lambda b, c, l_: (0, 0)),
                pl.BlockSpec((1, chunk, 1, Mc, RW),
                             lambda b, c, l_: (b, c, l_[0], 0, 0)),
            ],
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=grid_spec,
            interpret=interpret,
        )(lt, q, kv_new, bias_hist, bias_new, cache)

    kernel = functools.partial(_seq_kernel, num_heads=num_heads, quant=quant,
                               chunk=chunk, wg=wg, mtile=mtile,
                               emit_quant=emit_quant,
                               pipelined=not interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, N // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, F), lambda b, c, l_: (b, c, 0)),
            pl.BlockSpec((1, chunk, 2 * F), lambda b, c, l_: (b, c, 0)),
            pl.BlockSpec((Mc, num_heads), lambda b, c, l_: (0, 0)),
            pl.BlockSpec((1, num_heads), lambda b, c, l_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, chunk, Mc, RW), cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(lt, q, kv_new, bias_hist, bias_new, cache)
