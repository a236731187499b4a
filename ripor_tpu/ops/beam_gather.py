"""Pallas beam-gather: KV-cache reorder as direct HBM->HBM row DMAs.

The beam-search cache reorder permutes ~1-2 GB of KV rows per decode step.
XLA's gather runs this at ~100 GB/s on v5e (element-granularity addressing);
this kernel instead issues one async DMA per 48 KB row with scalar-prefetched
beam indices, approaching copy bandwidth. It is the hot op behind
decode/beam.py's _reorder_cache (reference analogue: _reorder_cache host loop,
modeling/t5_generative_retriever.py:484-512).

Layout contract: cache rows stacked as [G, N, F] (G = num_tensors*batch,
N = beams, F = flattened row payload); src [G, N] int32 gives the source row
(in 0..N) for each output row.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows gathered per grid step (DMAs in flight per wait-batch; measured on
# v5e: throughput plateaus ~200 GB/s past chunk 40 — DMA-issue bound)
_CHUNK = 40


def _kernel(src_ref, cache_ref, out_ref, sems):
    g = pl.program_id(0)
    c = pl.program_id(1)
    n0 = c * _CHUNK
    dmas = []
    for j in range(_CHUNK):
        row = src_ref[g, n0 + j]
        dma = pltpu.make_async_copy(
            cache_ref.at[g, row],
            out_ref.at[g, n0 + j],
            sems.at[j],
        )
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_gather_rows(cache: jnp.ndarray, src: jnp.ndarray,
                     interpret: bool = None) -> jnp.ndarray:
    """out[g, n] = cache[g, src[g, n]]. cache: [G, N, F]; src: [G, N] int32."""
    if interpret is None:  # CPU tests run the kernel in interpret mode
        interpret = jax.default_backend() != "tpu"
    G, N, F = cache.shape
    assert src.shape == (G, N), (src.shape, (G, N))
    if N % _CHUNK != 0:
        pad = _CHUNK - N % _CHUNK
        src = jnp.concatenate([src, jnp.zeros((G, pad), src.dtype)], axis=1)
        cache_p = jnp.concatenate(
            [cache, jnp.zeros((G, pad, F), cache.dtype)], axis=1)
        out = beam_gather_rows(cache_p, src, interpret=interpret)
        return out[:, :N]
    # row payload is viewed as [F/128, 128]; Mosaic block slices need the
    # sublane dim (F/128) to be a multiple of the dtype's native sublane
    # count (8 for >=16-bit, 32 for int8) -> pad F accordingly
    align = 128 * (32 if cache.dtype.itemsize == 1 else 8)
    if F % align != 0:
        pad = align - F % align
        cache_p = jnp.concatenate(
            [cache, jnp.zeros((G, N, pad), cache.dtype)], axis=2)
        return beam_gather_rows(cache_p, src, interpret=interpret)[:, :, :F]

    # Mosaic tiles the last two dims (8, 128); keep N as an untiled leading
    # dim by shaping each row payload as [F/128, 128] so a [g, n] slice is
    # a whole number of tiles.
    cache4 = cache.reshape(G, N, F // 128, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, N // _CHUNK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_CHUNK,))],
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((G, N, F // 128, 128), cache.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src, cache4)
    return out.reshape(G, N, F)


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_gather_blocks(cache: jnp.ndarray, src: jnp.ndarray,
                       interpret: bool = None) -> jnp.ndarray:
    """out[g, n] = cache[g, src[g, n]] over [G, N, R, C] blocks.

    Layout-free variant of beam_gather_rows for caches whose minor dims are
    already a tile-friendly (R, C) block (e.g. [Mc, H*D] with H*D a multiple
    of 128): the input is consumed in its native XLA layout, so no relayout
    copy is materialized on either side of the kernel (the copies were ~40%
    of decode step time with the flattened-row variant)."""
    if interpret is None:  # CPU tests run the kernel in interpret mode
        interpret = jax.default_backend() != "tpu"
    G, N, R, C = cache.shape
    assert src.shape == (G, N), (src.shape, (G, N))
    if C % 128 != 0:
        pad = 128 - C % 128
        cache_p = jnp.concatenate(
            [cache, jnp.zeros((G, N, R, pad), cache.dtype)], axis=3)
        return beam_gather_blocks(cache_p, src,
                                  interpret=interpret)[:, :, :, :C]
    if N % _CHUNK != 0:
        pad = _CHUNK - N % _CHUNK
        src = jnp.concatenate([src, jnp.zeros((G, pad), src.dtype)], axis=1)
        cache_p = jnp.concatenate(
            [cache, jnp.zeros((G, pad, R, C), cache.dtype)], axis=1)
        return beam_gather_blocks(cache_p, src, interpret=interpret)[:, :N]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(G, N // _CHUNK),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_CHUNK,))],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((G, N, R, C), cache.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src, cache)


def reorder_cache_pallas(cache_tree, src: jnp.ndarray, interpret: bool = False):
    """Reorder a pytree of KV buffers [B, N, M, H, D] by src [B, N] using one
    stacked beam_gather_rows call (single kernel launch per step)."""
    leaves, treedef = jax.tree.flatten(cache_tree)
    B, N = src.shape
    shapes = [x.shape for x in leaves]
    stacked = jnp.stack([x.reshape(B, N, -1) for x in leaves])  # [L, B, N, F]
    L = stacked.shape[0]
    F = stacked.shape[-1]
    flat = stacked.reshape(L * B, N, F)
    src_rep = jnp.tile(src, (L, 1))
    out = beam_gather_rows(flat, src_rep, interpret=interpret)
    out = out.reshape(L, B, N, F)
    new_leaves = [out[i].reshape(s) for i, s in enumerate(shapes)]
    return jax.tree.unflatten(treedef, new_leaves)


def _gather_update_kernel(src_ref, t_ref, kvg_ref, cache_ref, out_ref,
                          buf, sems, osems):
    # Per-row software pipeline: start every in-DMA, then for each row
    # (wait-in -> overwrite slot t -> start-out) so out-DMAs overlap the
    # remaining in-DMAs instead of a full barrier between phases.
    g = pl.program_id(0)
    c = pl.program_id(1)
    n0 = c * _CHUNK
    t = t_ref[0]
    R = buf.shape[1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
    ins, outs = [], []
    for j in range(_CHUNK):
        row = src_ref[g, n0 + j]
        dma = pltpu.make_async_copy(cache_ref.at[g, row], buf.at[j],
                                    sems.at[j])
        dma.start()
        ins.append(dma)
    for j in range(_CHUNK):
        ins[j].wait()
        buf[j] = jnp.where(slot == t, kvg_ref[0, j][None, :], buf[j])
        dma = pltpu.make_async_copy(buf.at[j], out_ref.at[g, n0 + j],
                                    osems.at[j])
        dma.start()
        outs.append(dma)
    for dma in outs:
        dma.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def beam_gather_update(cache: jnp.ndarray, kv_gathered: jnp.ndarray,
                       src: jnp.ndarray, t, dest: jnp.ndarray = None,
                       interpret: bool = None) -> jnp.ndarray:
    """out[g, n] = cache[g, src[g, n]] with row ``t`` replaced by
    kv_gathered[g, n]. One kernel = the ONLY writer of the KV cache per
    decode step: beam reorder + the position-t k/v insert fused, staged
    through VMEM. Keeping every cache touch inside pallas stops XLA buffer
    assignment from materializing protective full-cache copies around the
    custom call / dynamic-update-slice pair (~6 ms/step at beam 1000).

    cache: [G, N, R, C]; kv_gathered: [G, N, C] (already permuted by src,
    e.g. via beam_gather_rows — it is tiny next to the cache); src: [G, N]
    int32; t: scalar int32 slot index.

    ``dest``: optional same-shape scratch buffer the output is ALIASED
    into (ping-pong double buffering). Without it, XLA's while-loop buffer
    assignment must copy the kernel output back into the carry slot every
    step (a custom call cannot write in place into its own operand) — a
    full-cache copy, ~3.6 ms/step at beam 1000.
    """
    if interpret is None:  # CPU tests run the kernel in interpret mode
        interpret = jax.default_backend() != "tpu"
    G, N, R, C = cache.shape
    assert src.shape == (G, N), (src.shape, (G, N))
    assert kv_gathered.shape == (G, N, C), kv_gathered.shape
    if C % 128 != 0:
        pad = 128 - C % 128
        cache_p = jnp.concatenate(
            [cache, jnp.zeros((G, N, R, pad), cache.dtype)], axis=3)
        kv_p = jnp.concatenate(
            [kv_gathered, jnp.zeros((G, N, pad), cache.dtype)], axis=2)
        dest_p = None if dest is None else jnp.pad(
            dest, ((0, 0), (0, 0), (0, 0), (0, pad)))
        return beam_gather_update(cache_p, kv_p, src, t, dest_p,
                                  interpret=interpret)[:, :, :, :C]
    if N % _CHUNK != 0:
        pad = _CHUNK - N % _CHUNK
        src = jnp.concatenate([src, jnp.zeros((G, pad), src.dtype)], axis=1)
        cache_p = jnp.concatenate(
            [cache, jnp.zeros((G, pad, R, C), cache.dtype)], axis=1)
        kv_p = jnp.concatenate(
            [kv_gathered, jnp.zeros((G, pad, C), cache.dtype)], axis=1)
        dest_p = None if dest is None else jnp.pad(
            dest, ((0, 0), (0, pad), (0, 0), (0, 0)))
        return beam_gather_update(cache_p, kv_p, src, t, dest_p,
                                  interpret=interpret)[:, :N]
    in_specs = [
        pl.BlockSpec((1, _CHUNK, C), lambda g, c, s, tt: (g, c, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    operands = [kv_gathered, cache]
    aliases = {}
    if dest is not None:
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        operands.append(dest)
        aliases = {4: 0}  # (src, t, kvg, cache, dest) -> output 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G, N // _CHUNK),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_CHUNK, R, C), cache.dtype),
            pltpu.SemaphoreType.DMA((_CHUNK,)),
            pltpu.SemaphoreType.DMA((_CHUNK,)),
        ],
    )
    tarr = jnp.asarray(t, jnp.int32).reshape(1)
    kernel = (_gather_update_kernel if dest is None
              else _gather_update_kernel_aliased)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, N, R, C), cache.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src, tarr, *operands)


def _gather_update_kernel_aliased(src_ref, t_ref, kvg_ref, cache_ref,
                                  dest_ref, out_ref, buf, sems, osems):
    # dest_ref aliases out_ref's buffer; the kernel only writes out_ref
    del dest_ref
    _gather_update_kernel(src_ref, t_ref, kvg_ref, cache_ref, out_ref,
                          buf, sems, osems)
