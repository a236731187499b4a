"""Dense retrieval: brute-force inner-product top-k, sharded over the mesh.

Replaces faiss IndexFlatIP/IndexIDMap + multi-GPU index cloning (reference
tasks/evaluator.py:480-492,616-623,784-812): document embeddings shard over
the 'data' mesh axis, each device computes a local top-k from one einsum,
and a gathered merge produces the global top-k — all inside one jit.
Also hosts the corpus-encoding driver (reference DenseIndexing.store_embs,
tasks/evaluator.py:494-555) with fixed-shape batching.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Iterable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ripor_tpu.core.mesh import DATA_AXIS
from ripor_tpu.models.ripor import RiporModel

# pruning tile for exact MIPS top-k (_pruned_tile_topk): the sorted volume
# is keep*TILE per query per block, so smaller tiles sort less; the floor
# is the tile-max reduce pass over the score volume. v5e-measured at 8.8M
# docs bf16: unpruned 198.5 qps, 512 -> 935, 256 -> 1234, 128 -> 1271
# (flattened; max-reduce/einsum floor). 256 is the default.
_TILE = int(os.environ.get("RIPOR_DENSE_TILE", "256"))


def _pruned_tile_topk(s, k, tile: int = 512):
    """EXACT top-k of ``s`` [Q, N] with tile-max pruning + verified
    fallback. XLA's top_k is a bitonic sort whose cost scales with the
    full score volume — the dominant cost of exact MIPS (measured 198 q/s
    vs 2416 approx over 8.8M docs). Prune first: a tile whose max is
    below the KEEP-th largest tile max cannot contain a global top-k
    element when KEEP >= k (each of the KEEP better tiles contributes at
    least its own max above it), so only KEEP tiles per query enter the
    sort — at 8.8M docs that is ~1/8 of the volume. Boundary ties could
    in principle demote a winner, so the kernel verifies completeness
    (largest PRUNED tile max strictly below the selected k-th score) and
    falls back to the full two-level sort via lax.cond — the same
    verified-fallback pattern as decode/beam.py::_exact_topk_two_stage."""
    Q, N = s.shape
    nt = N // tile
    keep = min(nt, max(128, -(-(k + 32) // 8) * 8))

    def full_sort(sc):
        ts, ti = jax.lax.top_k(sc.reshape(Q * nt, tile), min(k, tile))
        base = (jnp.arange(nt, dtype=jnp.int32) * tile)[None, :, None]
        cand_i = (ti.reshape(Q, nt, -1) + base).reshape(Q, -1)
        cand_s = ts.reshape(Q, -1)
        gs, gsel = jax.lax.top_k(cand_s, k)
        return gs, jnp.take_along_axis(cand_i, gsel, axis=1)

    if keep >= nt:
        return full_sort(s)

    def pruned(sc):
        st = sc.reshape(Q, nt, tile)
        tmax = st.max(axis=2)                              # [Q, nt]
        kmax, kidx = jax.lax.top_k(tmax, keep + 1)
        tiles = jnp.take_along_axis(st, kidx[:, :keep, None], axis=1)
        ts, ti = jax.lax.top_k(tiles.reshape(Q * keep, tile), min(k, tile))
        base = kidx[:, :keep, None] * tile
        cand_i = (ti.reshape(Q, keep, -1) + base).reshape(Q, -1)
        cand_s = ts.reshape(Q, -1)
        gs, gsel = jax.lax.top_k(cand_s, k)
        gi = jnp.take_along_axis(cand_i, gsel, axis=1)
        complete = jnp.all(kmax[:, keep] < gs[:, k - 1])
        return complete, gs, gi

    complete, gs, gi = pruned(s)
    return jax.lax.cond(complete,
                        lambda sc: (gs, gi),
                        full_sort, s)


@functools.partial(jax.jit, static_argnames=("k", "approx"))
def _topk_block(queries, docs, k, approx: bool = False):
    """queries [Q, d] x docs [N, d] -> (scores [Q, k], idx [Q, k]).

    XLA's top_k lowers to a bitonic sort whose cost scales with the full
    [Q, N] score volume x log^2(N) — the dominant cost at N ~ 1M. Exact
    path: :func:`_pruned_tile_topk` (tile-max pruning + verified
    fallback). ``approx``: jax.lax.approx_max_k (TPU PartialReduce,
    recall ~0.95) for serving paths that tolerate it."""
    scores = jnp.einsum("qd,nd->qn", queries, docs,
                        preferred_element_type=jnp.float32)
    Q, N = scores.shape
    if approx:
        return jax.lax.approx_max_k(scores, k)
    if N % _TILE != 0 or N <= 2 * _TILE:
        return jax.lax.top_k(scores, k)
    return _pruned_tile_topk(scores, k, _TILE)


@functools.partial(jax.jit, static_argnames=("k", "block", "nblocks",
                                             "approx"))
def _topk_scan_device(queries, docs, k, block, nblocks, approx=False,
                      scale=None):
    """Streaming top-k over a DEVICE-RESIDENT corpus, all inside one jit:
    lax.scan over ``nblocks`` dynamic_slice blocks with a running-top-k
    carry. This is the large-corpus serving path — the host-merge loop in
    :func:`dense_topk` would slice a materialized block copy per step
    *outside* jit (at 8.8M x 768 bf16 that is corpus 13.5 GB + 1.6 GB block
    + 1 GB f32 scores > v5e HBM) and fence through the host every block.
    Here the block transient is bounded by ``block`` and the only host
    transfer is the final [Q, k]. The tail block clamps its start to
    ``n - block`` (one compiled shape) and masks the re-scored overlap rows
    to -inf so every doc is counted exactly once — exact, like the
    two-level tiled top-k it feeds."""
    n, d = docs.shape
    neg = jnp.float32(-jnp.inf)

    def body(carry, b):
        best_s, best_i = carry
        start = jnp.minimum(b * block, n - block)
        blk = jax.lax.dynamic_slice(docs, (start, 0), (block, d))
        if scale is not None:
            # int8 corpus rows: dequantize the block transient only (the
            # stored corpus stays 1 byte/dim — 2x the doc capacity of
            # bf16 per chip); fold the per-row scale into the scores
            blk = blk.astype(queries.dtype)
        s = jnp.einsum("qd,nd->qn", queries, blk,
                       preferred_element_type=jnp.float32)
        if scale is not None:
            sblk = jax.lax.dynamic_slice(scale, (start,), (block,))
            s = s * sblk[None, :].astype(jnp.float32)
        gidx = start + jnp.arange(block, dtype=jnp.int32)
        s = jnp.where(gidx[None, :] >= b * block, s, neg)
        if approx:
            # TPU PartialReduce (recall ~0.95): one pass over the score
            # volume instead of a bitonic sort — the sort is what binds the
            # unpruned exact path (~10 GB/s effective corpus scan)
            bs, bi = jax.lax.approx_max_k(s, min(k, block))
        elif block % _TILE == 0 and block > 2 * _TILE:
            bs, bi = _pruned_tile_topk(s, min(k, block), _TILE)
        else:
            bs, bi = jax.lax.top_k(s, min(k, block))
        all_s = jnp.concatenate([best_s, bs], axis=1)
        all_i = jnp.concatenate([best_i, bi + start], axis=1)
        gs, gsel = jax.lax.top_k(all_s, k)
        gi = jnp.take_along_axis(all_i, gsel, axis=1)
        return (gs, gi), None

    q = queries.shape[0]
    init = (jnp.full((q, k), neg, jnp.float32),
            jnp.zeros((q, k), jnp.int32))
    (gs, gi), _ = jax.lax.scan(body, init, jnp.arange(nblocks, dtype=jnp.int32))
    return gs, gi


class Int8Corpus(NamedTuple):
    """Device corpus quantized to one byte/dim with a per-row scale —
    HALF the HBM of bf16, so ~17.6M x 768 docs fit one v5e chip (2x the
    reference's full 8.8M corpus, which itself needs an 8-GPU faiss shard
    at fp32 — tasks/evaluator.py:372-400)."""
    codes: jax.Array     # [N, d] int8 (row / scale, rounded)
    scale: jax.Array     # [N] f32  (row abs-max / 127)


def device_corpus(docs: np.ndarray, dtype=jnp.bfloat16,
                  chunk: int = 1_000_000):
    """Upload a corpus once for serving, optionally down-cast: bf16 makes
    the reference's 8.8M x 768 fp32 store (27 GB, tasks/evaluator.py:45,
    408) fit one chip's 16 GB HBM at 13.5 GB; ``dtype=jnp.int8`` stores
    per-row-scaled int8 rows (:class:`Int8Corpus`, 6.8 GB) for 2x the doc
    capacity. Scores always accumulate in f32 on the MXU
    (preferred_element_type); quantization only perturbs near-exact ties
    (int8: ~0.4% element error — validated top-k overlap in
    tests/test_eval.py). Host-side quantization streams in ``chunk`` rows
    to bound peak memory."""
    if dtype == jnp.int8:
        x = np.asarray(docs)
        n = x.shape[0]
        codes = np.empty(x.shape, np.int8)
        scale = np.empty((n,), np.float32)
        for s in range(0, n, chunk):
            blk = np.asarray(x[s:s + chunk], np.float32)
            sc = np.maximum(np.abs(blk).max(axis=1) / 127.0, 1e-12)
            codes[s:s + chunk] = np.rint(blk / sc[:, None]).astype(np.int8)
            scale[s:s + chunk] = sc
        return Int8Corpus(jnp.asarray(codes), jnp.asarray(scale))
    return jnp.asarray(np.asarray(docs), dtype)


def dense_topk(queries: np.ndarray, docs: np.ndarray, k: int,
               mesh: Optional[Mesh] = None,
               block_docs: int = 1_000_000,
               approx: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Brute-force IP top-k. Single-device path streams doc blocks and
    merges on host; mesh path shards docs over 'data' inside one jit.
    Pass ``docs`` as a :func:`device_corpus` bf16 array for the
    single-chip large-corpus serving case."""
    scale = None
    if isinstance(docs, Int8Corpus):
        docs, scale = docs.codes, docs.scale
        if mesh is not None:
            raise NotImplementedError(
                "Int8Corpus is the single-chip capacity path; use a bf16 "
                "device_corpus with the mesh (it already shards)")
    n = docs.shape[0]
    k = min(k, n)
    on_device = isinstance(docs, jax.Array)
    qdtype = (jnp.bfloat16 if scale is not None
              else docs.dtype if on_device else jnp.float32)
    queries = jnp.asarray(queries, qdtype)

    if mesh is not None and n % mesh.shape[DATA_AXIS] == 0:
        return _dense_topk_mesh(queries, docs, k, mesh)

    if on_device:
        # serving path: scan the corpus in place — the host-merge loop
        # below would materialize a full block copy per step outside jit.
        # Pick the block as a _TILE multiple so the pruned exact top-k
        # applies to ANY corpus size (the clamped-overlap tail masks the
        # re-scored rows, so block need not divide n).
        block = min(block_docs, n)
        if n >= 2 * _TILE and not approx:
            nblocks = -(-n // block)
            block = -(-n // (nblocks * _TILE)) * _TILE
            while block > n:
                nblocks += 1
                block = -(-n // (nblocks * _TILE)) * _TILE
        nblocks = -(-n // block)
        gs, gi = _topk_scan_device(queries, docs, k, block, nblocks,
                                   approx=approx, scale=scale)
        return np.asarray(gs), np.asarray(gi).astype(np.int64)

    best_s = np.full((queries.shape[0], k), -np.inf, np.float32)
    best_i = np.zeros((queries.shape[0], k), np.int64)
    for s in range(0, n, block_docs):
        blk = jnp.asarray(np.asarray(docs[s:s + block_docs], np.float32))
        kk = min(k, blk.shape[0])
        bs, bi = _topk_block(queries, blk, kk)
        bs, bi = np.asarray(bs), np.asarray(bi) + s
        all_s = np.concatenate([best_s, bs], axis=1)
        all_i = np.concatenate([best_i, bi], axis=1)
        sel = np.argsort(-all_s, axis=1, kind="stable")[:, :k]
        best_s = np.take_along_axis(all_s, sel, axis=1)
        best_i = np.take_along_axis(all_i, sel, axis=1)
    return best_s, best_i


def _dense_topk_mesh(queries, docs, k, mesh: Mesh):
    """docs sharded over 'data'; local einsum+top_k per shard, then global
    merge — XLA turns the final top_k over gathered candidates into an
    all-gather over ICI of only [Q, shards*k] candidates, never [Q, N]."""
    n = docs.shape[0]
    dt = docs.dtype if isinstance(docs, jax.Array) else jnp.float32
    docs = jax.device_put(jnp.asarray(docs, dt),
                          NamedSharding(mesh, P(DATA_AXIS, None)))
    queries = jax.device_put(queries, NamedSharding(mesh, P()))
    nshards = mesh.shape[DATA_AXIS]
    shard_size = n // nshards

    @jax.jit
    def run(q, d):
        def local(qq, dd):
            s = jnp.einsum("qd,nd->qn", qq, dd,
                           preferred_element_type=jnp.float32)
            if s.shape[1] % _TILE == 0 and s.shape[1] > 2 * _TILE:
                ls, li = _pruned_tile_topk(s, min(k, s.shape[1]), _TILE)
            else:
                ls, li = jax.lax.top_k(s, min(k, s.shape[1]))
            shard = jax.lax.axis_index(DATA_AXIS)
            return ls, li + shard * shard_size

        from jax import shard_map
        ls, li = shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, None)),
            out_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS)))(q, d)
        # ls/li: [Q, nshards*k] candidates; final merge
        gs, gsel = jax.lax.top_k(ls, k)
        gi = jnp.take_along_axis(li, gsel, axis=1)
        return gs, gi

    gs, gi = run(queries, docs)
    return np.asarray(gs), np.asarray(gi).astype(np.int64)


def encode_corpus(model: RiporModel, params, batches: Iterable[Dict],
                  dtype=jnp.bfloat16) -> np.ndarray:
    """Encode a corpus of tokenized batches into dense reps [N, d]
    (reference DenseIndexing.store_embs, tasks/evaluator.py:494-555; here
    one jitted dense_rep over fixed-shape batches, no per-rank npy shards)."""
    @jax.jit
    def rep(ids, mask):
        return model.apply({"params": params}, ids, mask,
                           method=RiporModel.dense_rep)

    out = []
    for b in batches:
        r = rep(jnp.asarray(b["input_ids"]), jnp.asarray(b["attention_mask"]))
        n = b.get("n_valid", r.shape[0])
        out.append(np.asarray(r, np.float32)[:n])
    return np.concatenate(out, axis=0)


def aq_flat_search(query_embs: np.ndarray, codebooks, codes: np.ndarray,
                   k: int, mesh: Optional[Mesh] = None):
    """Sanity-check retrieval over AQ *reconstructions*: doc rep = sum of
    codebook embeddings (reference aq_to_flat_index_search_evaluate,
    evaluate.py:334-394 / T5AQEncoder summed decode :899-900). Verifies the
    quantized DocIDs retrieve ~ as well as the RQ index itself."""
    from ripor_tpu.quantize.rq import rq_decode
    recon = rq_decode(codebooks, codes)
    return dense_topk(query_embs, recon, k, mesh=mesh)


def retrieve_to_run(query_ids: list, docids: list, scores: np.ndarray,
                    indices: np.ndarray) -> Dict[str, Dict[str, float]]:
    """Assemble a trec run dict {qid: {docid: score}} (reference
    DenseRetriever.retrieve writes run.json, tasks/evaluator.py:707-731)."""
    run = {}
    for qi, qid in enumerate(query_ids):
        run[str(qid)] = {str(docids[int(d)]): float(s)
                         for s, d in zip(scores[qi], indices[qi])}
    return run
