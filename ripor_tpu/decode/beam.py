"""Trie-constrained beam search — the serve/query hot loop, in pure XLA.

Re-architects the reference's decode loop (tasks/generation.py:423-530),
which per step does: host round-trip to stringify beam prefixes + scipy-CSR
row lookup (:666-677), Python BeamSearchScorer bookkeeping (:496-503), and
tuple-of-tuples KV reorder (:511-518). Here the entire M-step decode is ONE
``lax.scan``:

  decoder step (cached)  ->  trie mask (two gathers)  ->  scores + top_k
  ->  gather-based beam/cache reorder

with zero host synchronization. Score semantics match the reference: raw
cumulative inner-product logits, no EOS (sequences always run all M steps;
reference pins pad/eos to None at generation.py:381-382), optional
log-softmax (generation.py:453-458), and the returned score equals the sum
over steps (the reference multiplies HF's length-normalized score back by
max_new_token at evaluate.py:128 — same quantity).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.models.config import RiporConfig
from ripor_tpu.models.ripor import RiporModel

NEG_INF = -1e30

# Toy-sized KV caches (total ping-pong buffer below this) hit an XLA-TPU
# buffer-placement bug on hardware — layout assignment stack-allocates the
# reorder kernel's aliased output in scoped VMEM and an ~18 MB buffer fails
# the 16 MB limit at COMPILE time. Such shapes compile with a raised limit;
# production-sized caches are never VMEM-placed and keep byte-identical
# compiles (no options). See make_beam_search_fn's dispatch.
_TOY_CACHE_BYTES = 32 * 1024 * 1024
_TOY_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "40960"}


@dataclasses.dataclass
class BeamSearchOutput:
    """scores/codes/groups sorted best-first along the beam axis.

    groups[b, n] is the smtid-group index (row of trie.unique_codes) the
    beam landed on, or -1 for dead beams (score == NEG_INF).
    """

    scores: np.ndarray   # [B, N] float32
    codes: np.ndarray    # [B, N, M] int32
    groups: np.ndarray   # [B, N] int32


def _trie_allowed(tables, state, t, K: int):
    """Allowed-token mask for each beam. state: [B, N] int32.

    internal (>= 0): gather the node's PACKED bitmask row (uint32
    [B, N, K/32], 32x less gather bandwidth than a dense child row) and
    unpack bits in-register;
    singleton chain (<= -2): one-hot of the group's code at step t;
    dead (== -1): nothing allowed.
    Returns allowed [B, N, K] bool.
    """
    B, N = state.shape
    row = tables.bits[jnp.maximum(state, 0)]                  # [B, N, W] u32
    shifts = jnp.arange(32, dtype=jnp.uint32)
    unpacked = (row[..., None] >> shifts) & jnp.uint32(1)     # [B, N, W, 32]
    internal_allowed = unpacked.reshape(B, N, -1)[:, :, :K].astype(jnp.bool_)
    group = jnp.clip(-2 - state, 0, tables.unique_codes.shape[0] - 1)
    # unique_codes may be uint8/uint16 (succinct_tables narrows by K)
    chain_tok = tables.unique_codes[group, t].astype(jnp.int32)  # [B, N]
    chain_allowed = jax.nn.one_hot(chain_tok, K, dtype=jnp.bool_)
    is_internal = (state >= 0)[:, :, None]
    is_chain = (state <= -2)[:, :, None]
    return jnp.where(is_internal, internal_allowed,
                     jnp.where(is_chain, chain_allowed, False))


def _trie_child(tables, state, tok):
    """Child entry for the winning (beam, token) pairs via rank addressing:
    edge index = node_base[state] + popcount(bits[state] & mask_below(tok)).
    state: [B, N] (>= 0 internal nodes only — caller guards); tok: [B, N].
    Returns int32 [B, N] child values (>= 0 internal | <= -2 chain)."""
    node = jnp.maximum(state, 0)
    row = tables.bits[node]                                   # [B, N, W] u32
    W = row.shape[-1]
    w = (tok // 32)[..., None]                                # [B, N, 1]
    r = (tok % 32).astype(jnp.uint32)[..., None]
    widx = jnp.arange(W)[None, None, :]
    full = jnp.uint32(0xFFFFFFFF)
    partial = (jnp.uint32(1) << r) - jnp.uint32(1)
    wmask = jnp.where(widx < w, full, jnp.where(widx == w, partial,
                                                jnp.uint32(0)))
    rank = jax.lax.population_count(row & wmask).sum(-1).astype(jnp.int32)
    e = tables.node_base[node] + rank
    return tables.edge_child[e]


def _exact_topk_two_stage(cand, Np: int, K: int, C: int = 8):
    """EXACT top-Np over cand [B, Np, K] flattened, with a cheap fast path.

    The full ``lax.top_k`` over Np*K (~256k) elements costs ~7.5 ms at
    batch 8 on v5e (17% of a decode step). Stage 1 takes each beam's
    top-C (tiny per-row sorts); stage 2 merges the [Np*C] survivors.
    The result equals the full top-k UNLESS some beam's C-th best still
    beats the merged Np-th score — then candidates beyond that beam's
    top-C could belong in the answer, and a ``lax.cond`` falls back to
    the full sort. Early decode steps (one live beam holding up to K
    winners) take the fallback automatically; spread-out later steps
    take the fast path. Exactness is verified, not assumed.

    Tie caveat: among exactly-equal scores the selection may differ from
    the single-sort order (relevant only to NEG_INF dead-beam filler,
    which the beam loop kills regardless).
    """
    B = cand.shape[0]
    C = min(C, K)
    if Np * C >= Np * K // 2:      # tiny vocab: two stages can't win
        return jax.lax.top_k(cand.reshape(B, Np * K), Np)
    vb, ib = jax.lax.top_k(cand, C)                    # [B, Np, C]
    v2, i2 = jax.lax.top_k(vb.reshape(B, Np * C), Np)  # [B, Np]
    src2 = i2 // C
    tok2 = jnp.take_along_axis(ib.reshape(B, Np * C), i2, axis=1)
    thresh = v2[:, Np - 1]                             # [B]
    need_full = jnp.any(vb[:, :, C - 1] > thresh[:, None])

    def full(_):
        v, i = jax.lax.top_k(cand.reshape(B, Np * K), Np)
        return v, i

    def fast(_):
        return v2, src2 * K + tok2

    return jax.lax.cond(need_full, full, fast, None)


def _reorder_cache(cache, src_beam, use_pallas: bool = True,
                   kv_new=None, t=None, dest=None):
    """Gather the stacked KV cache [L, 2, B, N, Mc, H*D] along the beam
    axis by src_beam [B, N].

    This is the decode loop's bandwidth hot spot (~GBs/step at beam 1000).
    The pallas path fuses the position-t k/v insert into the reorder
    (ops/beam_gather.py::beam_gather_update) so the cache has exactly ONE
    writer per step and XLA never materializes protective copies of it;
    kv_new [L, 2, B, N, H*D] comes from the pallas decode step. On the XLA
    path (CPU tests / fallback) kv_new is None — the decode step already
    wrote slot t — and the reorder is a plain take_along_axis."""
    L, two, B, N, Mc, HD = cache.shape
    if use_pallas:
        from ripor_tpu.ops.beam_gather import (beam_gather_rows,
                                               beam_gather_update)
        assert kv_new is not None
        flat = cache.reshape(L * two * B, N, Mc, HD)
        src_rep = jnp.tile(src_beam.reshape(B, N), (L * two, 1))
        kvg = beam_gather_rows(kv_new.reshape(L * two * B, N, HD), src_rep)
        dest_flat = None if dest is None else dest.reshape(flat.shape)
        return beam_gather_update(flat, kvg, src_rep, t,
                                  dest_flat).reshape(cache.shape)
    idx = src_beam[None, None, :, :, None, None]
    return jnp.take_along_axis(cache, idx, axis=3)


def make_beam_search_fn(cfg: RiporConfig, num_beams: int,
                        constrained: bool = True,
                        max_steps: Optional[int] = None,
                        dtype=jnp.bfloat16,
                        use_pallas_gather: Optional[bool] = None,
                        cache_segments: int = 4,
                        deferred: Optional[bool] = None,
                        kv_cache_int8: bool = False,
                        kv_cache_quant: Optional[str] = None,
                        kvg_quant_xla: Optional[bool] = None,
                        megarow: Optional[bool] = None,
                        ffn_int8: Optional[bool] = None):
    """Build a jitted beam-search function.

    Returns fn(params, input_ids, attention_mask, tables)
    -> (scores [B,N], codes [B,N,M], states [B,N]); ``tables`` is a
    TrieTables pytree (trie.succinct.succinct_tables(trie)).
    For unconstrained search (trainer dev-eval; reference
    tasks/trainer.py:870-977) pass constrained=False and dummy_tables(M).

    ``cache_segments``: the KV cache only needs t+1 slots at step t, and the
    per-step beam reorder is bandwidth-bound on cache bytes — so the decode
    runs as ``cache_segments`` scans with a growing cache buffer
    (sizes M/S, 2M/S, ..., M), cutting reorder+attention traffic ~40%
    at S=4. Set 1 to disable.

    ``deferred``: fuse the beam reorder into the attention kernel with a
    one-step delay (ops/attend_reorder.py) — two full-cache passes per step
    at parallel-DMA bandwidth instead of three. Default: on whenever the
    pallas path is on and every segment span is even.

    ``kv_cache_int8``: store the (deferred) KV cache as int8 rows with
    per-head power-of-2 scales — halves the decode loop's dominant cache
    bandwidth for ~0.5% score error (each slot is quantized exactly once
    at insert; scales are exact powers of two). Requires ``deferred``.

    ``kv_cache_quant``: "int8" (same as kv_cache_int8=True) or "int4" —
    packed (k, v) nibbles per byte, QUARTER the bf16 cache bytes (~7%
    element error; validate retrieval-transparency on your model with the
    tools/validate_int8_e2e.py pattern before trusting rankings at scale).

    ``kvg_quant_xla``: quantize the pending kv rows ONCE per step in XLA
    (ops/attend_reorder.quantize_rows_xla) BEFORE the beam-order gather,
    so the gather moves int8 bytes (half) and the kernel inserts the row
    verbatim instead of quantizing in every layer call. MEASURED 8% SLOWER
    than in-kernel quantize on v5e (5.90 vs 6.39 qps, b8/beam1000/t5-base):
    the standalone XLA quantize costs a ~455 MB/step read+write of kv_new
    that the kernel gets for free (rows already in VMEM), and the ~150
    MB/step gather saving doesn't cover it. Default OFF; kept as an option
    (RIPOR_KVG_XLA=1) for geometries where the gather dominates.

    ``megarow``: deferred variant over a beam-major [B, N, L, Mc, RW] cache
    (ops/megarow.py): ONE all-layers reorder kernel per step (per-beam
    descriptors ~L× larger, so the gather is bandwidth- instead of
    descriptor-issue-bound) + sequential-read attention per layer. One more
    cache pass per step than ``deferred``, every pass at parallel-DMA
    bandwidth. Default: ON whenever the pallas path is available and the
    segment spans are even (the measured-best TPU path); RIPOR_MEGAROW=0/1
    env overrides. Implies deferred.

    ``ffn_int8``: run the decode-step FFN with per-channel int8 weights and
    per-row dynamic int8 activations (ops/int8_ffn.py) — int8 MXU dots run
    2x bf16 on v5e, cutting the FFN block ~23% (tools/bench_int8_mm.py).
    Weights are quantized once per call, outside the decode scan. Affects
    model OUTPUT numerics (unlike the KV-cache quant, which only perturbs
    attention reads) — gate with the tools/validate_int8_e2e.py pattern
    before trusting rankings. Default: env RIPOR_FFN_INT8 (off). Only the
    deferred/megarow paths (non-gated FFN); composes with TP (per-shard
    quantize + row-parallel psum).
    """
    M = max_steps or cfg.M
    N = num_beams
    K = cfg.K
    # quant mode: kv_cache_quant ("int8"/"int4") generalizes the original
    # kv_cache_int8 flag; "int4" packs (k, v) nibbles per byte (quarter the
    # cache bytes of bf16 — see ops/attend_reorder._quantize_rows_int4)
    if kv_cache_quant not in (None, "int8", "int4"):
        raise ValueError(f"kv_cache_quant must be int8/int4/None, "
                         f"got {kv_cache_quant!r}")
    quant = kv_cache_quant or ("int8" if kv_cache_int8 else None)
    kv_cache_int8 = quant == "int8"
    if use_pallas_gather is None:
        use_pallas_gather = jax.default_backend() == "tpu"
    model = RiporModel(
        cfg, dtype=dtype,
        step_attn_impl="pallas" if use_pallas_gather else "xla")
    seg = max(1, min(cache_segments, M))
    # segment boundaries: equal step spans; the cache BUFFER for a segment
    # rounds its slot count up to a multiple of 8 (sublane tiling of the
    # [Mc, H*D] KV block — Mosaic requires 8-aligned block slices). Extra
    # slots are masked by the key-position bias, so they only cost memory.
    bounds = sorted(set(round(M * (s + 1) / seg) for s in range(seg)))
    bounds[-1] = M
    bufs = [-8 * (-b // 8) for b in bounds]   # ceil8; may exceed M
    seg = len(bounds)
    spans_even = all((hi - lo) % 2 == 0
                     for lo, hi in zip([0] + bounds[:-1], bounds))
    if megarow is None:
        import os
        env = os.environ.get("RIPOR_MEGAROW")
        if env is not None:
            megarow = env == "1"
        else:
            # measured-best decode path on TPU (8.03 vs 7.3 qps for the
            # per-layer deferred kernel at b12/beam1000/int4) — default on
            # whenever the pallas path is available and spans permit
            megarow = (use_pallas_gather and spans_even
                       and deferred is not False)
    if megarow:
        if deferred is False:
            raise ValueError("megarow=True implies the deferred path — "
                             "drop deferred=False")
        deferred = True
    if deferred is None:
        # quantized caches live only in the deferred path, which also has
        # an interpret mode — so a quant request turns deferred on
        # regardless of backend (the non-TPU fallback works, just slower)
        deferred = (use_pallas_gather or quant is not None) and spans_even
    if deferred and not spans_even:
        raise ValueError(
            f"deferred reorder needs even segment spans; M={M} with "
            f"cache_segments={cache_segments} gives bounds {bounds} — "
            "pick cache_segments so every span is even")
    if quant and not deferred:
        if spans_even:
            raise ValueError(
                f"kv_cache_quant={quant} requires the deferred decode path "
                "but deferred=False was passed explicitly — drop "
                "deferred=False (or the quant request)")
        raise ValueError(
            f"kv_cache_quant={quant} requires the deferred decode path, but "
            f"the segment spans for M={M}, cache_segments={cache_segments} "
            f"(bounds {bounds}) are not all even — adjust cache_segments")
    if kvg_quant_xla is None:
        import os
        if megarow:
            # megarow: quantize-then-gather is bit-identical to the
            # in-kernel insert (quantization commutes with the row gather
            # and megarow reads slot t-1 from the cache either way) and
            # moves 2-4x fewer kvg bytes
            kvg_quant_xla = (quant is not None and os.environ.get(
                "RIPOR_MR_KVG_XLA", "0") == "1")
        else:
            kvg_quant_xla = (kv_cache_int8
                             and os.environ.get("RIPOR_KVG_XLA", "0") == "1")
    if kvg_quant_xla and not (kv_cache_int8 or (megarow and quant)):
        raise ValueError("kvg_quant_xla needs a quantized cache "
                         "(kv_cache_quant='int8'/'int4')")
    if ffn_int8 is None:
        import os
        ffn_int8 = os.environ.get("RIPOR_FFN_INT8", "0") == "1"
    if ffn_int8:
        if not deferred:
            raise ValueError("ffn_int8 requires the deferred/megarow decode "
                             "path (the only paths that thread ffn_q)")
        if cfg.t5.is_gated:
            raise ValueError("ffn_int8 supports only the non-gated T5 v1.0 "
                             "FFN")
        # under TP (cfg.t5.tp_axis set inside make_tp_beam_search_fn's
        # shard_map) quantize_ffn sees the LOCAL wi/wo shards and
        # ffn_int8_apply psums the row-parallel wo partials (int8_ffn.py)
    if megarow:
        from ripor_tpu.ops.megarow import FUSED_KVG as _mr_fused_kvg
        from ripor_tpu.ops.megarow import QFUSE as _mr_qfuse
        _mr_qfuse = _mr_qfuse and quant is not None
        if _mr_qfuse:
            # QFUSE: kernel B emits cache-layout quantized kv rows, so the
            # carried kvg is int8 exactly like kvg_quant_xla's — reuse that
            # mode's init/insert plumbing (kvg_pre) minus its standalone
            # quantize pass
            kvg_quant_xla = True
    else:
        _mr_fused_kvg = False
        _mr_qfuse = False
    # The deferred kernel moves whole beam-row chunks; pad the beam axis
    # ONCE to a CHUNK multiple and kill ranks >= N every step (exact
    # width-N semantics) — the kernel's per-call pad fallback would copy
    # both full cache buffers every layer call otherwise.
    Np = N
    ar_chunk = None
    if deferred:
        from ripor_tpu.ops.attend_reorder import SCALE_COLS, pick_chunk
        rw = {None: 2 * cfg.t5.inner_dim,
              "int8": 2 * cfg.t5.inner_dim + SCALE_COLS,
              "int4": cfg.t5.inner_dim + SCALE_COLS}[quant]
        isz = 1 if quant else jnp.dtype(dtype).itemsize
        # chunk from the LARGEST segment's slot count so every kernel call
        # in the decode shares it (and the one-time beam pad matches)
        ar_chunk = pick_chunk(bufs[-1], rw, isz)
        Np = -ar_chunk * (-N // ar_chunk)
        if megarow:
            # fail fast if the all-layers row chunk cannot fit VMEM (the
            # reorder kernel splits layers into groups; raises if even a
            # single-layer group overflows) and keep Np a multiple of the
            # reorder chunk too (8 | pick_chunk's multiples of 8)
            from ripor_tpu.ops.megarow import pick_layer_group
            _fk_bytes = 0
            if _mr_fused_kvg:
                _fk_bytes = (rw if kvg_quant_xla
                             else 2 * cfg.t5.inner_dim
                             * jnp.dtype(dtype).itemsize)
            pick_layer_group(cfg.t5.num_decoder_layers, bufs[-1], rw, isz,
                             f2=0 if kvg_quant_xla else 2 * cfg.t5.inner_dim,
                             fused_kv_bytes=_fk_bytes)

    def run(params, input_ids, attention_mask, tables):
        B = input_ids.shape[0]
        enc = model.apply({"params": params}, input_ids, attention_mask,
                          method=RiporModel.encode)
        cross_kv = model.apply({"params": params}, enc,
                               method=lambda m, e: m.decoder.precompute_cross_kv(e))
        self_bias = model.apply(
            {"params": params}, bufs[-1],
            method=lambda m, n: m.decoder.full_self_bias(n))
        enc_bias = jnp.where(attention_mask > 0, 0.0, NEG_INF).astype(jnp.float32)
        if ffn_int8:
            # once per call, OUTSIDE the decode scan (the step closures
            # capture the int8 tensors, so the quantize is hoisted)
            from ripor_tpu.ops.int8_ffn import quantize_ffn
            ffn_q = quantize_ffn(params, cfg.t5.num_decoder_layers)
        else:
            ffn_q = None

        beam_scores = jnp.full((B, Np), NEG_INF, jnp.float32).at[:, 0].set(0.0)
        state = jnp.zeros((B, Np), jnp.int32)         # all at trie root
        tokens = jnp.zeros((B, Np), jnp.int32)
        codes = jnp.zeros((B, Np, M), jnp.int32)
        cache = model.apply({"params": params}, B, Np, bufs[0],
                            method=lambda m, b, n, l: m.decoder.init_cache(b, n, l))

        def select(beam_scores, state, codes, logits, t):
            """Trie mask + scored top-k + beam bookkeeping for one step."""
            if constrained:
                allowed = _trie_allowed(tables, state, t, K)
                masked = jnp.where(allowed, logits, NEG_INF)
            else:
                masked = logits
            cand = beam_scores[:, :, None] + masked            # [B, N, K]
            # keep dead beams dead (NEG_INF + logit could exceed NEG_INF)
            cand = jnp.where(beam_scores[:, :, None] <= NEG_INF / 2,
                             NEG_INF, cand)
            new_scores, idx = _exact_topk_two_stage(cand, Np, K)
            if Np != N:   # padded beam ranks die every step (exact width-N)
                kill = jnp.arange(Np)[None, :] >= N
                new_scores = jnp.where(kill, NEG_INF, new_scores)
            src = idx // K                                     # [B, Np]
            tok = (idx % K).astype(jnp.int32)
            if constrained:
                src_state = jnp.take_along_axis(state, src, axis=1)
                child = _trie_child(tables, src_state, tok)   # [B, N]
                new_state = jnp.where(src_state >= 0, child, src_state)
                new_state = jnp.where(new_scores <= NEG_INF / 2, -1, new_state)
            else:
                new_state = state
            codes = jnp.take_along_axis(codes, src[:, :, None], axis=1)
            codes = jnp.where((jnp.arange(M) == t)[None, None, :],
                              tok[:, :, None], codes)
            return new_scores, new_state, tok, codes, src

        def one_step(beam_scores, state, tokens, codes, cache, dest, t,
                     do_reorder=True):
            logits, new_cache, kv_new = model.apply(
                {"params": params}, tokens, cache, cross_kv, enc_bias,
                self_bias, t, method=RiporModel.decode_step)   # [B, N, K] f32
            new_scores, new_state, tok, codes, src = select(
                beam_scores, state, codes, logits, t)
            if do_reorder:
                new_cache = _reorder_cache(new_cache, src, use_pallas_gather,
                                           kv_new=kv_new, t=t, dest=dest)
            return new_scores, new_state, tok, codes, new_cache

        def one_step_deferred(beam_scores, state, tokens, codes, ca, cb,
                              src_prev, kvg, t, write_back=True):
            """Step with the reorder deferred into the attention kernel:
            reads ``ca`` through ``src_prev``, writes the reordered rows
            (slot t-1 completed from ``kvg``) into ``cb``. Returns the new
            pending (src, kvg [B, N, L*2F]) for the NEXT step — kvg rows
            are layer-major so the permute is ONE gather DMA per beam
            (36 KB at t5-base) instead of L small ones."""
            from ripor_tpu.ops.beam_gather import beam_gather_rows
            logits, new_cache, kv_new = model.apply(
                {"params": params}, tokens, ca, cb, src_prev, kvg,
                cross_kv, enc_bias, self_bias, t, write_back, ar_chunk,
                ffn_q, method=RiporModel.decode_step_deferred)
            new_scores, new_state, tok, codes, src = select(
                beam_scores, state, codes, logits, t)
            if write_back:
                if kvg_quant_xla:
                    # quantize BEFORE the gather: int8 rows halve the
                    # gather bytes and the kernel inserts them verbatim
                    from ripor_tpu.ops.attend_reorder import quantize_rows_xla
                    b_, n_ = kv_new.shape[:2]
                    kvq = quantize_rows_xla(
                        kv_new.reshape(b_, n_, cfg.t5.num_decoder_layers, -1),
                        cfg.t5.num_heads).reshape(b_, n_, -1)
                    kvg = beam_gather_rows(kvq, src)
                else:
                    kvg = beam_gather_rows(kv_new, src)
            return new_scores, new_state, tok, codes, new_cache, src, kvg

        def one_step_megarow(beam_scores, state, tokens, codes, ca, cb,
                             src_prev, kvg, t, write_back=True):
            """Megarow variant: one all-layers reorder kernel + per-layer
            sequential attention (RiporModel.decode_step_megarow). The
            reorder always writes (it feeds the same step's attention);
            write_back=False only skips the final step's dead kvg gather."""
            from ripor_tpu.ops.beam_gather import beam_gather_rows
            logits, new_cache, kv_new = model.apply(
                {"params": params}, tokens, ca, cb, src_prev, kvg,
                cross_kv, enc_bias, self_bias, t, ar_chunk, ffn_q,
                quant if _mr_qfuse else None,
                method=RiporModel.decode_step_megarow)
            new_scores, new_state, tok, codes, src = select(
                beam_scores, state, codes, logits, t)
            if write_back:
                if _mr_qfuse:
                    # kv_new is already cache-layout int8 (kernel B's QFUSE
                    # output) — gather the 2-4x smaller rows directly
                    kvg = (kv_new if _mr_fused_kvg
                           else beam_gather_rows(kv_new, src))
                elif kvg_quant_xla:
                    # quantize BEFORE the gather (bit-identical inserts —
                    # see make_beam_search_fn docstring) so the kvg gather
                    # moves cache-layout int8/int4 rows
                    from ripor_tpu.ops.attend_reorder import (
                        quantize_rows_xla, quantize_rows_xla_int4)
                    qfn = (quantize_rows_xla_int4 if quant == "int4"
                           else quantize_rows_xla)
                    b_, n_ = kv_new.shape[:2]
                    kvq = qfn(kv_new.reshape(
                        b_, n_, cfg.t5.num_decoder_layers, -1),
                        cfg.t5.num_heads).reshape(b_, n_, -1)
                    kvg = kvq if _mr_fused_kvg else beam_gather_rows(kvq, src)
                elif _mr_fused_kvg:
                    # RIPOR_MR_FUSED_KVG: carry kv_new UN-permuted; the
                    # reorder kernel gathers rows by src itself (saves the
                    # standalone XLA gather's full read+write pass)
                    kvg = kv_new
                else:
                    kvg = beam_gather_rows(kv_new, src)
            return new_scores, new_state, tok, codes, new_cache, src, kvg

        def step(carry, t):
            beam_scores, state, tokens, codes, cache = carry
            out = one_step(beam_scores, state, tokens, codes, cache, None, t)
            return out, None

        def step_pair(carry, ts):
            # ping-pong double buffering: each sub-step's reorder writes
            # into the OTHER buffer (aliased pallas output), so the while
            # carry stays in place — without this, XLA copies the kernel
            # output back into the carry slot every step (full-cache copy).
            beam_scores, state, tokens, codes, ca, cb = carry
            beam_scores, state, tokens, codes, cb = one_step(
                beam_scores, state, tokens, codes, ca, cb, ts[0])
            beam_scores, state, tokens, codes, ca = one_step(
                beam_scores, state, tokens, codes, cb, ca, ts[1])
            return (beam_scores, state, tokens, codes, ca, cb), None

        if deferred:
            # carry the PENDING reorder: src_prev (current beam -> previous
            # row) and kvg (step t-1's K|V permuted to current beam order);
            # the attention kernel completes it while reading (two cache
            # passes/step instead of three, all at parallel-DMA bandwidth).
            # The deferred cache is K|V-MERGED: [L, B, N, Mc, 2F].
            if megarow:
                cache = model.apply({"params": params}, B, Np, bufs[0],
                                    method=lambda m, b_, n_, l_:
                                    m.decoder.init_cache_megarow(
                                        b_, n_, l_, quantized=quant or False))
                n_layers = cache.shape[2]
            else:
                cache = model.apply({"params": params}, B, Np, bufs[0],
                                    method=lambda m, b_, n_, l_:
                                    m.decoder.init_cache_merged(
                                        b_, n_, l_, quantized=quant or False))
                n_layers = cache.shape[0]
            # the pending-kvg rows stay exact bf16 [2F] regardless of the
            # cache's quantization (they're quantized at insert, in-kernel)
            kv_row = 2 * cfg.t5.inner_dim if quant else cache.shape[4]
            src_prev = jnp.broadcast_to(
                jnp.arange(Np, dtype=jnp.int32)[None, :], (B, Np))
            if kvg_quant_xla:
                # pre-quantized kvg rides in cache-row layout (int8 rows
                # incl. scale cols). These t=0 placeholder rows are NEVER
                # read (slots >= t are bias-masked, and slot 0 is rewritten
                # at t=1) — int4 zero bytes would otherwise dequantize to
                # ±8·scale, not zero (same note as ops/megarow.py
                # _reorder_kernel)
                kvg = jnp.zeros((B, Np, n_layers * cache.shape[4]),
                                jnp.int8)
            else:
                kvg = jnp.zeros((B, Np, n_layers * kv_row), dtype)
            cb = jnp.zeros_like(cache)
            stepf = one_step_megarow if megarow else one_step_deferred

            def pair_deferred(carry, ts):
                bs, st, tk, cd, ca_, cb_, sp, kg = carry
                bs, st, tk, cd, cb_, sp, kg = stepf(
                    bs, st, tk, cd, ca_, cb_, sp, kg, ts[0])
                bs, st, tk, cd, ca_, sp, kg = stepf(
                    bs, st, tk, cd, cb_, ca_, sp, kg, ts[1])
                return (bs, st, tk, cd, ca_, cb_, sp, kg), None

            lo = 0
            for s, hi in enumerate(bounds):
                last_seg = s + 1 == seg
                scan_hi = hi - 2 if last_seg else hi
                if scan_hi > lo:
                    carry = (beam_scores, state, tokens, codes, cache, cb,
                             src_prev, kvg)
                    carry, _ = jax.lax.scan(
                        pair_deferred, carry,
                        jnp.arange(lo, scan_hi).reshape(-1, 2))
                    (beam_scores, state, tokens, codes, cache, cb,
                     src_prev, kvg) = carry
                if last_seg:  # final two steps unrolled; last skips writeback
                    (beam_scores, state, tokens, codes, cb, src_prev,
                     kvg) = stepf(beam_scores, state, tokens,
                                  codes, cache, cb, src_prev,
                                  kvg, hi - 2)
                    (beam_scores, state, tokens, codes, _, src_prev,
                     kvg) = stepf(beam_scores, state, tokens,
                                  codes, cb, cache, src_prev,
                                  kvg, hi - 1, write_back=False)
                elif s + 1 < seg:
                    grow = bufs[s + 1] - bufs[s]
                    pad = [(0, 0)] * 3 + [(0, grow), (0, 0)]  # Mc axis of 5-D
                    cache = jnp.pad(cache, pad)
                    cb = jnp.pad(cb, pad)
                lo = hi
            return beam_scores[:, :N], codes[:, :N], state[:, :N]

        lo = 0
        for s, hi in enumerate(bounds):
            span = hi - lo
            # the cache is dead after step M-1: run the tail of the last
            # segment unrolled so the final step can SKIP the full-cache
            # reorder (and, on the pallas path, keep ping-pong aliasing for
            # the second-to-last step without a while-loop carry copy)
            last_seg = s + 1 == seg
            if use_pallas_gather and span % 2 == 0:
                scratch = jnp.zeros_like(cache)
                scan_hi = hi - 2 if last_seg else hi
                if scan_hi > lo:
                    carry = (beam_scores, state, tokens, codes, cache, scratch)
                    carry, _ = jax.lax.scan(
                        step_pair, carry, jnp.arange(lo, scan_hi).reshape(-1, 2))
                    beam_scores, state, tokens, codes, cache, scratch = carry
                if last_seg:
                    beam_scores, state, tokens, codes, scratch = one_step(
                        beam_scores, state, tokens, codes, cache, scratch,
                        hi - 2)
                    beam_scores, state, tokens, codes, _ = one_step(
                        beam_scores, state, tokens, codes, scratch, None,
                        hi - 1, do_reorder=False)
            else:
                scan_hi = hi - 1 if last_seg else hi
                if scan_hi > lo:
                    carry = (beam_scores, state, tokens, codes, cache)
                    carry, _ = jax.lax.scan(step, carry,
                                            jnp.arange(lo, scan_hi))
                    beam_scores, state, tokens, codes, cache = carry
                if last_seg:
                    beam_scores, state, tokens, codes, _ = one_step(
                        beam_scores, state, tokens, codes, cache, None,
                        hi - 1, do_reorder=False)
            if s + 1 < seg:  # grow the cache buffer for the next segment
                grow = bufs[s + 1] - bufs[s]
                cache = jnp.pad(cache, [(0, 0)] * 4 + [(0, grow), (0, 0)])
            lo = hi
        return beam_scores, codes, state

    jit_run = jax.jit(run)
    if not deferred or jax.default_backend() != "tpu":
        return jit_run

    # toy-size scoped-vmem workaround — see _TOY_CACHE_BYTES
    jit_run_toy = jax.jit(run, compiler_options=_TOY_COMPILER_OPTIONS)
    n_layers = cfg.t5.num_decoder_layers
    rw_bytes = rw * isz

    def dispatch(params, input_ids, attention_mask, tables):
        B = input_ids.shape[0]
        cache_bytes = B * Np * n_layers * bufs[-1] * rw_bytes
        fn = jit_run_toy if cache_bytes < _TOY_CACHE_BYTES else jit_run
        return fn(params, input_ids, attention_mask, tables)

    # per-query cache-buffer footprint, exported so the SHARDED wrapper
    # (whose own outer jit is the one XLA compiles — inner compiler options
    # do not survive inlining) can apply the same toy-size dispatch
    dispatch._cache_bytes_per_query = Np * n_layers * bufs[-1] * rw_bytes
    return dispatch


def make_sharded_beam_search_fn(cfg: RiporConfig, num_beams: int, mesh,
                                constrained: bool = True,
                                max_steps: Optional[int] = None,
                                dtype=jnp.bfloat16,
                                use_pallas_gather: Optional[bool] = None,
                                cache_segments: int = 4,
                                deferred: Optional[bool] = None,
                                kv_cache_int8: bool = False,
                                kv_cache_quant: Optional[str] = None,
                                megarow: Optional[bool] = None,
                                kvg_quant_xla: Optional[bool] = None,
                                ffn_int8: Optional[bool] = None):
    """Data-parallel constrained beam search: queries shard over the mesh's
    'data' axis, params + trie tables replicate, each device runs the full
    decode on its query shard (replaces the reference's one-query-per-GPU
    DDP inference, evaluate.py:457-487). Batch must divide by the data-axis
    size."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ripor_tpu.core.mesh import DATA_AXIS

    inner = make_beam_search_fn(cfg, num_beams, constrained=constrained,
                                max_steps=max_steps, dtype=dtype,
                                use_pallas_gather=use_pallas_gather,
                                cache_segments=cache_segments,
                                deferred=deferred,
                                kv_cache_int8=kv_cache_int8,
                                kv_cache_quant=kv_cache_quant,
                                megarow=megarow,
                                kvg_quant_xla=kvg_quant_xla,
                                ffn_int8=ffn_int8)

    def _sharded(params, input_ids, attention_mask, tables):
        return shard_map(
            lambda p, i, m, tb: inner(p, i, m, tb),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            check_vma=False,
        )(params, input_ids, attention_mask, tables)

    _run = jax.jit(_sharded)
    # this OUTER jit is the program XLA actually compiles — the inner
    # dispatch's compiler options do not survive inlining, so mirror the
    # toy-cache scoped-vmem workaround here (see make_beam_search_fn)
    per_q = getattr(inner, "_cache_bytes_per_query", None)
    _run_toy = (jax.jit(_sharded, compiler_options=_TOY_COMPILER_OPTIONS)
                if per_q is not None else None)

    ndata = mesh.shape[DATA_AXIS]

    def run(params, input_ids, attention_mask, tables):
        if input_ids.shape[0] % ndata != 0:
            raise ValueError(
                f"query batch {input_ids.shape[0]} must divide the 'data' "
                f"axis ({ndata}); pad ragged batches with "
                f"pad_batch_to_data_axis() and drop the padded results")
        fn = _run
        if (per_q is not None
                and (input_ids.shape[0] // ndata) * per_q < _TOY_CACHE_BYTES):
            fn = _run_toy
        return fn(params, input_ids, attention_mask, tables)

    return run


def pad_batch_to_data_axis(input_ids, attention_mask, mesh):
    """Pad a ragged query batch up to a multiple of the mesh 'data' axis by
    repeating the final query row (repeats keep every shard's compute
    well-formed — a zero-mask dummy would attend over nothing). Returns
    ``(input_ids, attention_mask, n_valid)``; callers slice every output's
    leading axis to ``n_valid`` (the reference pads the same way via its
    DistributedSampler's wrap-around, evaluate.py:468)."""
    import numpy as _np

    from ripor_tpu.core.mesh import DATA_AXIS as _DA

    n = input_ids.shape[0]
    ndata = mesh.shape[_DA]
    pad = (-n) % ndata
    if pad:
        input_ids = _np.concatenate(
            [input_ids, _np.repeat(input_ids[-1:], pad, axis=0)], axis=0)
        attention_mask = _np.concatenate(
            [attention_mask, _np.repeat(attention_mask[-1:], pad, axis=0)],
            axis=0)
    return input_ids, attention_mask, n


def make_tp_beam_search_fn(cfg: RiporConfig, num_beams: int, mesh,
                           constrained: bool = True,
                           max_steps: Optional[int] = None,
                           dtype=jnp.bfloat16,
                           use_pallas_gather: Optional[bool] = None,
                           cache_segments: int = 4,
                           deferred: Optional[bool] = None,
                           kv_cache_int8: bool = False,
                           kv_cache_quant: Optional[str] = None,
                           kvg_quant_xla: Optional[bool] = None,
                           megarow: Optional[bool] = None,
                           ffn_int8: Optional[bool] = None):
    """Tensor-parallel (optionally x data-parallel) constrained beam search.

    Attention heads, d_ff, and the KV cache shard over the mesh's 'model'
    axis megatron-style (the per-device cache keeps the merged-head pallas
    row layout — it simply has H/mp heads); queries shard over 'data'.
    Output projections all-reduce over ICI inside each decode step
    (models/layers.py::Attention.out_flat / FeedForward). Beam selection
    and trie masking compute replicated within a model group (identical
    inputs -> identical picks; negligible vs attention).

    This is what lets t5-large run beam-1000 decode: its bf16 cache
    (~2.7x t5-base rows) overflows a single chip's HBM that the reference
    sidesteps with 4x A100-80GB DDP (reference README.md:23). Pass params
    UNSHARDED (replicated/host); shard_map slices them per device.

    Composes with the full production fast path: ``megarow`` (the
    all-layers reorder kernel runs on the per-device head shard — the
    merged-head row width RW simply halves per 2-way split, and int4/int8
    quantization groups are per-head so shards stay self-contained),
    ``kvg_quant_xla``, and ``ffn_int8`` (per-shard quantize + row-parallel
    int8 wo with an f32 psum, ops/int8_ffn.py).

    num_heads and d_ff must divide the 'model' axis size."""
    import dataclasses as _dc

    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from ripor_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
    from ripor_tpu.parallel.sharding import decode_params_pspec_tree

    mp = mesh.shape[MODEL_AXIS]
    t5 = cfg.t5
    if t5.num_heads % mp or t5.d_ff % mp:
        raise ValueError(f"num_heads={t5.num_heads} and d_ff={t5.d_ff} must "
                         f"divide the model axis ({mp})")
    cfg_local = _dc.replace(
        cfg, t5=_dc.replace(t5, num_heads=t5.num_heads // mp,
                            d_ff=t5.d_ff // mp, tp_axis=MODEL_AXIS))
    inner = make_beam_search_fn(cfg_local, num_beams, constrained=constrained,
                                max_steps=max_steps, dtype=dtype,
                                use_pallas_gather=use_pallas_gather,
                                cache_segments=cache_segments,
                                deferred=deferred,
                                kv_cache_int8=kv_cache_int8,
                                kv_cache_quant=kv_cache_quant,
                                kvg_quant_xla=kvg_quant_xla,
                                megarow=megarow, ffn_int8=ffn_int8)

    @jax.jit
    def run(params, input_ids, attention_mask, tables):
        specs = decode_params_pspec_tree(params)
        return shard_map(
            lambda p, i, m, tb: inner(p, i, m, tb),
            mesh=mesh,
            in_specs=(specs, P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            check_vma=False,
        )(params, input_ids, attention_mask, tables)

    return run


def beam_search(cfg: RiporConfig, params, input_ids, attention_mask,
                trie=None, num_beams: int = 10,
                dtype=jnp.bfloat16) -> BeamSearchOutput:
    """Convenience wrapper (builds+jits per call; hot paths should cache
    make_beam_search_fn)."""
    from ripor_tpu.trie.succinct import dummy_tables, succinct_tables
    constrained = trie is not None
    fn = make_beam_search_fn(cfg, num_beams, constrained=constrained, dtype=dtype)
    tables = succinct_tables(trie) if constrained else dummy_tables(cfg.M)
    tables = jax.tree.map(jnp.asarray, tables)
    scores, codes, state = fn(params, jnp.asarray(input_ids),
                              jnp.asarray(attention_mask), tables)
    scores = np.asarray(scores)
    state = np.asarray(state)
    groups = np.where(state <= -2, -2 - state, -1).astype(np.int32)
    return BeamSearchOutput(scores=scores, codes=np.asarray(codes), groups=groups)


def expand_groups_to_docids(trie, groups: np.ndarray, scores: np.ndarray,
                            topk: int) -> Tuple[np.ndarray, np.ndarray]:
    """Expand beam results (smtid groups) to ranked docids for one query.

    Mirrors the reference's smtid->docids expansion + truncation
    (evaluate.py:439-449,489-526): every doc in a group inherits the beam
    score; output truncated to topk. Returns (docids [<=topk], scores)."""
    out_docs, out_scores = [], []
    for g, s in zip(groups, scores):
        if g < 0 or s <= NEG_INF / 2:
            continue
        docs = trie.docids_of_group(int(g))
        out_docs.extend(docs.tolist())
        out_scores.extend([float(s)] * len(docs))
        if len(out_docs) >= topk:
            break
    return (np.asarray(out_docs[:topk], np.int32),
            np.asarray(out_scores[:topk], np.float32))
