"""Headline benchmark: constrained-beam retrieval throughput (queries/sec).

Reference inference config (BASELINE.md): t5-base, constrained beam search,
beam = topk = 1000, 32 decode steps, batch 1 per GPU, on 4x A100
(full_scripts/full_evaluate_t5seq_aq_encoder.sh:183-199). The reference
publishes no throughput number and no CUDA is available here, so the
baseline is an estimate documented below; raw queries/sec is the primary
value and is directly comparable across rounds.

Baseline estimate: the reference's loop does 32 decoder steps per query with
two host synchronizations per step (trie CSR lookup via CPU string keys +
Python BeamSearchScorer) at beam 1000. Published generative-retrieval
latencies for this setup are ~1 s/query/GPU; 4x A100 => ~4 queries/sec.
vs_baseline = measured_qps / 4.0.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    # persistent compilation cache: the beam-search compile is minutes-long
    # through this image's remote-compile relay; cache it across runs
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from ripor_tpu.decode.beam import make_beam_search_fn
    from ripor_tpu.models import RiporModel, ripor_base
    from ripor_tpu.trie import build_trie, succinct_tables, tables_memory_bytes

    n_docs = int(os.environ.get("BENCH_DOCS", 100_000))
    num_beams = int(os.environ.get("BENCH_BEAMS", 1000))
    # packed-int4 KV rows are the default (BENCH_QUANT=int8|int4|none to
    # override; legacy BENCH_INT8=0 -> exact bf16, BENCH_INT4=1 -> int4):
    # both int8 and int4 validated retrieval-transparent e2e on the chip
    # (tools/validate_int8_e2e.py, 48/48 queries with identical retrieved
    # sets AND identical ranking order vs the exact bf16 path); int4
    # quarters cache bytes -> 7.32 qps vs int8's 6.4 at batch 8.
    if os.environ.get("BENCH_INT4") == "1":
        quant_env = "int4"
    elif "BENCH_INT8" in os.environ:
        quant_env = "int8" if os.environ["BENCH_INT8"] == "1" else "none"
    else:
        quant_env = os.environ.get("BENCH_QUANT", "int4")
    quant = None if quant_env in ("none", "0", "") else quant_env
    # batch 12 is the measured-best megarow default (8.03 qps vs 7.95 at b8;
    # b16 OOMs the beam-1000 int4 ping-pong cache pair by ~255 MB)
    batch = int(os.environ.get("BENCH_BATCH", 12 if quant else 4))
    seq_len = int(os.environ.get("BENCH_SEQ", 64))
    iters = int(os.environ.get("BENCH_ITERS", 5))

    M = int(os.environ.get("BENCH_M", 32))      # 16x1024 variant: BENCH_M=16
    K = int(os.environ.get("BENCH_K", 256))     #                  BENCH_K=1024
    # backbone: t5-small|t5-base|t5-large|t5-3b (config #5 fit checks —
    # see tools/decode_fit.py for the HBM accounting per combination)
    backbone = os.environ.get("BENCH_MODEL", "t5-base")
    if backbone == "t5-base":
        cfg = ripor_base(M=M, K=K)
    else:
        from ripor_tpu.models.config import _NAMED_T5, RiporConfig
        cfg = RiporConfig(t5=_NAMED_T5[backbone](), M=M, K=K)
    model = RiporModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)

    ids = jnp.asarray(rng.integers(1, 32000, (batch, seq_len)), jnp.int32)
    mask = jnp.ones_like(ids)
    codes0 = jnp.zeros((batch, cfg.M), jnp.int32)
    t0 = time.time()
    # host-side init (bench only needs correctly-shaped params; avoids the
    # slow on-device init compile through this image's remote-compile relay)
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k}, ids, mask, codes0)["params"],
        jax.random.PRNGKey(0))
    # serve params in bf16: the decode path computes in bf16 regardless
    # (f32 params just add a hoisted cast copy + 2x argument HBM — the
    # difference between t5-3b b1 fitting, 14.9G, and OOMing, 20.6G)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            0.02 * rng.standard_normal(s.shape),
            jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating)
            else s.dtype),
        shapes)
    print(f"# params init {time.time()-t0:.1f}s", file=sys.stderr)

    # synthetic corpus codes: correlated like real RQ output (shared prefixes)
    doc_codes = np.concatenate([
        rng.integers(0, max(K // 4, 2), (n_docs, 4)),   # narrow early levels
        rng.integers(0, K, (n_docs, cfg.M - 4)),
    ], axis=1).astype(np.int32)
    t0 = time.time()
    trie = build_trie(doc_codes, cfg.K)
    print(f"# trie build {time.time()-t0:.1f}s, {trie.num_internal} internal, "
          f"{trie.memory_bytes()/1e6:.0f} MB", file=sys.stderr)

    tables = jax.tree.map(jnp.asarray, succinct_tables(trie))
    print(f"# succinct trie tables {tables_memory_bytes(tables)/1e6:.0f} MB",
          file=sys.stderr)
    # BENCH_SEGMENTS=1 disables the growing cache segments: steady-state
    # HBM is the FULL-length cache from step 0, but the segment-transition
    # jnp.pad (which holds old+new ping-pong pairs alive simultaneously)
    # disappears — that transient is what OOMs batch 16 at beam 1000.
    segments = int(os.environ.get("BENCH_SEGMENTS", 4))
    # megarow (ops/megarow.py) is the measured-best decode path on v5e:
    # 8.03 qps (b12) / 7.95 (b8) vs 7.16-7.34 for the per-layer deferred
    # kernel at the same config (BENCH_MEGAROW=0 compares the old path)
    megarow = os.environ.get("BENCH_MEGAROW", "1") == "1"
    # BENCH_FFN_INT8=1: int8-weight FFN dots (ops/int8_ffn.py) — int8 MXU
    # runs 2x bf16 on v5e; affects output numerics, so it stays opt-in
    # until validated e2e (tools/validate_int8_e2e.py pattern)
    ffn_int8 = os.environ.get("BENCH_FFN_INT8", "0") == "1"
    run = make_beam_search_fn(cfg, num_beams, constrained=True,
                              dtype=jnp.bfloat16, kv_cache_quant=quant,
                              cache_segments=segments, megarow=megarow,
                              ffn_int8=ffn_int8)

    # warmup / compile. NOTE: block_until_ready does not synchronize through
    # this image's remote-execution relay — np.asarray (host transfer) is the
    # only reliable fence, so scores are pulled to host inside the timed loop
    # (a real retrieval system needs them on host anyway).
    t0 = time.time()
    s, c, st = run(params, ids, mask, tables)
    np.asarray(s)
    print(f"# compile+first run {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(iters):
        t0 = time.time()
        s, c, st = run(params, ids, mask, tables)
        np.asarray(s), np.asarray(st)
        times.append(time.time() - t0)
    per_batch = min(times)
    qps = batch / per_batch
    print(f"# steady-state {per_batch*1000:.1f} ms/batch (batch={batch}, "
          f"beam={num_beams}, {n_docs} docs)", file=sys.stderr)

    baseline_qps = 4.0  # 4x A100 estimate, see module docstring
    print(json.dumps({
        "metric": "constrained_beam_queries_per_sec",
        "value": round(qps, 3),
        "unit": (f"qps@beam{num_beams}_{backbone.replace('-', '')}_{M}x{K}"
                 f"_{n_docs}docs_1chip" + (f"_{quant}kv" if quant else "")
                 + ("_int8ffn" if ffn_int8 else "")),
        "vs_baseline": round(qps / baseline_qps, 3),
        # the reference publishes no throughput (README.md:23); 4 qps is an
        # inferred 4xA100 figure (BASELINE.md) — flag it so BENCH_r*.json
        # is self-describing
        "baseline_is_estimate": True,
        "baseline_basis": "inferred 4 qps on 4xA100 (BASELINE.md; reference publishes no throughput)",
    }))


if __name__ == "__main__":
    main()
