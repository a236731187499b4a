"""Dense-retrieval + RQ-build throughput benchmark (the faiss replacements).

Measures on the real chip:
  * brute-force IP top-k (evaluation/retriever.dense_topk — replaces
    faiss IndexFlatIP, reference tasks/evaluator.py:480-492)
  * RQ codebook training + code assignment (quantize/rq — replaces
    faiss IndexResidualQuantizer, reference tasks/evaluator.py:406-421)

Env: BENCH_DENSE_DOCS (default 1M), BENCH_DENSE_QUERIES (1000),
BENCH_RQ_DOCS (200k). Usage: python tools/bench_dense.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import numpy as np

from ripor_tpu.evaluation.retriever import dense_topk
from ripor_tpu.quantize import rq_encode, train_rq

D = 768
n_docs = int(os.environ.get("BENCH_DENSE_DOCS", 1_000_000))
n_q = int(os.environ.get("BENCH_DENSE_QUERIES", 1000))
rq_docs = int(os.environ.get("BENCH_RQ_DOCS", 200_000))

rng = np.random.default_rng(0)
docs = rng.standard_normal((n_docs, D)).astype(np.float32)
queries = rng.standard_normal((n_q, D)).astype(np.float32)

# --- dense top-k: index upload once (serving keeps it resident), then
# steady-state query throughput ---
import jax
t0 = time.time()
docs_dev = jax.device_put(docs)
# warm up with the FULL query shape — a smaller warmup batch compiles a
# different program and the timed call would then include the real compile
_ = dense_topk(queries, docs_dev, 10)
up_s = time.time() - t0
print(f"# index upload+compile {up_s:.1f}s", file=sys.stderr)
times = []
for _ in range(3):
    t0 = time.time()
    s, i = dense_topk(queries, docs_dev, 10)
    times.append(time.time() - t0)
dt = min(times)
qps = n_q / dt
print(f"# dense_topk: {n_q} queries x {n_docs} docs in {dt:.2f}s "
      f"steady-state", file=sys.stderr)

# --- RQ build (train codebooks on a slice + encode) ---
if rq_docs <= 0:
    print(json.dumps({"dense_topk_qps": round(qps, 1), "dense_docs": n_docs}))
    raise SystemExit(0)
t0 = time.time()
books = train_rq(docs[:rq_docs], M=8, K=256, kmeans_iters=8)
train_s = time.time() - t0
t0 = time.time()
codes = rq_encode(books, docs[:rq_docs], beam=4)
enc_s = time.time() - t0
print(f"# rq: train 8x256 on {rq_docs} in {train_s:.1f}s, "
      f"encode in {enc_s:.1f}s", file=sys.stderr)

print(json.dumps({
    "dense_topk_qps": round(qps, 1),
    "dense_docs": n_docs,
    "rq_train_s": round(train_s, 1),
    "rq_encode_docs_per_sec": round(rq_docs / enc_s, 0),
}))
