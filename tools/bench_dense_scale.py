"""Single-chip dense MIPS at reference corpus scale (8.8M x 768).

The reference's dense path cannot run on one GPU: its store is fp32
(27 GB, tasks/evaluator.py:45,408) and faiss shards the flat index over
8 GPUs (tasks/evaluator.py:784-812). A bf16 device corpus is 13.5 GB and
fits ONE v5e chip (evaluation/retriever.py::device_corpus); this measures
exact (tiled two-level top-k) query throughput against it.

The corpus is synthesized directly in HBM (chunked RNG + donated
dynamic_update_slice) because this image's host->device relay moves
~10-25 MB/s — a 13.5 GB upload would measure the relay, not the design.
Real TPU VMs load a corpus of this size from disk in seconds.

Env: DENSE_DOCS (8_800_000), DENSE_D (768), DENSE_Q (256), DENSE_K (100),
DENSE_QUANT=int8 (Int8Corpus capacity mode: 1 byte/dim + per-row scale —
6.8 GB at 8.8M docs, and 17.6M x 768 docs fit ONE chip: 2x the reference's
full corpus; try DENSE_DOCS=17600000 DENSE_QUANT=int8).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from ripor_tpu.evaluation.retriever import dense_topk

n_docs = int(os.environ.get("DENSE_DOCS", 8_800_000))
d = int(os.environ.get("DENSE_D", 768))
n_q = int(os.environ.get("DENSE_Q", 256))
k = int(os.environ.get("DENSE_K", 100))

CHUNK = int(os.environ.get("DENSE_CHUNK", 1 << 20))  # rows per RNG fill
CHUNK = min(CHUNK, n_docs)  # small-corpus runs: one fill covers everything
# rows per top-k scan block: bounds the in-jit transient (block copy +
# f32 scores) so corpus 13.5 GB + transients stay under 16 GB HBM
BLOCK = int(os.environ.get("DENSE_BLOCK", 1 << 19))
APPROX = os.environ.get("DENSE_APPROX", "0") == "1"  # approx_max_k serving mode
QUANT = os.environ.get("DENSE_QUANT", "")            # "int8" = Int8Corpus

cdtype = jnp.int8 if QUANT == "int8" else jnp.bfloat16


def _fill(buf, key, start):
    if QUANT == "int8":
        blk = jax.random.randint(key, (CHUNK, d), -127, 128, jnp.int32
                                 ).astype(jnp.int8)
    else:
        blk = jax.random.normal(key, (CHUNK, d), jnp.bfloat16)
    return jax.lax.dynamic_update_slice(buf, blk, (start, 0))


_fill_d = jax.jit(_fill, donate_argnums=(0,))

t0 = time.time()
# exact-size buffer; the tail fill overlaps the previous chunk (same chunk
# shape -> one compiled fill; a pad-then-slice would COPY the 14 GB buffer)
corpus = jnp.zeros((n_docs, d), cdtype)
key = jax.random.PRNGKey(0)
starts = list(range(0, n_docs - CHUNK + 1, CHUNK))
if starts[-1] + CHUNK < n_docs:
    starts.append(n_docs - CHUNK)
for s0 in starts:
    key, sub = jax.random.split(key)
    corpus = _fill_d(corpus, sub, s0)
np.asarray(corpus[0, :1])  # fence
gb = n_docs * d * jnp.dtype(cdtype).itemsize / 1e9
if QUANT == "int8":
    from ripor_tpu.evaluation.retriever import Int8Corpus
    scale = jnp.full((n_docs,), 1.0 / 127.0, jnp.float32)
    corpus = Int8Corpus(corpus, scale)
print(f"# corpus synthesized on-device {time.time()-t0:.1f}s "
      f"({gb:.1f} GB {QUANT or 'bf16'})", file=sys.stderr)

rng = np.random.default_rng(0)
queries = rng.standard_normal((n_q, d)).astype(np.float32)

t0 = time.time()
s, i = dense_topk(queries, corpus, k, block_docs=BLOCK, approx=APPROX)
print(f"# compile+first run {time.time()-t0:.1f}s", file=sys.stderr)

times = []
for _ in range(3):
    t0 = time.time()
    s, i = dense_topk(queries, corpus, k, block_docs=BLOCK, approx=APPROX)
    times.append(time.time() - t0)
per = min(times)
qps = n_q / per
bw = gb / per
print(f"# steady-state {per*1000:.1f} ms / {n_q} queries "
      f"({bw:.0f} GB/s corpus scan)", file=sys.stderr)
print(json.dumps({
    "metric": "dense_mips_queries_per_sec",
    "value": round(qps, 1),
    "unit": (f"qps@top{k}_{n_docs}docs_d{d}_{QUANT or 'bf16'}_1chip_"
             + ("approx" if APPROX else "exact")),
    "vs_baseline": None,
}))
