"""Validate quantized-KV-cache retrieval quality on the real chip: overfit
the e2e slice (500 docs), then retrieve with the exact bf16 deferred path
vs the int8 AND packed-int4 caches and compare runs/metrics.

Measured 2026-08-17 (v5e-1), int8: 48/48 queries identical doc sets AND
identical ranking order, score deltas < 1e-4 -- the quantized cache is
retrieval-transparent on a trained model. (int4 results: see stdout of a
run; gate int4 adoption on the same identical-ranking bar.)

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
exact_run = json.load(open(ws.path("run.json")))
for quant in ("int8", "int4"):
    runq = stage_retrieve(ws, cfg, params, tok, queries, trie, docids,
                          num_beams=10, topk=20,
                          run_name=f"run_{quant}.json", kv_cache_quant=quant)
    mq = stage_evaluate(ws, runq, load_qrel(qrel_path),
                        perf_name=f"perf_{quant}.json")
    print(f"{quant}-path metrics:", mq, flush=True)
    same_set = same_order = 0
    for qid, docs in exact_run.items():
        dq = runq.get(qid, {})
        if set(dq) == set(docs):
            same_set += 1
            rank = sorted(docs, key=docs.get, reverse=True)
            rankq = sorted(dq, key=dq.get, reverse=True)
            same_order += rank == rankq
    print(f"{quant}: {same_set}/{len(exact_run)} identical doc sets, "
          f"{same_order} identical orderings", flush=True)
