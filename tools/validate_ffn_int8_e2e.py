"""Validate int8-weight-FFN retrieval quality on the real chip: overfit the
e2e slice (500 docs), then retrieve with the exact decode path vs
RIPOR_FFN_INT8=1 (and the production-relevant ffn_int8 + int4-KV combo) and
compare runs/metrics — same gate as tools/validate_int8_e2e.py.

Unlike the KV-cache quants (attention-read-only perturbation, validated
retrieval-transparent), the int8 FFN perturbs the OUTPUT logits (~1%
relative), so identical-ranking is NOT guaranteed a priori; this measures
how much ranking actually moves on a trained model.

Measured 2026-08-18 (v5e-1, converged slice — exact MRR@10 = 1.0):
- ffn_int8 alone:   47/48 identical doc sets, 46/48 identical orderings,
  metrics identical (1.0/1.0/1.0) — near-transparent.
- ffn_int8+int4KV:  35/48 identical sets, 27/48 identical orderings,
  metrics STILL identical (the relevant doc keeps rank 1) — the two
  quantizations compound in the ranking tail even though int4-KV alone is
  48/48-transparent (tools/validate_int8_e2e.py).
Conclusion: ffn_int8 stays opt-in; when combined with a quantized KV cache,
re-run this gate on the target model before trusting deep-tail rankings.

NOTE: s2s_epochs must be high enough to converge the slice (240 ≈ 2400
steps; at 40 epochs exact MRR is only 0.05 and the comparison is
meaningless — scores are so tightly packed that any perturbation flips
sets).

Usage: python tools/validate_ffn_int8_e2e.py [workdir]"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import numpy as np

base = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ffn8_val"
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
                  M=8, K=64, vocab_size=600, s2s_epochs=240,
                  learning_rate=2e-3, batch_size=48, num_beams=10, topk=20)
print("exact-path metrics:", metrics, flush=True)

from ripor_tpu.pipeline.recipe import (Workspace, stage_build_trie,
                                       stage_retrieve, stage_evaluate)
from ripor_tpu.data import Collection, UnigramTokenizer, load_qrel
from ripor_tpu.data import load_docid_to_smtid
from ripor_tpu.train.checkpoint import load_params
from ripor_tpu.models import RiporConfig

ws = Workspace(os.path.join(base, "ws"))
tok = UnigramTokenizer.load(ws.path("tokenizer.json"))
ckpt_dir = ws.path("checkpoints/final")
params = load_params(ckpt_dir)
cfg = RiporConfig.load(str(ckpt_dir / "config.json"))
docs = Collection(docs_dir)
queries = Collection(queries_dir)
docids, codes = load_docid_to_smtid(str(ws.path("docid_to_smtid.json")))
trie = stage_build_trie(ws, codes, cfg.K)
exact_run = json.load(open(ws.path("run.json")))

from ripor_tpu.decode.quant_gate import (ensure_quant_validated,
                                         quant_combo_key,
                                         record_quant_validation)

for quant in (None, "int4"):
    tag = quant_combo_key(quant, True)
    # this IS the validator, so it bypasses its own gate via the explicit
    # override env (scoped to the retrieve call)
    os.environ["RIPOR_UNVALIDATED_QUANT_OK"] = "1"
    runq = stage_retrieve(ws, cfg, params, tok, queries, trie, docids,
                          num_beams=10, topk=20,
                          run_name=f"run_{tag}.json", kv_cache_quant=quant,
                          ffn_int8=True, ckpt_dir=str(ckpt_dir))
    del os.environ["RIPOR_UNVALIDATED_QUANT_OK"]
    mq = stage_evaluate(ws, runq, load_qrel(qrel_path),
                        perf_name=f"perf_{tag}.json")
    print(f"{tag}-path metrics:", mq, flush=True)
    same_set = same_order = 0
    for qid, drun in exact_run.items():
        dq = runq.get(qid, {})
        if set(dq) == set(drun):
            same_set += 1
            rank = sorted(drun, key=drun.get, reverse=True)
            rankq = sorted(dq, key=dq.get, reverse=True)
            same_order += rank == rankq
    verdict = record_quant_validation(
        str(ckpt_dir), tag, n_queries=len(exact_run),
        set_identical=same_set, order_identical=same_order,
        metrics_identical=(mq == metrics))
    print(f"{tag}: {same_set}/{len(exact_run)} identical doc sets, "
          f"{same_order} identical orderings -> recorded "
          f"accepted={verdict['accepted']}", flush=True)
    try:   # the gate now reflects this verdict
        ensure_quant_validated(quant, True, ckpt_dir=str(ckpt_dir))
        print(f"{tag}: quant_gate ACCEPTS this combo for the checkpoint")
    except ValueError as e:
        print(f"{tag}: quant_gate refuses: {e}")
