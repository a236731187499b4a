"""Teacher-strength sweep: find a cross-encoder that OUTRANKS the student.

r4 mechanism finding (tools/mnt4_dynamics.py ep0 probe): at proof scale
the post-seq2seq student already ranks the qrel positive's prefix first
for 99.2% of train queries, while the trained toy teacher's own ranking
of the same candidates is MRR@10 ~0.655 (docid-level 0.763) with only
0.21 correlation to the student's scores. Every MarginMSE stage distills
the teacher — so phase 2/3 training pulls a near-perfect ranking DOWN
toward a worse one, which is exactly the measured collapse (dev 0.280 ->
0.029). The reference never hits this because its premise is teacher >
student: ms-marco-MiniLM-L-6-v2 (arguments.py:218) outranks the phase-2
student on MS MARCO. Reproducing the paper's result requires reproducing
that premise.

This tool sweeps teacher geometry/epochs/negatives ON THE TPU (the sweep
is idle-chip work) and measures what actually matters:

  * candidate-ranking MRR@10 on the train-query candidate run (the
    distillation target quality) — must beat the student's fit,
  * the same on held-out dev queries over BM25 candidates (teacher
    generalization — the teacher scores raw text pairs, so train/dev
    should match),
  * the pos/neg logit margin (the old gated statistic, for reference).

Writes artifacts/teacher_strength.json. The knee of this sweep defines
the measured floor for full_recipe(min_teacher_margin=...) and the
geometry the curriculum proof should use (VERDICT r3 #5).

Usage:
  RIPOR_PROOF_TPU=1 python tools/teacher_strength.py /tmp/cur_v2 \
      [--variants base,d128x4e60,...]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

_SMALL = dict(d_model=64, num_layers=2, num_heads=4, d_ff=128,
              max_position=128)
_MED = dict(d_model=128, num_layers=4, num_heads=8, d_ff=512,
            max_position=128)
_BIG = dict(d_model=256, num_layers=4, num_heads=8, d_ff=1024,
            max_position=128)

# pool: which run supplies BCE negatives — "bm25" (phase-0, what r3 used),
# "cand" (the self-mined dense candidates that phase 2/3 actually distill
# over — the reference's "rankdata_run" branch,
# build_bce_example_for_t5seq_encoder.py:45-51), or "bm25+cand" (union).
# The r4 mechanism finding: a teacher trained only on BM25 negatives has
# never SEEN the self-mined hard negatives it must rank at rescoring time
# (measured: train-candidate MRR 0.75 vs the student's 0.99 fit).
VARIANTS = {
    "base":          dict(geo=_SMALL, epochs=20, lr=1e-3, neg=8,
                          pool="bm25", warmup=0.0),
    "base_e60":      dict(geo=_SMALL, epochs=60, lr=1e-3, neg=8,
                          pool="bm25", warmup=0.0),
    "d128x4e60":     dict(geo=_MED, epochs=60, lr=1e-3, neg=8,
                          pool="bm25", warmup=0.0),
    "d128x4e60n24":  dict(geo=_MED, epochs=60, lr=1e-3, neg=24,
                          pool="bm25", warmup=0.0),
    "d256x4e60":     dict(geo=_BIG, epochs=60, lr=1e-3, neg=8,
                          pool="bm25", warmup=0.0),
    # r4 second wave: hard-negative pools + working deep-teacher optimization
    # (d128+ at lr 1e-3 never left init — BCE pinned at ln2; warmup + 3e-4)
    "base_hn20":     dict(geo=_SMALL, epochs=20, lr=1e-3, neg=8,
                          pool="bm25+cand", warmup=0.0),
    "base_hn60":     dict(geo=_SMALL, epochs=60, lr=1e-3, neg=8,
                          pool="bm25+cand", warmup=0.0),
    "base_cand60":   dict(geo=_SMALL, epochs=60, lr=1e-3, neg=8,
                          pool="cand", warmup=0.0),
    "d128x4hn_warm": dict(geo=_MED, epochs=60, lr=3e-4, neg=8,
                          pool="bm25+cand", warmup=0.1),
    "d128x4bm_warm": dict(geo=_MED, epochs=60, lr=3e-4, neg=8,
                          pool="bm25", warmup=0.1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--ws", default="ws_curriculum")
    ap.add_argument("--variants",
                    default="base_hn20,base_hn60,base_cand60,"
                            "d128x4hn_warm,d128x4bm_warm")
    ap.add_argument("--eval-queries", type=int, default=240,
                    help="train queries sampled for candidate-MRR eval")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if os.environ.get("RIPOR_PROOF_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import numpy as np

    from ripor_tpu.data import (BceExamples, BertBceCollator, Collection,
                                batches_from_bce, load_qrel,
                                save_bce_examples)
    from ripor_tpu.evaluation.bm25 import BM25Index
    from ripor_tpu.evaluation.reranker import load_bert_teacher, rerank_pairs
    from ripor_tpu.models.cross_encoder import BertCrossEncoder
    from ripor_tpu.pipeline.datagen import build_bce_examples
    from ripor_tpu.pipeline.recipe import (Workspace, load_tokenizer,
                                           stage_train)
    from ripor_tpu.train import TrainConfig
    import jax.numpy as jnp

    base = Path(args.workdir)
    ws = Workspace(str(base / args.ws))
    tok = load_tokenizer(ws.path("tokenizer.json"))
    docs = Collection(str(base / "docs"))
    queries = Collection(str(base / "queries_train"))
    dev_queries = Collection(str(base / "queries_dev"))
    qrel = load_qrel(str(base / "qrel_queries_train.json"))
    dev_qrel = load_qrel(str(base / "qrel_queries_dev.json"))
    bm25 = json.loads(ws.path("bm25_run.json").read_text())

    # train-query candidate set: the phase-2 MM run (what gets distilled)
    cand_run = json.loads(ws.path("dense_run_phase1_1.json").read_text())
    rng = np.random.default_rng(args.seed)
    eval_qids = list(cand_run)
    rng.shuffle(eval_qids)
    eval_qids = eval_qids[:args.eval_queries]

    # dev-query candidates: BM25 over the corpus (teacher generalization)
    dev_bm25_path = ws.path("bm25_run_dev.json")
    if dev_bm25_path.exists():
        dev_run = json.loads(dev_bm25_path.read_text())
    else:
        index = BM25Index(docs.texts)
        dev_run = index.run(dev_queries.ids, dev_queries.texts, docs.ids,
                            topk=50)
        dev_bm25_path.write_text(json.dumps(dev_run))

    def candidate_mrr(teacher_fn, run, qrel_, qcoll, qids=None):
        pairs = sorted({(str(q), str(d))
                        for q, ds in run.items()
                        if qids is None or q in qids
                        for d in ds})
        scored = rerank_pairs(teacher_fn, tok, qcoll, docs, pairs,
                              batch_size=256, max_length=64)
        rr = []
        for qid, dscores in scored.items():
            rel = {d for d, r in qrel_.get(qid, {}).items() if r > 0}
            if not rel:
                continue
            ranked = sorted(dscores.items(), key=lambda kv: -kv[1])[:10]
            r = next((i + 1 for i, (d, _) in enumerate(ranked) if d in rel),
                     None)
            rr.append(1.0 / r if r else 0.0)
        return float(np.mean(rr)), len(rr)

    art = Path("/root/repo/artifacts")
    art.mkdir(exist_ok=True)
    out_path = art / "teacher_strength.json"
    results = (json.loads(out_path.read_text()) if out_path.exists()
               else {})  # accumulate across invocations
    def neg_pool(kind):
        if kind == "bm25":
            return bm25
        if kind == "cand":
            return cand_run
        merged = {q: dict(ds) for q, ds in bm25.items()}
        for q, ds in cand_run.items():
            merged.setdefault(q, {}).update(ds)
        return merged

    for name in [v for v in args.variants.split(",") if v]:
        v = VARIANTS[name]
        geo, epochs, lr, neg_sample = v["geo"], v["epochs"], v["lr"], v["neg"]
        t0 = time.time()
        print(f"== teacher variant {name}: {geo} epochs={epochs} "
              f"neg={neg_sample} pool={v['pool']} warmup={v['warmup']}",
              flush=True)
        tws = Workspace(str(base / f"ws_teacher_{name}"))
        bce_path = tws.path("bce_examples.train.tsv")
        if not bce_path.exists():
            save_bce_examples(bce_path, build_bce_examples(
                qrel, neg_pool(v["pool"]), neg_sample=neg_sample,
                rng=np.random.default_rng(args.seed)))
        examples = BceExamples(bce_path)
        coll = BertBceCollator(tok, queries, docs, max_length=64)
        model = BertCrossEncoder(vocab_size=tok.vocab_size, **geo)
        ids0 = jnp.ones((1, 8), jnp.int32)
        params = model.init({"params": jax.random.PRNGKey(args.seed)},
                            ids0, ids0)["params"]
        bz = min(64, len(examples))
        total = max(1, epochs * max(1, len(examples) // bz))
        tcfg = TrainConfig(loss_type="bert_bce", learning_rate=lr,
                           total_steps=total,
                           warmup_steps=int(v["warmup"] * total))
        stage_train(tws, "bert_teacher", model, params, tcfg,
                    batches_from_bce(examples, coll, bz, epochs=epochs,
                                     drop_last=False), None,
                    rng_seed=args.seed)
        ckpt = tws.path("checkpoints/bert_teacher")
        (ckpt / "bert_geometry.json").write_text(json.dumps(geo))
        teacher_fn = load_bert_teacher(str(ckpt), tok.vocab_size)

        from ripor_tpu.pipeline.full_recipe import _teacher_quality
        tq = _teacher_quality(tws, teacher_fn, tok, queries, docs, bce_path)
        train_mrr, n_tr = candidate_mrr(teacher_fn, cand_run, qrel, queries,
                                        qids=set(eval_qids))
        dev_mrr, n_dev = candidate_mrr(teacher_fn, dev_run, dev_qrel,
                                       dev_queries)
        results[name] = {
            "geometry": geo, "epochs": epochs, "neg_sample": neg_sample,
            "pool": v["pool"], "warmup": v["warmup"],
            "margin": round(tq["margin"], 3),
            "train_candidate_mrr_10": round(train_mrr, 4),
            "dev_bm25_mrr_10": round(dev_mrr, 4),
            "n_train_eval": n_tr, "n_dev_eval": n_dev,
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"   {name}: margin={tq['margin']:.2f} "
              f"train_cand_mrr={train_mrr:.4f} dev_bm25_mrr={dev_mrr:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        (art / "teacher_strength.json").write_text(
            json.dumps(results, indent=1))

    print("wrote artifacts/teacher_strength.json")


if __name__ == "__main__":
    main()
