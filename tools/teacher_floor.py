"""Derive a MEASURED teacher-quality floor for min_teacher_margin.

The recipe gates on the trained cross-encoder teacher's pos-neg logit
margin (full_recipe.run_full_recipe(min_teacher_margin=...)), but r3 set
the floor to 1.0 without deriving it from anything (VERDICT r3 weak #7).
This tool sweeps teacher training epochs at proof-corpus scale and
measures, per teacher:

  * its pos/neg logit margin (the gated statistic),
  * its OWN ranking quality (MRR@10 of the qrel positive within the
    teacher-rescored BM25 candidates — what the student actually
    distills),
  * downstream phase-1 dense retrieval dev MRR@10 after the reference's
    two-stage distillation (full_train_t5seq_encoder_{0,1}.sh).

The knee of margin -> downstream MRR is the defensible floor. Writes
artifacts/teacher_floor.json.

Usage: python tools/teacher_floor.py [workdir] [--epochs 2,5,10,20,60]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/teacher_floor")
    ap.add_argument("--epochs", default="2,5,10,20,60")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if os.environ.get("RIPOR_PROOF_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from curriculum_proof import build_corpus
    from ripor_tpu.data import Collection, load_qrel
    from ripor_tpu.evaluation.metrics import evaluate_run
    from ripor_tpu.evaluation.reranker import load_bert_teacher, rerank_pairs
    from ripor_tpu.evaluation.retriever import dense_topk
    from ripor_tpu.models import RiporModel
    from ripor_tpu.models.ripor import init_ripor_params
    from ripor_tpu.pipeline.e2e import _small_cfg
    from ripor_tpu.pipeline import full_recipe as fr
    from ripor_tpu.pipeline.recipe import (Workspace, stage_encode_corpus,
                                           stage_tokenizer)

    base = Path(args.workdir); base.mkdir(parents=True, exist_ok=True)
    # proof-corpus scale (curriculum_proof --size full geometry)
    sizes = dict(n_clusters=120, docs_per_cluster=20, n_train_q=960,
                 n_dev_q=120)
    docs_dir, tq_dir, tqrel, dq_dir, dqrel = build_corpus(
        base, seed=args.seed, **sizes)
    docs = Collection(docs_dir)
    queries = Collection(tq_dir)
    dev_queries = Collection(dq_dir)
    qrel = load_qrel(tqrel)
    dev_qrel = load_qrel(dqrel)
    n_docs = len(docs)

    results = {"corpus": sizes, "variants": {}}
    for ep in [int(e) for e in args.epochs.split(",") if e]:
        t0 = time.time()
        ws = Workspace(str(base / f"ws_ep{ep}"))
        tok = stage_tokenizer(ws, docs.texts + queries.texts,
                              8 * sizes["n_clusters"] + n_docs + 50,
                              kind="word")
        cfg = _small_cfg(32, 256, tok.vocab_size)
        model = RiporModel(cfg)
        params = init_ripor_params(jax.random.PRNGKey(args.seed), cfg)

        bm25 = fr._stage_bm25_run(ws, queries, docs, topk=50)
        ckpt = fr._train_bert_teacher(ws, tok, queries, docs, qrel, bm25,
                                      epochs=ep, batch_size=32,
                                      seed=args.seed)
        teacher_fn = load_bert_teacher(ckpt, tok.vocab_size)
        tq_stats = fr._teacher_quality(ws, teacher_fn, tok, queries, docs,
                                       ws.path("bce_examples.train.tsv"))

        def teacher_pair_scores(pairs, query_texts=None):
            return rerank_pairs(teacher_fn, tok,
                                query_texts if query_texts is not None
                                else queries, docs, list(pairs),
                                batch_size=64, max_length=64)

        # the teacher's own ranking quality on the BM25 candidates: the
        # rescored run IS the distillation target
        rescored_path = ws.path("teacher_rescored_bm25.json")
        if rescored_path.exists():
            rescored = json.loads(rescored_path.read_text())
        else:
            pairs = sorted({(str(q), str(d))
                            for q, ds in bm25.items() for d in ds})
            rescored = teacher_pair_scores(pairs)
            rescored_path.write_text(json.dumps(rescored))
        teacher_mrr = evaluate_run(rescored, qrel, "mrr_10")

        # reference two-stage phase-1 distillation, then dense dev eval
        rel_path = ws.path("qid_to_reldocid_to_score.json")
        if not rel_path.exists():
            rel_pairs = [(str(q), str(d)) for q, rels in qrel.items()
                         for d, r in rels.items() if r > 0]
            rel_path.write_text(json.dumps(teacher_pair_scores(rel_pairs)))
        q2r = json.loads(rel_path.read_text())

        from ripor_tpu.data import (PretrainCollator, TeacherScoreExamples,
                                    batches_from_teacher_examples)
        from ripor_tpu.pipeline.recipe import stage_train
        from ripor_tpu.train import TrainConfig
        pre_coll = PretrainCollator(tok, queries, docs, max_length=64)

        def pretrain_stage(stage, ts_path, p, epochs=4):
            ex = TeacherScoreExamples(ts_path)
            bz = min(32, len(ex))
            tcfg = TrainConfig(loss_type="t5seq_pretrain_margin_mse",
                               learning_rate=1e-3,
                               total_steps=fr._epochs_steps(len(ex), bz,
                                                            epochs))
            return stage_train(ws, stage, model, p, tcfg,
                               batches_from_teacher_examples(
                                   ex, pre_coll, bz, epochs=epochs,
                                   drop_last=False), cfg,
                               rng_seed=args.seed)

        t0p = fr._teacher_trainset(ws, "pretrain_trainset_0.jsonl", bm25,
                                   teacher_pair_scores, q2r, top_k=200)
        params = pretrain_stage("phase1_pretrain", t0p, params)
        embs0 = stage_encode_corpus(ws, model, params, docs, tok,
                                    max_length=64, batch_size=32,
                                    out_name="doc_embeds_phase1_0.npy")
        run0 = fr._dense_run(ws, "dense_run_phase1_0.json", embs0, model,
                             params, tok, queries, docs.ids, topk=50,
                             batch_size=32)
        t1p = fr._teacher_trainset(ws, "pretrain_trainset_1.jsonl", run0,
                                   teacher_pair_scores, q2r, top_k=200)
        params = pretrain_stage("phase1_pretrain_1", t1p, params)

        embs = stage_encode_corpus(ws, model, params, docs, tok,
                                   max_length=64, batch_size=32,
                                   out_name="doc_embeds_phase1_1.npy")
        dev_run = fr._dense_run(ws, "dense_run_dev.json", embs, model,
                                params, tok, dev_queries, docs.ids,
                                topk=10, batch_size=32)
        dev_mrr = evaluate_run(dev_run, dev_qrel, "mrr_10")

        results["variants"][str(ep)] = {
            "teacher_margin": tq_stats["margin"],
            "teacher_mrr_10_train": teacher_mrr,
            "phase1_dense_dev_mrr_10": dev_mrr,
            "wall_s": round(time.time() - t0, 1),
        }
        print(f"epochs={ep:3d}: margin={tq_stats['margin']:7.3f} "
              f"teacher_mrr={teacher_mrr:.4f} "
              f"phase1_dev_mrr={dev_mrr:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    art = Path("/root/repo/artifacts"); art.mkdir(exist_ok=True)
    (art / "teacher_floor.json").write_text(json.dumps(results, indent=1))
    print("wrote artifacts/teacher_floor.json")


if __name__ == "__main__":
    main()
