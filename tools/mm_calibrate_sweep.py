"""Phase-2/3 MarginMSE scale-calibration sweep over a finished proof ws.

r3 postmortem (VERDICT r3 missing #2 + /tmp/premm.log): at 960 train
queries the phase-2 MarginMSE stage itself REGRESSES the model —
dev MRR@10 0.267 (post-seq2seq) -> 0.130 (post-MM), train 0.777 -> 0.572
— the same scale-recalibration transient diagnosed for phase 3
(artifacts/phase3_dynamics_r3.md). This tool tests the mechanism fix
(ripor_tpu/train/calibrate.py: least-squares teacher-score scaling at
datagen time) WITHOUT re-running the 40-minute recipe: it reuses the
finished workspace's phase2_seq2seq checkpoint and MM trainset, trains
calibrated/uncalibrated MM variants, then (optionally) runs a calibrated
phase-3 curriculum with fresh per-stage datagen on top of the best MM.

Usage:
  python tools/mm_calibrate_sweep.py /tmp/cur_v2 \
      [--ws ws_curriculum] [--variants cal6,cal2,...] [--phase3]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

# name: (calibrate, epochs, lr)
MM_VARIANTS = {
    "asis6":  (False, 6, 1e-4),   # what the recipe ran (known: dev 0.130)
    "cal6":   (True, 6, 1e-4),
    "cal2":   (True, 2, 1e-4),
    "cal12":  (True, 12, 1e-4),
    "cal6lo": (True, 6, 3e-5),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--ws", default="ws_curriculum")
    ap.add_argument("--variants", default="cal6,cal2")
    ap.add_argument("--phase3", default="",
                    help="MM variant name to run the calibrated phase-3 "
                         "curriculum on top of (fresh datagen)")
    ap.add_argument("--phase3-epochs", type=int, default=2)
    ap.add_argument("--phase3-flat", action="store_true",
                    help="phase-3 arm trains full-length only (ablation)")
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if os.environ.get("RIPOR_PROOF_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from curriculum_proof import dev_eval
    from ripor_tpu.data import (Collection, MarginMSECollator,
                                TeacherScoreExamples,
                                batches_from_teacher_examples,
                                load_docid_to_smtid, load_qrel)
    from ripor_tpu.models import RiporConfig, RiporModel
    from ripor_tpu.models.ripor import init_ripor_params
    from ripor_tpu.pipeline.recipe import Workspace, load_tokenizer
    from ripor_tpu.train import TrainConfig, load_params, save_params
    from ripor_tpu.train.calibrate import calibrate_trainset
    from ripor_tpu.train.trainer import Trainer

    base = Path(args.workdir)
    ws = Workspace(str(base / args.ws))
    ckpt_s2s = ws.path("checkpoints/phase2_seq2seq")
    cfg = RiporConfig.load(str(ckpt_s2s / "config.json"))
    model = RiporModel(cfg)
    like = init_ripor_params(jax.random.PRNGKey(0), cfg)
    params_s2s = load_params(ckpt_s2s, like=like)
    tok = load_tokenizer(ws.path("tokenizer.json"))
    queries = Collection(str(base / "queries_train"))
    dq_dir = str(base / "queries_dev")
    dqrel = str(base / "qrel_queries_dev.json")
    docids_l, codes_l = load_docid_to_smtid(str(ws.path("docid_to_smtid.json")))
    d2c = dict(zip(docids_l, codes_l))

    results = {}

    def train_mm(name, calibrate, epochs, lr):
        mm_path = str(ws.path("phase2_mm_trainset.jsonl"))
        if calibrate:
            cal_path = str(ws.path(f"phase2_mm_trainset.{name}.cal.jsonl"))
            stats = calibrate_trainset(
                mm_path, cal_path, model, params_s2s, tok, queries,
                docid_to_codes=d2c, smtid_as_docid=False,
                alphas_out=str(ws.path(f"calibration_{name}.json")),
                seed=args.seed)
            print(f"   [{name}] alpha={stats['alpha']:.3f} "
                  f"(student {stats['student_margin_mean']:.1f}"
                  f"±{stats['student_margin_std']:.1f} vs teacher "
                  f"{stats['teacher_margin_mean']:.1f}"
                  f"±{stats['teacher_margin_std']:.1f})", flush=True)
            mm_path = cal_path
            results.setdefault("probes", {})[name] = {
                k: v for k, v in stats.items() if k != "applied"}
        examples = TeacherScoreExamples(mm_path)
        coll = MarginMSECollator(tok, queries, d2c, max_length=64)
        bz = min(32, len(examples))
        steps = max(1, epochs * max(1, len(examples) // bz))
        tcfg = TrainConfig(loss_type="t5seq_aq_encoder_margin_mse",
                           learning_rate=lr, total_steps=steps)
        trainer = Trainer(model, tcfg, params_s2s)
        state, _ = trainer.run(
            batches_from_teacher_examples(examples, coll, bz, epochs=epochs,
                                          drop_last=False),
            jax.random.PRNGKey(args.seed + 77))
        save_params(ws.path(f"checkpoints/mm_{name}"), state.params, cfg)
        return state.params

    for name in [v for v in args.variants.split(",") if v]:
        calibrate, epochs, lr = MM_VARIANTS[name]
        t0 = time.time()
        print(f"== MM variant {name}: calibrate={calibrate} epochs={epochs} "
              f"lr={lr}", flush=True)
        p = train_mm(name, calibrate, epochs, lr)
        dev = dev_eval(str(base / args.ws), f"mm_{name}", dq_dir, dqrel,
                       args.beams, args.topk, prefix_eval=())
        results[name] = {"dev": dev, "train_s": round(time.time() - t0, 1)}
        print(f"   {name}: dev mrr {dev['full']['mrr_10']:.4f} "
              f"rec {dev['full']['recall_10']:.4f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # ---- calibrated phase-3 curriculum on top of one MM variant ----------
    if args.phase3:
        from ripor_tpu.pipeline.flywheel import datagen_round, write_jsonl
        name = args.phase3
        ck = ws.path(f"checkpoints/mm_{name}")
        params = load_params(ck, like=like)
        qrel = load_qrel(str(base / "qrel_queries_train.json"))

        # D^R seeds from THIS checkpoint's dense retrieval (recipe semantics)
        from ripor_tpu.pipeline.full_recipe import _dense_run
        import ripor_tpu.pipeline.recipe as recipe_mod
        docs = Collection(str(base / "docs"))
        embs = recipe_mod.stage_encode_corpus(
            ws, model, params, docs, tok, max_length=64, batch_size=32,
            out_name=f"doc_embeds_mm_{name}.npy")
        run2 = _dense_run(ws, f"dense_run_mm_{name}.json", embs, model,
                          params, tok, queries, docids_l,
                          topk=min(100, len(docids_l)), batch_size=32)
        qid_to_docids = {}
        for qid in queries.ids:
            pos = [str(d) for d, r in qrel.get(str(qid), {}).items() if r > 0]
            cand = [d for d in run2.get(str(qid), {}) if d not in set(pos)]
            if pos or cand:
                qid_to_docids[str(qid)] = pos + cand

        from ripor_tpu.evaluation.reranker import load_bert_teacher, rerank_pairs
        teacher_fn = load_bert_teacher(str(ws.path("checkpoints/bert_teacher")),
                                       tok.vocab_size)
        docs_coll = docs

        def teacher_pair_scores(pairs, query_texts=None):
            return rerank_pairs(teacher_fn, tok,
                                query_texts if query_texts is not None
                                else queries, docs_coll, list(pairs),
                                batch_size=64, max_length=64)

        codes_arr = np.asarray(codes_l)
        curriculum = ([cfg.M] if args.phase3_flat
                      else sorted({p for p in (4, 8, 16, 32)
                                   if p < cfg.M} | {cfg.M}))
        arm = "flat" if args.phase3_flat else "cur"
        ep = args.phase3_epochs * (4 if args.phase3_flat else 1)
        for plen in curriculum:
            ds_path = ws.path(
                f"lng_knp_{name}_{arm}_{plen}.train.json")
            if not ds_path.exists():
                print(f"   phase3 datagen at prefix {plen}", flush=True)
                merged = datagen_round(
                    cfg, params, tok, queries, qid_to_docids, codes_arr,
                    docids_l, teacher_pair_scores, prefix_len=plen,
                    num_beams=10, batch_size=4, decay=2)
                write_jsonl(str(ds_path), merged)
            cal_path = str(ds_path) + ".cal"
            plens = (4, 8, 16) if (plen == cfg.M and not args.phase3_flat) \
                else ()
            stats = calibrate_trainset(
                str(ds_path), cal_path, model, params, tok, queries,
                smtid_as_docid=True, prefix_lengths=plens,
                alphas_out=str(ws.path(f"calibration_{name}_{arm}_{plen}.json")),
                seed=args.seed + plen)
            alphas = {k: round(v, 3) for k, v in stats.items()
                      if k.startswith("alpha")}
            print(f"   [p3 {arm} prefix {plen}] alphas={alphas}", flush=True)
            examples = TeacherScoreExamples(cal_path, smtid_as_docid=True)
            if plen >= 8 and not args.phase3_flat:
                loss_type = "t5seq_aq_encoder_lng_knp_margin_mse"
                prefix = examples.prefix_lengths_present()
            else:
                loss_type = "t5seq_aq_encoder_margin_mse"
                prefix = ()
            coll = MarginMSECollator(tok, queries, None, max_length=64,
                                     smtid_as_docid=True,
                                     prefix_lengths=prefix)
            bz = min(32, len(examples))
            steps = max(1, ep * max(1, len(examples) // bz))
            tcfg = TrainConfig(loss_type=loss_type, learning_rate=1e-4,
                               total_steps=steps)
            trainer = Trainer(model, tcfg, params)
            state, _ = trainer.run(
                batches_from_teacher_examples(examples, coll, bz, epochs=ep,
                                              drop_last=False),
                jax.random.PRNGKey(args.seed + plen))
            params = state.params
        p3name = f"p3_{name}_{arm}"
        save_params(ws.path(f"checkpoints/{p3name}"), params, cfg)
        dev = dev_eval(str(base / args.ws), p3name, dq_dir, dqrel,
                       args.beams, args.topk, prefix_eval=(4, 8))
        results[p3name] = {"dev": dev}
        print(f"   {p3name}: dev mrr {dev['full']['mrr_10']:.4f} "
              f"p4 {dev['prefix4']['mrr_10']:.4f} "
              f"p8 {dev['prefix8']['mrr_10']:.4f}", flush=True)

    out = Path("/tmp/mm_calibrate_sweep.json")
    prev = json.loads(out.read_text()) if out.exists() else {}
    prev.update(results)
    out.write_text(json.dumps(prev, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
