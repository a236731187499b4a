"""Phase-3 training-dynamics sweep over a finished curriculum-proof ws.

The r3 full-size curriculum proof measured phase-3 REGRESSING retrieval
(train mrr 0.94 -> 0.80, dev 0.305 -> 0.17 at the reference's lr 1e-4 /
6 epochs per prefix). The loss and datagen are reference-faithful
(modeling/t5_generative_retriever.py:902-966, aq_preprocess decay merge),
so the regression is a training-dynamics artifact of the small slice:
each query is seen epochs x len(curriculum) times, and the MarginMSE
calibration transient (student raw-score scale vs teacher logit scale)
can reorder what phase 2 built before the margins fit.

This tool iterates on phase-3 hyperparameters WITHOUT re-running the
40-minute recipe: it reuses the finished workspace's phase-2 checkpoint
and the already-generated lng_knp trainsets, trains each variant's phase-3
stack, and dev-evals on the held-out queries.

Usage:
  RIPOR_PROOF_TPU=1 python tools/phase3_sweep.py /tmp/cur_full \
      [--ws ws_curriculum] [--variants asis,short,lowlr,...] [--beams 5]

Writes /tmp/phase3_sweep.json and prints a table.
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")


VARIANTS = {
    # name: (lr, epochs, curriculum or None for full-length-only, heads)
    "asis":        (1e-4, 6, None, True),   # what the proof ran
    "short":       (1e-4, 1, None, True),
    "lowlr":       (3e-5, 6, None, True),
    "lowlr_short": (3e-5, 2, None, True),
    "tiny":        (1e-5, 2, None, True),
    "flat_lowlr":  (3e-5, 8, "flat", False),  # flat arm at the same budget
    # short-prefix stages move the shared codebooks ~8x harder per position
    # (same margin over 4 dots instead of 32) — test starting late
    "late":        (1e-4, 6, (16, 32), True),
    "late_lowlr":  (3e-5, 6, (16, 32), True),
    # the probe shows phase2-mm leaves the student scale uncalibrated
    # (margins 31±48 on a ~500 abs scale vs teacher 11±4): phase 3's MSE
    # then spends its budget on violent recalibration. The reference's
    # phase-2 MM runs 250k steps — calibration happens BEFORE phase 3.
    # mmext: continue phase-2 margin_mse (same trainset) until the scale
    # fits, THEN run the standard curriculum at the reference lr.
    "mmext":       (1e-4, 6, "mmext24", True),
    "mmext_long":  (1e-4, 6, "mmext48", True),
    # the reference's QREL-FIRST refinement stage (full_train_t5seq_aq_
    # encoder.sh:183-230, task t5seq_aq_encoder_lng_knp_margin_mse_sub_
    # smtid): after the curriculum finishes, retrain the full-length lng_knp
    # stage FROM the curriculum-final checkpoint on a trainset whose
    # positive is the QREL smtid with its undecayed teacher rel score
    # (add_qrel_first_create_json_example.py:66-92) instead of the
    # teacher's top candidate — with teacher candidate MRR ~0.78, the
    # teacher-top-first sets actively train a wrong positive on ~22% of
    # rows. Prefix columns follow the reference's qrel-first mapping
    # (create_lng_knp_examples_from_original_examples.py:7-8: {8,16} at
    # mnt 32 — no smtid_4).
    "qrf":         (1e-4, 2, "qrf", True),
    "qrf6":        (1e-4, 6, "qrf", True),
    "qrf_lowlr":   (3e-5, 2, "qrf", True),
    # same transform but trained from PHASE 2 (skipping the teacher-top
    # curriculum entirely) — distinguishes "the curriculum needs the qrf
    # finisher" from "teacher-top-first training is net harm"
    "qrf_p2":      (1e-4, 2, "qrf_p2", True),
    # seq2seq-rehearsal probes for the measured dev bleed (every rank
    # stage costs ~0.01-0.03 dev MRR at medium even with a 0.78-MRR
    # teacher + calibration): rank training moves shared codebooks and
    # the memorized doc->smtid mapping for non-replayed docs decays —
    # the reference DECLARES the countermeasure config
    # t5seq_aq_encoder_lng_knp_margin_mse_and_seq2seq (arguments.py:97,
    # rank + seq2seq jointly) but never shipped its model class.
    # rhs_only: can seq2seq alone RECOVER the bleed from the final ckpt?
    # cur_rhs: curriculum with a 1-epoch seq2seq rehearsal after each
    # rank stage (the alternating-form of the declared joint config).
    "rhs_only":    (1e-3, 2, "rhs_only", True),
    "cur_rhs":     (1e-4, 6, "cur_rhs", True),
}

# reference create_lng_knp_examples_from_original_examples.py:7-8
_QRF_FACTORS = {32: {"smtid_8": 0.75, "smtid_16": 0.875},
                16: {"smtid_8": 0.75 / 0.875},
                8: {"smtid_4": 0.5 / 0.75}}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--ws", default="ws_curriculum")
    ap.add_argument("--variants", default="asis,short,lowlr,lowlr_short")
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--topk", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if os.environ.get("RIPOR_PROOF_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp
    import numpy as np

    from curriculum_proof import dev_eval
    from ripor_tpu.data import (MarginMSECollator, Collection,
                                Seq2SeqCollator, Seq2SeqExamples,
                                TeacherScoreExamples,
                                batches_from_seq2seq,
                                batches_from_teacher_examples,
                                load_docid_to_smtid)
    from ripor_tpu.models import RiporConfig, RiporModel
    from ripor_tpu.models.ripor import init_ripor_params
    from ripor_tpu.pipeline.recipe import Workspace, load_tokenizer
    from ripor_tpu.train import TrainConfig, load_params, save_params
    from ripor_tpu.train.trainer import Trainer

    base = Path(args.workdir)
    ws = Workspace(str(base / args.ws))
    ckpt2 = ws.path("checkpoints/phase2_margin_mse")
    cfg = RiporConfig.load(str(ckpt2 / "config.json"))
    model = RiporModel(cfg, dtype=jnp.bfloat16)
    like = init_ripor_params(jax.random.PRNGKey(0), cfg)
    params2 = load_params(ckpt2, like=like)
    tok = load_tokenizer(ws.path("tokenizer.json"))
    queries = Collection(str(base / "queries_train"))
    dq_dir = str(base / "queries_dev")
    dqrel = str(base / "qrel_queries_dev.json")
    tq_dir = str(base / "queries_train")
    tqrel = str(base / "qrel_queries_train.json")

    curriculum = sorted(p for p in (4, 8, 16, 32) if p <= cfg.M)

    # ---- margin-scale probe on the full-length trainset -------------------
    def margin_probe(params, n=64):
        ds = TeacherScoreExamples(
            ws.path(f"lng_knp_qid_smtids_scores_{cfg.M}.train.json"),
            smtid_as_docid=True)
        coll = MarginMSECollator(tok, queries, None, max_length=64,
                                 smtid_as_docid=True)
        rng = np.random.default_rng(0)
        samples = [ds.sample_pair(i % len(ds), rng) for i in range(n)]
        b = coll(samples)

        # jit: un-jitted apply through the axon relay dispatches per-op
        @jax.jit
        def scores(params, qi, qm, pos, neg):
            def fwd(codes):
                return model.apply({"params": params}, qi, qm, codes,
                                   deterministic=True)
            pd = model.apply({"params": params}, pos,
                             method=RiporModel.doc_embeds)
            nd = model.apply({"params": params}, neg,
                             method=RiporModel.doc_embeds)
            sp = jnp.sum(fwd(pos).astype(jnp.float32)
                         * pd.astype(jnp.float32), (-1, -2))
            sn = jnp.sum(fwd(neg).astype(jnp.float32)
                         * nd.astype(jnp.float32), (-1, -2))
            return sp, sn

        sp, sn = scores(params, b["query_ids"], b["query_mask"],
                        b["pos_codes"], b["neg_codes"])
        sm = np.asarray(sp - sn)
        tm = b["teacher_pos_score"] - b["teacher_neg_score"]
        return {"student_margin_mean": float(sm.mean()),
                "student_margin_std": float(sm.std()),
                "student_abs_pos": float(np.abs(np.asarray(sp)).mean()),
                "teacher_margin_mean": float(tm.mean()),
                "teacher_margin_std": float(tm.std())}

    results = {"probe_phase2": margin_probe(params2)}
    print("phase2 margin probe:", json.dumps(results["probe_phase2"]),
          flush=True)

    def mm_extend(params, extra_epochs, lr=1e-4):
        """Continue phase-2 margin_mse on its own trainset (docid-based)
        to calibrate the student score scale before phase 3 — the
        reference's 250k-step phase-2 MM does this implicitly."""
        docids_l, codes_l = load_docid_to_smtid(
            str(ws.path("docid_to_smtid.json")))
        d2c = dict(zip(docids_l, codes_l))
        examples = TeacherScoreExamples(ws.path("phase2_mm_trainset.jsonl"))
        coll = MarginMSECollator(tok, queries, d2c, max_length=64)
        bz = min(32, len(examples))
        steps = max(1, extra_epochs * max(1, len(examples) // bz))
        tcfg = TrainConfig(loss_type="t5seq_aq_encoder_margin_mse",
                           learning_rate=lr, total_steps=steps)
        trainer = Trainer(model, tcfg, params)
        state, _ = trainer.run(
            batches_from_teacher_examples(examples, coll, bz,
                                          epochs=extra_epochs,
                                          drop_last=False),
            jax.random.PRNGKey(args.seed + 999))
        return state.params

    def build_qrf_trainset():
        """Reference add_qrel_first_create_json_example.py:66-92 applied to
        the workspace's decay-merged full-length rankdata: one example per
        (qid, rel docid) with the QREL smtid + undecayed teacher rel score
        first, the merged (already-decayed) candidates after; prefix
        columns per the reference's qrel-first factor mapping."""
        path = ws.path(f"qrf_lng_knp_{cfg.M}.train.json")
        if path.exists():
            return path
        relp = ws.path("qid_to_reldocid_to_score.refresh.json")
        if not relp.exists():
            relp = ws.path("qid_to_reldocid_to_score.json")
        rel = json.loads(relp.read_text())
        docids_l, codes_l = load_docid_to_smtid(
            str(ws.path("docid_to_smtid.json")))
        p_str = {str(d): "_".join(str(x) for x in c)
                 for d, c in zip(docids_l, codes_l)}
        factors = _QRF_FACTORS[cfg.M]
        rows = [json.loads(l) for l in
                open(ws.path(f"lng_knp_qid_smtids_scores_{cfg.M}.train.json"))
                if l.strip()]
        with open(path, "w") as f:
            for row in rows:
                qid = str(row["qid"])
                for reldocid, relscore in rel.get(qid, {}).items():
                    ex = {"qid": qid,
                          "smtids": [p_str[str(reldocid)]] + row["smtids"],
                          "scores": [float(relscore)] + row["scores"]}
                    for k, fa in factors.items():
                        ex[f"{k}_scores"] = [s * fa for s in ex["scores"]]
                    f.write(json.dumps(ex) + "\n")
        return path

    def s2s_rehearse(params, epochs=1, lr=1e-3):
        """One pass of phase-2's seq2seq trainset (pseudo-queries for ALL
        docs + train queries) to re-anchor the doc->smtid mapping that
        rank training erodes."""
        docids_l, codes_l = load_docid_to_smtid(
            str(ws.path("docid_to_smtid.json")))
        d2c = dict(zip(docids_l, codes_l))
        s2s = Seq2SeqExamples(ws.path("query_to_docid.train.jsonl"))
        bz = min(32, len(s2s))
        steps = max(1, epochs * max(1, len(s2s) // bz))
        tcfg = TrainConfig(loss_type="t5seq_aq_encoder_seq2seq",
                           learning_rate=lr, total_steps=steps)
        trainer = Trainer(model, tcfg, params)
        state, _ = trainer.run(
            batches_from_seq2seq(s2s, Seq2SeqCollator(tok, d2c,
                                                      max_length=32),
                                 bz, epochs=epochs, drop_last=False),
            jax.random.PRNGKey(args.seed + 4242))
        return state.params

    def train_variant(name, lr, epochs, plan, heads):
        params = params2
        if plan == "rhs_only":
            params = load_params(ws.path("checkpoints/final"), like=like)
            params = s2s_rehearse(params, epochs=epochs, lr=lr)
            save_params(ws.path(f"checkpoints/sweep_{name}"), params, cfg)
            return params
        if plan in ("qrf", "qrf_p2"):
            if plan == "qrf":
                params = load_params(ws.path("checkpoints/final"), like=like)
            src = build_qrf_trainset()
            cal = ws.path(f"qrf_lng_knp_{cfg.M}.{name}.cal.json")
            from ripor_tpu.train.calibrate import calibrate_trainset
            st = calibrate_trainset(str(src), str(cal), model, params, tok,
                                    queries, smtid_as_docid=True,
                                    prefix_lengths=(4, 8, 16),
                                    seed=args.seed)
            print(f"   qrf calibration alpha={st['alpha']:.3f}", flush=True)
            examples = TeacherScoreExamples(str(cal), smtid_as_docid=True)
            prefix = examples.prefix_lengths_present() if heads else ()
            coll = MarginMSECollator(tok, queries, None, max_length=64,
                                     smtid_as_docid=True,
                                     prefix_lengths=prefix)
            bz = min(32, len(examples))
            steps = max(1, epochs * max(1, len(examples) // bz))
            tcfg = TrainConfig(
                loss_type=("t5seq_aq_encoder_lng_knp_margin_mse" if prefix
                           else "t5seq_aq_encoder_margin_mse"),
                learning_rate=lr, total_steps=steps)
            trainer = Trainer(model, tcfg, params)
            state, _ = trainer.run(
                batches_from_teacher_examples(examples, coll, bz,
                                              epochs=epochs,
                                              drop_last=False),
                jax.random.PRNGKey(args.seed + 777))
            save_params(ws.path(f"checkpoints/sweep_{name}"), state.params,
                        cfg)
            return state.params
        if isinstance(plan, str) and plan.startswith("mmext"):
            params = mm_extend(params, int(plan[5:]))
            print(f"   post-mmext probe: "
                  f"{json.dumps(margin_probe(params))}", flush=True)
            # the extended phase-2 is the variant's true baseline: save +
            # eval it so the gate compares curriculum against IT
            save_params(ws.path(f"checkpoints/sweep_{name}_mmonly"),
                        params, cfg)
            stages = curriculum
        elif plan is None or plan == "cur_rhs":
            stages = curriculum
        elif plan == "flat":
            stages = [cfg.M]
        else:
            stages = list(plan)
        for plen in stages:
            ds_path = ws.path(f"lng_knp_qid_smtids_scores_{plen}.train.json")
            examples = TeacherScoreExamples(ds_path, smtid_as_docid=True)
            if plen >= 8 and heads:
                loss_type = "t5seq_aq_encoder_lng_knp_margin_mse"
                prefix = examples.prefix_lengths_present()
            else:
                loss_type = "t5seq_aq_encoder_margin_mse"
                prefix = ()
            coll = MarginMSECollator(tok, queries, None, max_length=64,
                                     smtid_as_docid=True,
                                     prefix_lengths=prefix)
            bz = min(32, len(examples))
            steps = max(1, epochs * max(1, len(examples) // bz))
            tcfg = TrainConfig(loss_type=loss_type, learning_rate=lr,
                               total_steps=steps)
            trainer = Trainer(model, tcfg, params)
            state, _ = trainer.run(
                batches_from_teacher_examples(examples, coll, bz,
                                              epochs=epochs,
                                              drop_last=False),
                jax.random.PRNGKey(args.seed + plen))
            params = state.params
            if plan == "cur_rhs":
                params = s2s_rehearse(params, epochs=1)
        save_params(ws.path(f"checkpoints/sweep_{name}"), params, cfg)
        return params

    chosen = [v for v in args.variants.split(",") if v]
    for name in chosen:
        lr, epochs, plan, heads = VARIANTS[name]
        t0 = time.time()
        print(f"== variant {name}: lr={lr} epochs={epochs} "
              f"plan={plan or 'curriculum'} heads={heads}", flush=True)
        p = train_variant(name, lr, epochs, plan, heads)
        dt = time.time() - t0
        dev = dev_eval(str(base / args.ws), f"sweep_{name}", dq_dir, dqrel,
                       args.beams, args.topk, prefix_eval=())
        # distinct tag: same ckpt, different query set — without it the
        # train eval silently reuses the cached dev run file (r3 footgun)
        trn = dev_eval(str(base / args.ws), f"sweep_{name}", tq_dir, tqrel,
                       args.beams, args.topk, prefix_eval=(),
                       tag=f"sweep_{name}_train")
        results[name] = {"dev": dev, "train": trn,
                         "probe": margin_probe(p), "train_s": round(dt, 1)}
        print(f"   {name}: dev mrr {dev['full']['mrr_10']:.4f} "
              f"train mrr {trn['full']['mrr_10']:.4f} ({dt:.0f}s)",
              flush=True)
        mmonly = ws.path(f"checkpoints/sweep_{name}_mmonly")
        if (mmonly / "params").exists():
            mdev = dev_eval(str(base / args.ws), f"sweep_{name}_mmonly",
                            dq_dir, dqrel, args.beams, args.topk,
                            prefix_eval=())
            results[f"{name}_mmonly"] = {"dev": mdev}
            print(f"   {name}_mmonly (extended phase2 baseline): "
                  f"dev mrr {mdev['full']['mrr_10']:.4f}", flush=True)

    # baseline rows from the proof's own checkpoints
    for tag, ck in (("phase2", "phase2_margin_mse"), ("phase3_asrun",
                                                     "final")):
        dev = dev_eval(str(base / args.ws), ck, dq_dir, dqrel,
                       args.beams, args.topk, prefix_eval=())
        trn = dev_eval(str(base / args.ws), ck, tq_dir, tqrel,
                       args.beams, args.topk, prefix_eval=(),
                       tag=f"{ck}_train")
        results[tag] = {"dev": dev, "train": trn}
        print(f"   {tag}: dev mrr {dev['full']['mrr_10']:.4f} "
              f"train mrr {trn['full']['mrr_10']:.4f}", flush=True)

    Path("/tmp/phase3_sweep.json").write_text(json.dumps(results, indent=1))
    print("wrote /tmp/phase3_sweep.json")


if __name__ == "__main__":
    main()
