"""Per-epoch dynamics of the phase-3 mnt_4 stage — the collapse microscope.

r4 state of evidence: calibration (train/calibrate.py) fixed phase-2 MM
(dev MRR 0.280 >= seq2seq's 0.267) but the calibrated phase-3 curriculum
on top of mm_cal2 still collapses dev MRR 0.280 -> 0.029 (/tmp/p3cal.log),
and the teacher's OWN smtid-level ranking of the trainset candidates is
healthy (MRR@10 ~0.655 at every prefix length, rel prefix always present)
— so the targets are fine and the failure is in the training itself.

This tool disambiguates the two remaining hypotheses by training ONLY the
first curriculum stage (mnt_4, reference full_lng_knp_train_pipline.sh:
27-46) one epoch at a time from the mm_cal2 checkpoint and measuring,
after every epoch:

  * trainset FIT: the student's own prefix-4 ranking of each example's
    candidate smtids (MRR of the qrel-positive prefix) + Pearson corr
    with the teacher's scores — does the student move TOWARD the target?
  * margin MSE on a fixed (pos, neg) sample — does the loss even fall?
  * dev full-length beam MRR + dev prefix-4 MRR — what generalization
    pays for the fit.

fit UP + dev DOWN  -> objective misaligned at slice scale (memorizes
                      train-query margins, distorts the shared score
                      surface for everything else);
fit FLAT/DOWN      -> optimization failure (lr/step/precision bug).

Usage: python tools/mnt4_dynamics.py /tmp/cur_v2 [--epochs 6] [--beams 5]
Writes /tmp/mnt4_dynamics.json.
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
    ap.add_argument("workdir")
    ap.add_argument("--ws", default="ws_curriculum")
    ap.add_argument("--ckpt", default="mm_cal2")
    ap.add_argument("--trainset", default="lng_knp_cal2_cur_4.train.json.cal")
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--beams", type=int, default=5)
    ap.add_argument("--fit-queries", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    if os.environ.get("RIPOR_PROOF_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from curriculum_proof import dev_eval
    from ripor_tpu.data import (Collection, MarginMSECollator,
                                TeacherScoreExamples,
                                batches_from_teacher_examples, load_qrel)
    from ripor_tpu.models import RiporConfig, RiporModel
    from ripor_tpu.models.ripor import init_ripor_params
    from ripor_tpu.pipeline.recipe import Workspace, load_tokenizer
    from ripor_tpu.train import TrainConfig, load_params, save_params
    from ripor_tpu.train.trainer import Trainer

    base = Path(args.workdir)
    ws = Workspace(str(base / args.ws))
    ck = ws.path(f"checkpoints/{args.ckpt}")
    cfg = RiporConfig.load(str(ck / "config.json"))
    model = RiporModel(cfg)
    like = init_ripor_params(jax.random.PRNGKey(0), cfg)
    params = load_params(ck, like=like)
    tok = load_tokenizer(ws.path("tokenizer.json"))
    queries = Collection(str(base / "queries_train"))
    qrel = load_qrel(str(base / "qrel_queries_train.json"))
    d2s = json.loads(ws.path("docid_to_smtid.json").read_text())

    examples = TeacherScoreExamples(ws.path(args.trainset),
                                    smtid_as_docid=True)
    plen = len(examples.examples[0]["smtids"][0].split("_"))
    print(f"trainset {args.trainset}: {len(examples)} rows, prefix {plen}",
          flush=True)

    # ---- fit probe --------------------------------------------------------
    NCAND = max(len(ex["smtids"]) for ex in examples.examples[:args.fit_queries])
    from ripor_tpu.data.tokenizer import tokenize_queries

    @jax.jit
    def cand_scores(p, qi, qm, codes):
        # qi/qm [1, L] broadcast over NCAND candidate prefixes [N, plen]
        qi = jnp.broadcast_to(qi, (codes.shape[0], qi.shape[1]))
        qm = jnp.broadcast_to(qm, (codes.shape[0], qm.shape[1]))
        h = model.apply({"params": p}, qi, qm, codes, deterministic=True)
        d = model.apply({"params": p}, codes, method=RiporModel.doc_embeds)
        return jnp.sum(h.astype(jnp.float32) * d.astype(jnp.float32),
                       (-1, -2))

    rows = []
    for ex in examples.examples[:args.fit_queries]:
        qid = str(ex["qid"])
        rel = {"_".join(str(c) for c in d2s[d][1:1 + plen])
               for d, r in qrel.get(qid, {}).items() if r > 0}
        cand = ex["smtids"][:NCAND]
        codes = np.zeros((NCAND, plen), np.int32)
        for i, s in enumerate(cand):
            codes[i] = [int(x) for x in s.split("_")]
        n = len(cand)
        ids, mask = tokenize_queries(tok, [queries[qid]], 64)
        rows.append((qid, rel, cand, codes, n, ids, mask,
                     np.asarray(ex["scores"][:NCAND], np.float64)))

    def fit_probe(p):
        rr, corrs = [], []
        for qid, rel, cand, codes, n, ids, mask, tscores in rows:
            s = np.asarray(cand_scores(p, jnp.asarray(ids), jnp.asarray(mask),
                                       jnp.asarray(codes)), np.float64)[:n]
            order = np.argsort(-s)
            rank = next((i + 1 for i, j in enumerate(order[:10])
                         if cand[j] in rel), None)
            rr.append(1.0 / rank if rank else 0.0)
            if n > 2 and tscores[:n].std() > 1e-9 and s.std() > 1e-9:
                corrs.append(float(np.corrcoef(s, tscores[:n])[0, 1]))
        return {"fit_mrr_10": float(np.mean(rr)),
                "teacher_corr": float(np.mean(corrs))}

    # fixed (pos, neg) margin sample for the MSE trajectory
    coll = MarginMSECollator(tok, queries, None, max_length=64,
                             smtid_as_docid=True)
    rng = np.random.default_rng(args.seed)
    msamp = [examples.sample_pair(int(rng.integers(len(examples))), rng)
             for _ in range(128)]
    mb = coll(msamp)

    @jax.jit
    def margin_mse_probe(p, qi, qm, pos, neg, tp, tn):
        def sc(codes):
            h = model.apply({"params": p}, qi, qm, codes, deterministic=True)
            d = model.apply({"params": p}, codes,
                            method=RiporModel.doc_embeds)
            return jnp.sum(h.astype(jnp.float32) * d.astype(jnp.float32),
                           (-1, -2))
        m = sc(pos) - sc(neg)
        t = (tp - tn).astype(jnp.float32)
        return jnp.mean((m - t) ** 2), jnp.mean(m), jnp.std(m)

    def mse_probe(p):
        mse, mm_, ms = margin_mse_probe(
            p, jnp.asarray(mb["query_ids"]), jnp.asarray(mb["query_mask"]),
            jnp.asarray(mb["pos_codes"]), jnp.asarray(mb["neg_codes"]),
            jnp.asarray(mb["teacher_pos_score"]),
            jnp.asarray(mb["teacher_neg_score"]))
        return {"margin_mse": float(mse), "student_margin_mean": float(mm_),
                "student_margin_std": float(ms)}

    dq_dir = str(base / "queries_dev")
    dqrel = str(base / "qrel_queries_dev.json")

    results = {"config": vars(args), "epochs": {}}

    def full_eval(tag_params, tag):
        save_params(ws.path(f"checkpoints/{tag}"), tag_params, cfg)
        dev = dev_eval(str(base / args.ws), tag, dq_dir, dqrel,
                       args.beams, 10, prefix_eval=(4,), tag=tag)
        return {"dev_full_mrr": dev["full"]["mrr_10"],
                "dev_prefix4_mrr": dev["prefix4"]["mrr_10"],
                "dev_full_recall": dev["full"]["recall_10"]}

    e0 = {**fit_probe(params), **mse_probe(params),
          **full_eval(params, "mnt4dyn_ep0")}
    results["epochs"]["0"] = e0
    print(f"ep0: {json.dumps(e0)}", flush=True)

    bz = 32
    for ep in range(1, args.epochs + 1):
        t0 = time.time()
        steps = max(1, len(examples) // bz)
        tcfg = TrainConfig(loss_type="t5seq_aq_encoder_margin_mse",
                           learning_rate=args.lr, total_steps=steps)
        trainer = Trainer(model, tcfg, params)
        state, _ = trainer.run(
            batches_from_teacher_examples(examples, coll, bz, epochs=1,
                                          drop_last=False),
            jax.random.PRNGKey(args.seed + ep))
        params = state.params
        e = {**fit_probe(params), **mse_probe(params),
             **full_eval(params, f"mnt4dyn_ep{ep}"),
             "train_s": round(time.time() - t0, 1)}
        results["epochs"][str(ep)] = e
        print(f"ep{ep}: {json.dumps(e)}", flush=True)

    Path("/tmp/mnt4_dynamics.json").write_text(json.dumps(results, indent=1))
    print("wrote /tmp/mnt4_dynamics.json")


if __name__ == "__main__":
    main()
