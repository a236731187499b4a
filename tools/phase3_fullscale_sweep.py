"""Full-scale phase-3 anti-forgetting variant sweep (round 4).

The r4 full-scale proof run localized the curriculum FAIL to the rehearsal
dose (artifacts/phase3_dynamics_r4.md): the first rank stage GAINS dev MRR
(+0.005) and the lr-1e-3 rehearsal pass that follows wipes it (-0.032) —
at 2400 docs the rehearsal trainset is ~255 steps/epoch of already-fit
(loss 0.089) high-lr codebook perturbation. This driver measures the three
mechanism-level fixes at the proof's full scale, sharing phase 1+2
bit-for-bit across variants (clone_through_phase2):

  no_rhs  rehearsal off — rank stages alone (the r4 per-stage table says
          erosion at 40% doc-coverage may be small enough to not need it)
  joint   the reference's DECLARED joint config (arguments.py:97):
          every rank batch carries a seq2seq sub-batch at the rank lr —
          the anti-forgetting dose scales with rank steps, not corpus size
  gentle  alternating rehearsal kept, lr 1e-3 -> 1e-4

Writes artifacts/phase3_fullscale_sweep.json incrementally (crash-safe)
with per-variant final + per-stage held-out dev metrics. The winner's
workspace is `<workdir>/ws_v_<name>`; rename it to `<workdir>/ws_curriculum`
and re-run tools/curriculum_proof.py with the matching flags + the same
workdir to produce the gated proof artifact without re-training phase 1+2.

Usage: python tools/phase3_fullscale_sweep.py [workdir] \
          [--variants no_rhs,joint,gentle] [--size full]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from curriculum_proof import build_corpus, clone_through_phase2, dev_eval

SIZES = {
    "medium": (dict(n_clusters=60, docs_per_cluster=10, n_train_q=120,
                    n_dev_q=60),
               dict(M=16, K=64, phase1_epochs=4, teacher_epochs=60,
                    s2s_epochs=60, mm_epochs=6, phase3_epochs=6,
                    num_beams=5, topk=10, batch_size=32)),
    # n_dev_q 240 since r5 (matches tools/curriculum_proof.py full size —
    # the corpus rng stream is call-order stable so docs/train queries are
    # identical to the r4 sweep and the first 120 dev queries are its set)
    "full": (dict(n_clusters=120, docs_per_cluster=20, n_train_q=960,
                  n_dev_q=240),
             dict(M=32, K=256, phase1_epochs=4, teacher_epochs=60,
                  s2s_epochs=60, mm_epochs=6, phase3_epochs=2,
                  num_beams=5, topk=10, batch_size=32,
                  datagen_num_beams=10)),
}

VARIANTS = {
    "no_rhs": dict(phase3_seq2seq_rehearsal=False),
    "joint": dict(phase3_seq2seq_rehearsal=False, phase3_joint_seq2seq=True),
    "gentle": dict(phase3_seq2seq_rehearsal=True, phase3_rehearsal_lr=1e-4),
    # the r4 FAIL configuration, for reference only
    "rhs_1e3": dict(phase3_seq2seq_rehearsal=True, phase3_rehearsal_lr=1e-3),
    # --- r5 arms (diagnosis: tools/phase3_probe.py + /tmp/diag_dev —
    # conditional on beam survival the rank stages IMPROVE dev ranking
    # (0.611 -> 0.631); the whole regression is SURVIVAL loss (recall
    # 0.475 -> 0.421) concentrated on docs that appear in rank training
    # only as negatives, i.e. every dev positive by construction) ---
    # fixed anti-forgetting dose: the medium rung's proven ~60 steps at
    # lr 1e-3 per stage, decoupled from corpus size
    "cap60": dict(phase3_seq2seq_rehearsal=True, phase3_rehearsal_lr=1e-3,
                  phase3_rehearsal_max_steps=60),
    # joint with the seq2seq term weighted to the MEASURED grad-norm
    # ratio: at the eroded endpoint ||g_rank||/||g_s2s|| = 1210
    # (phase3_probe --ckpt phase3_mnt_32), so w=300 makes the restoring
    # spring ~25% of the rank gradient when eroded and ~5% when fit
    # (ratio 5594 at phase2); w=1000 is the stiff-spring arm
    "jw300": dict(phase3_seq2seq_rehearsal=False, phase3_joint_seq2seq=True,
                  phase3_joint_weight=300.0),
    "jw1000": dict(phase3_seq2seq_rehearsal=False, phase3_joint_seq2seq=True,
                   phase3_joint_weight=1000.0),
    # pseudo-queries as rank-training POSITIVES (full_recipe.py
    # phase3_pseudo_rank): the survival-loss diagnosis says dev positives
    # erode because rank training gives them only negative gradient —
    # one teacher-filtered pseudo-query per doc puts every doc on the
    # positive side of the margin loss at the rank lr, inside the same
    # stage. Reference analogue: the pseudo-query flywheel feeding the
    # rank pool (aq_preprocess/create_pseudo_query_to_docid_map.py).
    "pq1": dict(phase3_seq2seq_rehearsal=False, phase3_pseudo_rank=1),
    "jw1000_pq1": dict(phase3_seq2seq_rehearsal=False,
                       phase3_joint_seq2seq=True,
                       phase3_joint_weight=1000.0, phase3_pseudo_rank=1),
    # --- r5 round 3 arms ---
    # pq1 MEASURED DEAD END (0.077 full): cluster-generic pseudo-queries
    # are teacher-ambiguous — 78% of pq rows score a same-cluster
    # NEIGHBOUR above the own doc, so MarginMSE actively pushes each doc
    # below its cluster-mates at 3x dose (full_recipe.py docstring);
    # jw1000_pq1 was killed mid-run (same poisoned trainset).
    # L2-SP spring (trainer.py l2sp_rate, full_recipe.py phase3_l2sp):
    # decoupled per-step pull r toward the phase-2 params during the rank
    # stages. Unopposed random-walk drift reaches stationary scale
    # ~lr*sqrt(1/2r); consistent learning signal can still travel ~lr/r.
    # At phase3_lr 1e-4 / ~60 steps/stage: r=3e-3 is a soft spring
    # (signal cap 0.033 >> typical movement), r=1e-2 medium (cap 0.01,
    # also relaxes ~45% of inherited drift per stage), r=3e-2 stiff
    # (cap 3.3e-3 — near-frozen mapping, tests whether ANY rank-stage
    # drift is needed for the conditional-ranking gains).
    "l2sp3e3": dict(phase3_seq2seq_rehearsal=False, phase3_l2sp=3e-3),
    "l2sp1e2": dict(phase3_seq2seq_rehearsal=False, phase3_l2sp=1e-2),
    "l2sp3e2": dict(phase3_seq2seq_rehearsal=False, phase3_l2sp=3e-2),
    # one more point on the monotone jw ladder (300 -> 1000 gained
    # +0.012 full / +0.013 recall; extrapolation says w must rise until
    # the seq2seq term matches the rank grad when FIT, ratio 5594)
    "jw3000": dict(phase3_seq2seq_rehearsal=False, phase3_joint_seq2seq=True,
                   phase3_joint_weight=3000.0),
    # --- r5 round 4: deep negative mining (reference-faithful) ---
    # The reference mines its sub-smtid rankdata at top-1000
    # (full_evaluate_t5seq_aq_encoder.sh:186-199, out_docid_from_sub_*_
    # top1000); our datagen mined at beam 10 — under the beam-100 gate
    # (the reference's eval protocol) the model never trains against the
    # rank-10..100 competitors that crowd positives out of the top-10.
    "dg100": dict(phase3_seq2seq_rehearsal=False, datagen_num_beams=100),
    "jw1000_dg100": dict(phase3_seq2seq_rehearsal=False,
                         phase3_joint_seq2seq=True,
                         phase3_joint_weight=1000.0,
                         datagen_num_beams=100),
    # jw ladder extension (b100/480q gate: jw3000 is the first arm ABOVE
    # phase2, +0.0018, and the ladder is still monotone 300->1000->3000)
    "jw10000": dict(phase3_seq2seq_rehearsal=False,
                    phase3_joint_seq2seq=True,
                    phase3_joint_weight=10000.0),
    "jw3000_dg100": dict(phase3_seq2seq_rehearsal=False,
                         phase3_joint_seq2seq=True,
                         phase3_joint_weight=3000.0,
                         datagen_num_beams=100),
    # dose-up with the anchor in place (jw1000's per-stage trend RISES
    # 0.2712 -> 0.2767; with the CE anchor holding the mapping, more rank
    # epochs may extract more conditional-ranking gain)
    "jw3000_e4": dict(phase3_seq2seq_rehearsal=False,
                      phase3_joint_seq2seq=True,
                      phase3_joint_weight=3000.0, phase3_epochs=4),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?",
                    default="/root/repo/.workdir/p3sweep")
    ap.add_argument("--variants", default="no_rhs,joint,gentle")
    ap.add_argument("--size", choices=list(SIZES), default="full")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--clone-from", default=None,
                    help="existing finished workspace to clone phase 1+2 "
                         "from for EVERY variant (e.g. the gated proof's "
                         "ws_curriculum) instead of training the first "
                         "variant from scratch")
    ap.add_argument("--tag", default="",
                    help="suffix for the artifact name, so a re-sweep at "
                         "new settings doesn't overwrite a committed one")
    args = ap.parse_args()

    # default to CPU; RIPOR_PROOF_TPU=1 keeps the chip backend (same contract
    # as tools/curriculum_proof.py). On the 1-core build VMs the full-scale
    # recipe is CPU-infeasible (~28.8k teacher steps at ~3 steps/s alone) —
    # the chip path with the persistent compile cache is the practical one.
    import jax
    if os.environ.get("RIPOR_PROOF_TPU", "0") != "1":
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    base = Path(args.workdir)
    base.mkdir(parents=True, exist_ok=True)
    sizes, run_kw = SIZES[args.size]
    docs_dir, tq_dir, tqrel, dq_dir, dqrel = build_corpus(
        base, seed=args.seed, **sizes)
    n_docs = sizes["n_clusters"] * sizes["docs_per_cluster"]
    print(f"corpus: {n_docs} docs / {sizes['n_train_q']} train q / "
          f"{sizes['n_dev_q']} dev q", flush=True)

    from ripor_tpu.pipeline.full_recipe import run_full_recipe

    # identical to tools/curriculum_proof.py full-size `common` (the
    # measured r4 teacher/calibration configuration) minus the rehearsal
    # knobs the variants set themselves
    common = dict(docs_dir=docs_dir, queries_dir=tq_dir, qrel_path=tqrel,
                  vocab_size=8 * sizes["n_clusters"] + n_docs + 50,
                  tokenizer_kind="word", seed=args.seed,
                  pseudo_queries_per_doc=3, min_teacher_margin=1.0,
                  calibrate_teacher_scale=True,
                  teacher_geometry=dict(d_model=128, num_layers=4,
                                        num_heads=8, d_ff=512,
                                        max_position=128),
                  teacher_lr=3e-4, teacher_warmup=0.1,
                  teacher_refresh=True, min_teacher_mrr=0.78,
                  **run_kw)

    art = Path("/root/repo/artifacts")
    art.mkdir(exist_ok=True)
    tag = f"_{args.tag}" if args.tag else ""
    out_path = art / f"phase3_fullscale_sweep_{args.size}{tag}.json"
    results = (json.loads(out_path.read_text()) if out_path.exists()
               else {"corpus": sizes, "variants": {}})

    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    ws_first = args.clone_from
    for vi, name in enumerate(variants):
        kw = VARIANTS[name]
        ws = str(base / f"ws_v_{name}")
        if ws_first is not None:
            clone_through_phase2(ws_first, ws)
        t0 = time.time()
        # dict-merge (not f(**common, **kw)): variants may OVERRIDE common
        # keys (e.g. datagen_num_beams in the dg arms) — duplicate kwargs
        # would raise
        m = run_full_recipe(workspace=ws, **{**common, **kw})
        if ws_first is None:
            ws_first = ws
        print(f"[{name}] recipe done in {time.time()-t0:.0f}s", flush=True)

        entry = {"train_metrics": m, "wall_s": round(time.time() - t0, 1)}
        if "phase2" not in results:
            results["phase2"] = dev_eval(
                ws, "phase2_margin_mse", dq_dir, dqrel,
                run_kw["num_beams"], run_kw["topk"])
            print(f"phase2 dev: {results['phase2']['full']}", flush=True)
        entry["dev"] = dev_eval(ws, "final", dq_dir, dqrel,
                                run_kw["num_beams"], run_kw["topk"],
                                tag=f"final_{name}")
        entry["per_stage"] = {}
        M = run_kw["M"]
        stages = []
        for p in sorted({q for q in (4, 8, 16, 32) if q < M} | {M}):
            stages += [f"phase3_mnt_{p}", f"phase3_s2s_rhs_{p}"]
        for st in stages:
            if not (Path(ws) / "checkpoints" / st / "params").exists():
                continue
            entry["per_stage"][st] = dev_eval(
                ws, st, dq_dir, dqrel, run_kw["num_beams"],
                run_kw["topk"], prefix_eval=(), tag=f"{st}_{name}")["full"]
            print(f"   [{name}] {st}: "
                  f"mrr {entry['per_stage'][st]['mrr_10']:.4f}", flush=True)
        results["variants"][name] = entry
        out_path.write_text(json.dumps(results, indent=1))
        print(f"[{name}] dev full mrr@10 "
              f"{entry['dev']['full']['mrr_10']:.4f} "
              f"p4 {entry['dev']['prefix4']['mrr_10']:.4f} "
              f"p8 {entry['dev']['prefix8']['mrr_10']:.4f}", flush=True)

    p2 = results["phase2"]["full"]["mrr_10"]
    print(f"\n== sweep results (phase2 dev mrr@10 {p2:.4f}) ==")
    print(f"{'variant':10s} {'full':>8s} {'p4':>8s} {'p8':>8s} {'gate':>6s}")
    for name, e in results["variants"].items():
        d = e["dev"]
        print(f"{name:10s} {d['full']['mrr_10']:8.4f} "
              f"{d['prefix4']['mrr_10']:8.4f} {d['prefix8']['mrr_10']:8.4f} "
              f"{'PASS' if d['full']['mrr_10'] > p2 else 'fail':>6s}")
    print(f"artifact: {out_path}")


if __name__ == "__main__":
    main()
