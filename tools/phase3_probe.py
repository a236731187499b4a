"""Measure the rank-vs-seq2seq gradient balance at a phase-2 checkpoint.

The joint phase-3 config (``phase3_joint_seq2seq`` — the reference's
declared ``t5seq_aq_encoder_lng_knp_margin_mse_and_seq2seq``,
/root/reference/t5_pretrainer/arguments.py:97) sums a calibrated MarginMSE
rank term (loss ~1000-2000) with a fitted seq2seq CE (loss ~0.1-5). Loss
MAGNITUDE says nothing about gradient influence, so ``phase3_joint_weight``
should be set from the measured grad-norm ratio, not the loss ratio. This
probe loads a finished proof workspace (tools/curriculum_proof.py), builds
one real batch of each kind at the phase-2 checkpoint, and prints

    ||g_rank||, ||g_s2s||, ratio  (weight w makes w*||g_s2s|| = r*||g_rank||)

Usage: python tools/phase3_probe.py [workspace] [--ckpt phase2_margin_mse]
       [--batches 4]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace", nargs="?",
                    default="/root/repo/.workdir/proof_r5/ws_curriculum")
    ap.add_argument("--ckpt", default="phase2_margin_mse")
    ap.add_argument("--batches", type=int, default=4,
                    help="batches to average per loss")
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from ripor_tpu.data import (Collection, MarginMSECollator,
                                Seq2SeqCollator, Seq2SeqExamples,
                                TeacherScoreExamples,
                                batches_from_seq2seq,
                                batches_from_teacher_examples,
                                load_docid_to_smtid)
    from ripor_tpu.models import RiporConfig, RiporModel
    from ripor_tpu.models.ripor import init_ripor_params
    from ripor_tpu.pipeline.recipe import Workspace, load_tokenizer
    from ripor_tpu.train import load_params
    from ripor_tpu.train import losses as loss_lib

    ws = Workspace(args.workspace)
    tok = load_tokenizer(ws.path("tokenizer.json"))
    ckpt = ws.path(f"checkpoints/{args.ckpt}")
    cfg = RiporConfig.load(str(ckpt / "config.json"))
    model = RiporModel(cfg)
    like = init_ripor_params(jax.random.PRNGKey(0), cfg)
    params = load_params(ckpt, like=like)
    docids, codes = load_docid_to_smtid(str(ws.path("docid_to_smtid.json")))
    d2c = dict(zip(docids, codes))
    # queries live one level above the workspace (proof driver layout)
    queries = Collection(str(Path(args.workspace).parent / "queries_train"))

    # rank batch: the first calibrated phase-3 trainset (prefix 4)
    rank_path = ws.path("lng_knp_qid_smtids_scores_4.train.cal.json")
    if not rank_path.exists():
        rank_path = ws.path("lng_knp_qid_smtids_scores_4.train.json")
    examples = TeacherScoreExamples(str(rank_path), smtid_as_docid=True)
    coll = MarginMSECollator(tok, queries, None, max_length=64,
                             smtid_as_docid=True)
    rank_batches = batches_from_teacher_examples(
        examples, coll, args.batch_size, epochs=1, drop_last=False)

    s2s = Seq2SeqExamples(str(ws.path("query_to_docid.train.jsonl")))
    s2s_batches = batches_from_seq2seq(
        s2s, Seq2SeqCollator(tok, d2c, max_length=32), args.batch_size,
        epochs=1, drop_last=False)

    def grad_norm(loss_name, batch):
        fn = loss_lib.LOSS_FNS[loss_name]

        def total(p):
            parts = fn(model, p, batch, train=False)
            return sum(jnp.asarray(v) for v in parts.values())

        loss, g = jax.value_and_grad(total)(params)
        gn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                          for x in jax.tree_util.tree_leaves(g)))
        return float(loss), float(gn)

    rank_stats, s2s_stats = [], []
    for i, b in zip(range(args.batches), rank_batches):
        rank_stats.append(grad_norm("t5seq_aq_encoder_margin_mse", b))
    for i, b in zip(range(args.batches), s2s_batches):
        s2s_stats.append(grad_norm("t5seq_aq_encoder_seq2seq", b))

    lr = np.mean([s[0] for s in rank_stats])
    gr = np.mean([s[1] for s in rank_stats])
    ls = np.mean([s[0] for s in s2s_stats])
    gs = np.mean([s[1] for s in s2s_stats])
    print(f"rank  (margin_mse, {args.ckpt}): loss {lr:10.3f}  "
          f"||grad|| {gr:10.3f}")
    print(f"s2s   (seq2seq CE,  {args.ckpt}): loss {ls:10.3f}  "
          f"||grad|| {gs:10.3f}")
    print(f"grad ratio ||g_rank||/||g_s2s|| = {gr / gs:.3f}")
    for r in (0.25, 0.5, 1.0):
        print(f"  weight for w*||g_s2s|| = {r:4.2f}*||g_rank||: "
              f"{r * gr / gs:8.2f}")


if __name__ == "__main__":
    main()
