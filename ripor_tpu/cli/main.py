"""CLI entry points: train / index / retrieve / evaluate / e2e.

Replaces the reference's three CLIs (t5_pretrainer/main.py, evaluate.py,
rerank.py) + bash pipelines. JSON config in, artifacts in a workspace dir.

Usage:
  python -m ripor_tpu.cli.main e2e --workspace ws --docs docs_dir \
      --queries queries_dir --qrel qrel.json [--config overrides.json]
  python -m ripor_tpu.cli.main evaluate --qrel qrel.json --run run.json \
      --metric mrr_10
  python -m ripor_tpu.cli.main train --config train.json
  python -m ripor_tpu.cli.main retrieve --workspace ws --queries qdir \
      --beam 100 --topk 100
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def cmd_evaluate(args):
    from ripor_tpu.evaluation import load_and_evaluate
    out = {}
    for metric in args.metric:
        out.update(load_and_evaluate(args.qrel, args.run, metric))
    print(json.dumps(out, indent=2))


def _load_workspace_model(ws_dir: str, phase: str = "final"):
    import jax.numpy as jnp
    from ripor_tpu.models import RiporConfig, RiporModel
    from ripor_tpu.models.ripor import init_ripor_params
    import jax
    from ripor_tpu.pipeline.recipe import Workspace
    from ripor_tpu.train import load_params

    ws = Workspace(ws_dir)
    ckpt = ws.path(f"checkpoints/{phase}")
    cfg = RiporConfig.load(ckpt / "config.json")
    model = RiporModel(cfg, dtype=jnp.bfloat16)
    like = init_ripor_params(jax.random.PRNGKey(0), cfg)
    params = load_params(ckpt, like=like)
    return ws, cfg, model, params


def cmd_retrieve(args):
    import jax.numpy as jnp
    from ripor_tpu.data import Collection, UnigramTokenizer, load_docid_to_smtid
    from ripor_tpu.pipeline.recipe import Workspace, stage_build_trie, stage_retrieve

    ws, cfg, model, params = _load_workspace_model(args.workspace, args.phase)
    tok = UnigramTokenizer.load(ws.path("tokenizer.json"))
    docids, codes = load_docid_to_smtid(ws.path("docid_to_smtid.json"))
    trie = stage_build_trie(ws, codes, cfg.K)
    queries = Collection(args.queries)
    run = stage_retrieve(ws, cfg, params, tok, queries, trie, docids,
                         num_beams=args.beam, topk=args.topk,
                         run_name=args.run_name)
    print(f"wrote {ws.path(args.run_name)} ({len(run)} queries)")


def cmd_e2e(args):
    """Minimum end-to-end slice (SURVEY.md §7.2 / BASELINE config #1):
    tokenizer -> seq2seq pretrain on pseudo-queries -> encode -> RQ docids
    -> trie -> constrained retrieve -> metrics."""
    from ripor_tpu.pipeline.e2e import run_e2e
    cfg_overrides = {}
    if args.config:
        cfg_overrides = json.loads(Path(args.config).read_text())
    metrics = run_e2e(workspace=args.workspace, docs_dir=args.docs,
                      queries_dir=args.queries, qrel_path=args.qrel,
                      s2s_examples_path=args.s2s_examples,
                      **cfg_overrides)
    print(json.dumps(metrics, indent=2))


def cmd_train(args):
    from ripor_tpu.pipeline.e2e import run_train_from_config
    cfg = json.loads(Path(args.config).read_text())
    run_train_from_config(cfg)


def cmd_datagen(args):
    """Phase-3 flywheel: D^B beam prefix candidates + D^R grouping +
    decay merge + lng_knp score attachment (replaces the reference's
    t5seq_aq_get_qid_to_smtid_rankdata + aq_preprocess merge scripts)."""
    import jax.numpy as jnp
    from ripor_tpu.data import Collection, UnigramTokenizer, load_docid_to_smtid
    from ripor_tpu.pipeline.datagen import (
        attach_lng_knp_scores, group_docids_by_prefix,
        merge_rankdata_with_decay, prefix_smtid_strings)
    from ripor_tpu.pipeline.flywheel import (
        beam_prefix_candidates, read_jsonl, write_jsonl)
    from ripor_tpu.pipeline.recipe import Workspace

    ws, cfg, model, params = _load_workspace_model(args.workspace, args.phase)
    tok = UnigramTokenizer.load(ws.path("tokenizer.json"))
    docids, codes = load_docid_to_smtid(ws.path("docid_to_smtid.json"))
    queries = Collection(args.queries)
    teacher_examples = read_jsonl(args.teacher_trainset)
    qid_to_docids = {str(ex["qid"]): [str(d) for d in ex["docids"]]
                     for ex in teacher_examples}
    qid_to_scores = {str(ex["qid"]): dict(zip(map(str, ex["docids"]),
                                              ex["scores"]))
                     for ex in teacher_examples}

    for plen in args.prefix_lengths:
        p_str = prefix_smtid_strings(codes, docids, plen)
        d_r = group_docids_by_prefix(qid_to_docids, p_str)
        qids = [q for q in qid_to_docids if q in {str(i) for i in queries.ids}
                or True]
        d_b = beam_prefix_candidates(
            cfg, params, tok, list(qid_to_docids),
            [queries[q] for q in qid_to_docids], codes, docids,
            prefix_len=plen, num_beams=args.beam, batch_size=args.batch_size)
        # teacher scores: reuse the trainset's per-doc scores (a cross-encoder
        # rescoring pass can refine these; evaluation/reranker.py)
        def to_rankdata(groups):
            out = {}
            for qid, bucket in groups.items():
                scores = qid_to_scores.get(qid, {})
                out[qid] = {smtid: [[d, scores.get(d, 0.0)] for d in docs]
                            for smtid, docs in bucket.items()}
            return out
        merged = merge_rankdata_with_decay(
            to_rankdata(d_r), to_rankdata(d_b), max_new_token=plen,
            decay=args.decay)
        if plen > 4:
            merged = attach_lng_knp_scores(merged, plen)
        out_path = ws.path(f"lng_knp_qid_smtids_scores_{plen}.train.json")
        write_jsonl(out_path, merged)
        print(f"wrote {out_path} ({len(merged)} examples)")


def main(argv=None):
    p = argparse.ArgumentParser(prog="ripor_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("evaluate", help="trec metrics over a run file")
    pe.add_argument("--qrel", required=True)
    pe.add_argument("--run", required=True)
    pe.add_argument("--metric", nargs="+", default=["mrr_10"])
    pe.set_defaults(fn=cmd_evaluate)

    pr = sub.add_parser("retrieve", help="constrained-beam retrieval")
    pr.add_argument("--workspace", required=True)
    pr.add_argument("--queries", required=True)
    pr.add_argument("--phase", default="final")
    pr.add_argument("--beam", type=int, default=100)
    pr.add_argument("--topk", type=int, default=100)
    pr.add_argument("--run-name", default="run.json")
    pr.set_defaults(fn=cmd_retrieve)

    p2 = sub.add_parser("e2e", help="end-to-end small pipeline")
    p2.add_argument("--workspace", required=True)
    p2.add_argument("--docs", required=True)
    p2.add_argument("--queries", required=True)
    p2.add_argument("--qrel", required=True)
    p2.add_argument("--s2s-examples", default=None)
    p2.add_argument("--config", default=None)
    p2.set_defaults(fn=cmd_e2e)

    pt = sub.add_parser("train", help="train one phase from a JSON config")
    pt.add_argument("--config", required=True)
    pt.set_defaults(fn=cmd_train)

    pd = sub.add_parser("datagen", help="phase-3 flywheel data generation")
    pd.add_argument("--workspace", required=True)
    pd.add_argument("--queries", required=True)
    pd.add_argument("--teacher-trainset", required=True,
                    help="JSONL {'qid','docids','scores'} from the teacher")
    pd.add_argument("--phase", default="final")
    pd.add_argument("--prefix-lengths", type=int, nargs="+",
                    default=[4, 8, 16, 32])
    pd.add_argument("--beam", type=int, default=100)
    pd.add_argument("--batch-size", type=int, default=4)
    pd.add_argument("--decay", type=int, default=2)
    pd.set_defaults(fn=cmd_datagen)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
