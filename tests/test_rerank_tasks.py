"""Task-level rerank drivers (reference rerank.py's 16 tasks as 8 sharded
pass + merge pairs): artifact names/shapes, round-robin rank sharding, and
merge == single-rank equivalence."""
import json

import jax
import numpy as np
import pytest

from ripor_tpu.data import Collection, HashTokenizer
from ripor_tpu.evaluation import rerank_tasks as rt
from ripor_tpu.models import ripor_small


def det_score(ids, mask):
    """Deterministic stand-in teacher: distinct per (q, d) pair."""
    return ((ids * mask).sum(axis=1) % 997).astype(np.float32)


@pytest.fixture()
def corpus(tmp_path):
    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "raw.tsv").write_text(
        "".join(f"d{i}\tdocument number {i} about subject {i % 4}\n"
                for i in range(12)))
    (tmp_path / "queries").mkdir()
    (tmp_path / "queries" / "raw.tsv").write_text(
        "".join(f"q{i}\tquery for subject {i % 4}\n" for i in range(6)))
    return Collection(tmp_path / "queries"), Collection(tmp_path / "docs")


def test_create_trainset_shard_and_merge(tmp_path, corpus):
    queries, docs = corpus
    tok = HashTokenizer(512)
    run = {f"q{i}": {f"d{j}": 1.0 for j in range(8)} for i in range(6)}

    two = tmp_path / "two"
    for rank in range(2):
        rt.rerank_for_create_trainset(det_score, tok, queries, docs, run,
                                      str(two), rank=rank, nranks=2,
                                      batch_size=16, max_length=48)
    assert (two / "rerank_0.json").exists() and (two / "rerank_1.json").exists()
    out = rt.rerank_for_create_trainset_merge(str(two), topk=5)
    assert not (two / "rerank_0.json").exists()  # shards cleaned up

    rows = [json.loads(l) for l in open(out)]
    assert {r["qid"] for r in rows} == set(run)
    for r in rows:
        assert len(r["docids"]) == 5 == len(r["scores"])  # topk cap
        assert r["scores"] == sorted(r["scores"], reverse=True)

    # sharded result == single-rank result
    one = tmp_path / "one"
    rt.rerank_for_create_trainset(det_score, tok, queries, docs, run,
                                  str(one), batch_size=16, max_length=48)
    out1 = rt.rerank_for_create_trainset_merge(str(one), topk=5)
    assert [json.loads(l) for l in open(out1)] == sorted(
        rows, key=lambda r: r["qid"])


def test_evaluate_merge_run_shape(tmp_path, corpus):
    queries, docs = corpus
    tok = HashTokenizer(512)
    run = {f"q{i}": {f"d{j}": 1.0 for j in range(4)} for i in range(4)}
    rt.rerank_for_create_trainset(det_score, tok, queries, docs, run,
                                  str(tmp_path), batch_size=8, max_length=48)
    out = rt.rerank_for_evaluate_merge(str(tmp_path))
    data = json.load(open(out))
    assert set(data) == set(run)
    assert all(set(v) == set(run[q]) for q, v in data.items())


def test_pseudo_query_scores(tmp_path, corpus):
    queries, docs = corpus
    tok = HashTokenizer(512)
    docid_pseudo_qids = {f"d{j}": [f"q{j % 4}", f"q{(j + 1) % 4}"]
                         for j in range(6)}
    for rank in range(2):
        rt.assign_scores_for_pseudo_queries(det_score, tok, queries, docs,
                                            docid_pseudo_qids, str(tmp_path),
                                            rank=rank, nranks=2,
                                            batch_size=8, max_length=48)
    out = rt.assign_scores_for_pseudo_queries_merge(str(tmp_path))
    data = json.load(open(out))
    assert set(data) == set(docid_pseudo_qids)
    for pid, qid_scores in data.items():
        assert set(qid_scores) == set(docid_pseudo_qids[pid])


@pytest.fixture()
def d2s():
    rng = np.random.default_rng(3)
    d2s = {f"d{i}": rng.integers(0, 32, size=8).tolist() for i in range(12)}
    d2s["d1"] = list(d2s["d0"])  # collision pool: d0/d1 share a full smtid
    return d2s


def test_teacher_rerank_for_qid_smtids(tmp_path, corpus, d2s):
    queries, docs = corpus
    tok = HashTokenizer(512)
    from ripor_tpu.data.datasets import smtid_to_str
    s0 = smtid_to_str(d2s["d0"])
    s2 = smtid_to_str(d2s["d2"])
    qid_smtid_rank = {"q0": {s0: 9.0}, "q1": {s2: 7.0}}
    rt.teacher_rerank_for_qid_smtids(det_score, tok, queries, docs,
                                     qid_smtid_rank, d2s, str(tmp_path),
                                     batch_size=8, max_length=48)
    out = rt.teacher_rerank_for_qid_smtids_merge(str(tmp_path))
    data = json.load(open(out))
    # smtid expanded back to its docids: q0's smtid covers both d0 and d1
    assert set(data["q0"]) == {"d0", "d1"}
    assert set(data["q1"]) == {"d2"}


def test_same_prefix_and_hard_pools(tmp_path, corpus, d2s):
    queries, docs = corpus
    tok = HashTokenizer(512)
    qrel = {"q0": {"d0": 1}, "q1": {"d2": 1}, "q2": {"d3": 1}}
    for rank in range(2):
        rt.cross_encoder_rerank_for_same_prefix_docid(
            det_score, tok, queries, docs, d2s, qrel, str(tmp_path),
            rank=rank, nranks=2, neg_sample=5, batch_size=8, max_length=48)
    merged_path, sampled_path = \
        rt.cross_encoder_rerank_for_same_prefix_docid_merge(str(tmp_path))
    data = json.load(open(merged_path))
    assert set(data) == set(qrel)
    from ripor_tpu.data.datasets import smtid_to_str
    s0 = smtid_to_str(d2s["d0"])
    rows = data["q0"][s0]
    assert {d for d, _ in rows} == {"d0", "d1"}        # the collision pool
    assert [s for _, s in rows] == sorted(
        (s for _, s in rows), reverse=True)
    assert json.load(open(sampled_path)) == data

    # hard-pool variant reuses the nested engine on prepared pools
    pools = {"q0": {"d0": ["d1", "d4", "d5"]}}
    rt.cross_encoder_rerank_for_same_reldocid_hard_docids(
        det_score, tok, queries, docs, pools, str(tmp_path),
        batch_size=8, max_length=48)
    out = rt.cross_encoder_rerank_for_same_reldocid_hard_docids_merge(
        str(tmp_path))
    hard = json.load(open(out))
    assert {d for d, _ in hard["q0"]["d0"]} == {"d1", "d4", "d5"}


def test_qid_smtid_docids_flywheel_artifacts(tmp_path, corpus, d2s):
    queries, docs = corpus
    tok = HashTokenizer(512)
    from ripor_tpu.data.datasets import smtid_to_str
    s0 = smtid_to_str(d2s["d0"])
    src = tmp_path / "qid_smtid_docids.train.json"
    src.write_text(json.dumps(
        {"q0": {s0: ["d0", "d1"]}, "q1": {s0: ["d0"]}}))
    for rank in range(2):
        rt.cross_encoder_rerank_for_qid_smtid_docids(
            det_score, tok, queries, docs, str(src), rank=rank, nranks=2,
            batch_size=8, max_length=48)
    assert (tmp_path / "qid_smtid_docids_teacher_score_0.train.json").exists()
    out = rt.cross_encoder_rerank_for_qid_smtid_docids_merge(str(tmp_path))
    data = json.load(open(out))
    assert set(data) == {"q0", "q1"}
    assert {d for d, _ in data["q0"][s0]} == {"d0", "d1"}


def test_query_to_docid_self_rerank(tmp_path, corpus, d2s):
    queries, docs = corpus
    tok = HashTokenizer(512)
    cfg = ripor_small()
    from ripor_tpu.models.ripor import init_ripor_params
    params = init_ripor_params(jax.random.PRNGKey(0), cfg)
    d2s8 = {d: c[:cfg.M] for d, c in d2s.items()}
    qid_docids = {"q0": ["d0", "d1", "d2"], "q1": ["d3", "d4"]}
    for rank in range(2):
        rt.query_to_docid_rerank_for_qid_smtids(
            cfg, params, tok, queries, qid_docids, d2s8, str(tmp_path),
            rank=rank, nranks=2, batch_size=4, max_length=16)
    qrel = {"q0": {"d0": 1}, "q1": {"d3": 1}}
    out, metrics = rt.query_to_docid_rerank_for_qid_smtids_merge(
        str(tmp_path), d2s8, qrel)
    data = json.load(open(out))
    # d0/d1 share a smtid -> q0 has 2 unique smtid candidates
    assert len(data["q0"]) == 2 and len(data["q1"]) == 2
    assert set(metrics) == {"mrr_at_10", "mrr_at_100"}
    assert (tmp_path / "metric.json").exists()
