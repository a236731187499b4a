"""Metric parity tests (hand-computed trec_eval semantics) + dense retrieval."""
import numpy as np
import pytest

from ripor_tpu.evaluation import (
    dense_topk,
    mrr_k,
    ndcg_cut_k,
    qrel_to_smtid_qrel,
    recall_k,
    retrieve_to_run,
    truncate_run,
)


QREL = {
    "q1": {"d1": 1, "d3": 2},
    "q2": {"d5": 1},
    "q3": {"d9": 1},  # not in run -> not evaluated
}
RUN = {
    "q1": {"d1": 0.9, "d2": 0.8, "d3": 0.7},
    "q2": {"d4": 0.9, "d5": 0.5, "d6": 0.4},
}


def test_mrr():
    # q1: first rel at rank 1 -> 1.0 ; q2: d5 at rank 2 -> 0.5 ; mean 0.75
    assert mrr_k(RUN, QREL, 10) == pytest.approx(0.75)
    # with k=1 truncation q2 loses d5 -> 0.0 ; mean 0.5
    assert mrr_k(RUN, QREL, 1) == pytest.approx(0.5)


def test_recall():
    # q1 top2: {d1,d2} -> 1/2 rel found; q2 top2: {d4,d5} -> 1/1
    assert recall_k(RUN, QREL, 2) == pytest.approx((0.5 + 1.0) / 2)
    assert recall_k(RUN, QREL, 10) == pytest.approx(1.0)


def test_ndcg():
    # q1 ranking d1(1), d2(0), d3(2): dcg = 1/log2(2) + 0 + 2/log2(4) = 2.0
    # ideal = 2/log2(2) + 1/log2(3) = 2.6309 ; ndcg = 0.7602
    # q2: dcg = 1/log2(3) = .6309 ; ideal 1.0
    expect = (2.0 / (2 + 1 / np.log2(3)) + 1 / np.log2(3)) / 2
    assert ndcg_cut_k(RUN, QREL, 10) == pytest.approx(expect, abs=1e-6)


def test_binarize_qrel_trec_dl():
    """TREC-DL: rel >= 2 binarization (reference qrel_binary.json files,
    arguments.py:163-169)."""
    from ripor_tpu.evaluation.metrics import binarize_qrel
    graded = {"q1": {"d1": 3, "d2": 1, "d3": 2, "d4": 0}}
    b = binarize_qrel(graded)
    assert b == {"q1": {"d1": 1, "d2": 0, "d3": 1, "d4": 0}}
    # binary recall counts only rel>=2 docs as relevant
    run = {"q1": {"d2": 0.9, "d1": 0.8}}
    assert recall_k(run, b, 10) == pytest.approx(0.5)   # d1 found, d3 missed
    assert recall_k(run, graded, 10) == pytest.approx(2 / 3)  # graded rel>0


def test_bare_metric_returns_cut_grid():
    from ripor_tpu.evaluation.metrics import TREC_CUTS, evaluate_run
    out = evaluate_run(RUN, QREL, "recall")
    assert set(out) == {f"recall_{k}" for k in TREC_CUTS}
    assert out["recall_1000"] == pytest.approx(recall_k(RUN, QREL, 1000))
    out2 = evaluate_run(RUN, QREL, "ndcg_cut")
    assert out2["ndcg_cut_10"] == pytest.approx(ndcg_cut_k(RUN, QREL, 10))


def test_load_and_evaluate_trec_pairing(tmp_path):
    import json

    from ripor_tpu.evaluation.metrics import load_and_evaluate
    run_p = tmp_path / "run.json"
    run_p.write_text(json.dumps(RUN))
    graded_p = tmp_path / "TREC_DL_2019_qrel.json"
    graded_p.write_text(json.dumps(QREL))
    binary_p = tmp_path / "TREC_DL_2019_qrel_binary.json"
    binary_p.write_text(json.dumps(QREL))
    assert "ndcg_cut_10" in load_and_evaluate(str(graded_p), str(run_p),
                                              "ndcg_cut_10")
    assert "mrr_10" in load_and_evaluate(str(binary_p), str(run_p), "mrr_10")
    with pytest.raises(AssertionError):
        load_and_evaluate(str(graded_p), str(run_p), "mrr_10")


def test_tie_break_docid_descending():
    # trec_eval: equal scores -> docid string DESCENDING
    run = {"q": {"a": 1.0, "b": 1.0}}
    qrel = {"q": {"b": 1}}
    assert mrr_k(run, qrel, 10) == pytest.approx(1.0)  # b ranks before a
    qrel2 = {"q": {"a": 1}}
    assert mrr_k(run, qrel2, 10) == pytest.approx(0.5)


def test_truncate_run():
    t = truncate_run(RUN, 1)
    assert t["q1"] == {"d1": 0.9}


def test_qrel_to_smtid_space():
    d2s = {"d1": [-1, 3, 4], "d2": [-1, 3, 5]}
    qrel = {"q": {"d1": 1, "d2": 2}}
    out = qrel_to_smtid_qrel(d2s, qrel)
    assert out == {"q": {"3_4": 1, "3_5": 2}}
    out = qrel_to_smtid_qrel(d2s, qrel, truncate=1)
    assert out == {"q": {"3": 2}}  # collision keeps max rel


def test_dense_topk_exact():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    d = rng.standard_normal((200, 16)).astype(np.float32)
    s, i = dense_topk(q, d, k=7)
    brute = q @ d.T
    want_i = np.argsort(-brute, axis=1)[:, :7]
    want_s = np.take_along_axis(brute, want_i, axis=1)
    np.testing.assert_allclose(s, want_s, rtol=1e-5)
    np.testing.assert_array_equal(i, want_i)


def test_dense_topk_blocked_merge():
    rng = np.random.default_rng(1)
    q = rng.standard_normal((3, 8)).astype(np.float32)
    d = rng.standard_normal((50, 8)).astype(np.float32)
    s, i = dense_topk(q, d, k=5, block_docs=16)  # forces multi-block merge
    brute = q @ d.T
    want_i = np.argsort(-brute, axis=1)[:, :5]
    np.testing.assert_array_equal(i, want_i)


def test_dense_topk_int8_corpus():
    """Int8Corpus (1 byte/dim + per-row scale: 2x bf16's doc capacity per
    chip) must agree with exact f32 MIPS up to quantization near-ties:
    identical top-1 and >= 90% top-10 overlap on a random corpus."""
    import jax.numpy as jnp

    from ripor_tpu.evaluation.retriever import Int8Corpus, device_corpus

    rng = np.random.default_rng(9)
    q = rng.standard_normal((6, 32)).astype(np.float32)
    d = rng.standard_normal((600, 32)).astype(np.float32)
    c8 = device_corpus(d, dtype=jnp.int8, chunk=250)  # exercises chunking
    assert isinstance(c8, Int8Corpus) and c8.codes.dtype == jnp.int8
    s8, i8 = dense_topk(q, c8, k=10)
    brute = q @ d.T
    want_i = np.argsort(-brute, axis=1)[:, :10]
    np.testing.assert_array_equal(i8[:, 0], want_i[:, 0])
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(i8, want_i)])
    assert overlap >= 0.9, overlap
    # scores reproduce the true IP within int8 rounding
    true_s = np.take_along_axis(brute, np.asarray(i8), axis=1)
    np.testing.assert_allclose(s8, true_s, rtol=0.05, atol=0.05)
    # mesh path rejects the int8 capacity corpus explicitly
    import pytest as _pt
    import jax as _jax
    if len(_jax.devices()) >= 2:
        from jax.sharding import Mesh
        mesh = Mesh(np.array(_jax.devices()[:2]).reshape(2, 1),
                    ("data", "model"))
        with _pt.raises(NotImplementedError):
            dense_topk(q, c8, k=5, mesh=mesh)


def test_dense_topk_on_mesh(mesh8):
    rng = np.random.default_rng(2)
    q = rng.standard_normal((4, 8)).astype(np.float32)
    d = rng.standard_normal((64, 8)).astype(np.float32)  # 64 % 4 data shards == 0
    s, i = dense_topk(q, d, k=6, mesh=mesh8)
    brute = q @ d.T
    want_i = np.argsort(-brute, axis=1)[:, :6]
    np.testing.assert_array_equal(np.sort(i, 1), np.sort(want_i, 1))
    want_s = np.take_along_axis(brute, want_i, axis=1)
    np.testing.assert_allclose(np.sort(s, 1), np.sort(want_s, 1), rtol=1e-5)


def test_retrieve_to_run():
    run = retrieve_to_run(["q1"], ["a", "b", "c"],
                          np.array([[0.5, 0.2]]), np.array([[2, 0]]))
    assert run == {"q1": {"c": 0.5, "a": 0.2}}


def test_rerank_query_smtids_prefix_masking(tmp_path, np_rng):
    """rerank_query_smtids == rerank_score over the prefix positions only
    (reference query_to_smtid_reranking, tasks/reranker.py:94-123)."""
    import jax
    import jax.numpy as jnp
    from ripor_tpu.data.datasets import Collection
    from ripor_tpu.data.tokenizer import HashTokenizer, tokenize_queries
    from ripor_tpu.evaluation.reranker import rerank_query_smtids
    from ripor_tpu.models import RiporModel, ripor_small
    from ripor_tpu.models.ripor import init_ripor_params

    cfg = ripor_small(M=4, K=8)
    params = init_ripor_params(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(vocab_size=cfg.t5.vocab_size)
    raw = tmp_path / "raw.tsv"
    raw.write_text("q1\talpha beta\nq2\tgamma\n")
    queries = Collection(raw)

    out = rerank_query_smtids(cfg, params, tok, queries,
                              {"q1": ["1_2", "3_0_2_1"], "q2": ["5"]},
                              batch_size=4, dtype=jnp.float32)
    assert set(out) == {"q1", "q2"}
    assert set(out["q1"]) == {"1_2", "3_0_2_1"}

    # manual check for the full-length smtid: equals rerank_score
    model = RiporModel(cfg, dtype=jnp.float32)
    ids, mask = tokenize_queries(tok, ["alpha beta"], 64)
    codes = jnp.asarray([[3, 0, 2, 1]], jnp.int32)
    full = model.apply({"params": params}, jnp.asarray(ids),
                       jnp.asarray(mask), codes,
                       method=RiporModel.rerank_score)
    assert abs(out["q1"]["3_0_2_1"] - float(full[0])) < 1e-3

    # prefix score differs from padded-full score (masking is real)
    padded = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    full_padded = model.apply({"params": params}, jnp.asarray(ids),
                              jnp.asarray(mask), padded,
                              method=RiporModel.rerank_score)
    assert abs(out["q1"]["1_2"] - float(full_padded[0])) > 1e-6


def test_rerank_cond_prefix(tmp_path, np_rng):
    """Prefix-conditioned dense scoring == manual <q_rep(prefix), d_rep>
    (reference cond_prev_smtid reranking, tasks/reranker.py:125-155)."""
    import jax
    import jax.numpy as jnp
    from ripor_tpu.data.datasets import Collection
    from ripor_tpu.data.tokenizer import (HashTokenizer, tokenize_docs,
                                          tokenize_queries)
    from ripor_tpu.evaluation.reranker import rerank_cond_prefix
    from ripor_tpu.models import RiporModel, ripor_small
    from ripor_tpu.models.ripor import init_ripor_params

    cfg = ripor_small(M=4, K=8)
    params = init_ripor_params(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(vocab_size=cfg.t5.vocab_size)
    (tmp_path / "q.tsv").write_text("q1\talpha beta\n")
    (tmp_path / "d.tsv").write_text("d1\tgamma delta\nd2\tepsilon\n")
    queries = Collection(tmp_path / "q.tsv")
    docs = Collection(tmp_path / "d.tsv")

    out = rerank_cond_prefix(cfg, params, tok, queries, docs,
                             [("q1", "d1", [1, 2]), ("q1", "d2", [1, 2])],
                             batch_size=4, dtype=jnp.float32)
    assert set(out["q1"]) == {"d1", "d2"}

    model = RiporModel(cfg, dtype=jnp.float32)
    q_ids, q_mask = tokenize_queries(tok, ["alpha beta"], 64)
    d_ids, d_mask = tokenize_docs(tok, ["gamma delta"], 64)
    q_rep = model.apply({"params": params}, jnp.asarray(q_ids),
                        jnp.asarray(q_mask), jnp.asarray([[1, 2]], jnp.int32),
                        method=RiporModel.dense_rep)
    d_rep = model.apply({"params": params}, jnp.asarray(d_ids),
                        jnp.asarray(d_mask), method=RiporModel.dense_rep)
    manual = float(jnp.sum(q_rep * d_rep))
    assert abs(out["q1"]["d1"] - manual) < 1e-3


def test_dense_topk_bf16_device_corpus(mesh8):
    """bf16 device-resident corpus (the single-chip 8.8M serving case,
    evaluation/retriever.py::device_corpus): rankings match the f32 exact
    path on well-separated scores, for both the streamed and mesh paths."""
    import jax.numpy as jnp

    from ripor_tpu.evaluation.retriever import device_corpus

    rng = np.random.default_rng(11)
    d = rng.standard_normal((64, 16)).astype(np.float32)
    d[:, 0] += np.arange(64) * 0.5          # separate the score scale
    q = rng.standard_normal((3, 16)).astype(np.float32)
    q[:, 0] += 4.0

    s32, i32 = dense_topk(q, d, k=5)
    dbf = device_corpus(d, jnp.bfloat16)
    s16, i16 = dense_topk(q, dbf, k=5)
    np.testing.assert_array_equal(i16, i32)
    np.testing.assert_allclose(s16, s32, rtol=2e-2)
    sm, im = dense_topk(q, dbf, k=5, mesh=mesh8)
    np.testing.assert_array_equal(im, i32)


def test_pruned_tile_topk_exact_and_tie_fallback():
    """Tile-max pruning keeps exact top-k (retriever._pruned_tile_topk);
    an all-ties score matrix fails the completeness check and must take
    the verified full-sort fallback, still exact."""
    import jax.numpy as jnp

    from ripor_tpu.evaluation.retriever import _pruned_tile_topk

    rng = np.random.default_rng(13)
    s = rng.standard_normal((4, 4096)).astype(np.float32)
    gs, gi = _pruned_tile_topk(jnp.asarray(s), 5, tile=16)  # keep << nt
    want_i = np.argsort(-s, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(gi), want_i)
    np.testing.assert_allclose(np.asarray(gs),
                               np.take_along_axis(s, want_i, axis=1))
    # all-equal scores: pruned-best == kth selected -> fallback branch
    flat = np.zeros((2, 4096), np.float32)
    flat[0, 40] = 1.0
    gs, gi = _pruned_tile_topk(jnp.asarray(flat), 3, tile=16)
    assert gi[0, 0] == 40 and abs(gs[0, 0] - 1.0) < 1e-6
    assert np.all(np.asarray(gs)[0, 1:] == 0.0)


def test_dense_topk_device_scan_tail_overlap():
    """Device-resident corpora stream through _topk_scan_device; a corpus
    size not divisible by the block clamps the tail block's start and masks
    the re-scored overlap rows — every doc counted exactly once."""
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    d = rng.standard_normal((53, 8)).astype(np.float32)  # 53 % 16 != 0
    q = rng.standard_normal((3, 8)).astype(np.float32)
    s, i = dense_topk(q, jnp.asarray(d), k=5, block_docs=16)
    brute = q @ d.T
    want_i = np.argsort(-brute, axis=1)[:, :5]
    np.testing.assert_array_equal(i, want_i)
    # no doc may appear twice in any row (overlap dedup)
    for row in i:
        assert len(set(row.tolist())) == 5
