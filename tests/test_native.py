"""C++ native components: parity vs the Python/numpy implementations."""
import numpy as np
import pytest

from ripor_tpu.native_ext import (
    eval_metrics_native,
    native_available,
    trie_build_native,
)
from ripor_tpu.evaluation.metrics import mrr_k, ndcg_cut_k, recall_k
from ripor_tpu.trie import build_trie

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native lib unavailable")


@pytest.mark.parametrize("n,M,K,seed", [(500, 6, 16, 0), (3000, 8, 32, 1)])
def test_trie_native_matches_python(n, M, K, seed):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, K, (n // 2, M))
    codes = base[rng.integers(0, len(base), n)]  # with duplicates
    py = build_trie(codes, K, use_native=False)
    children, unique_codes, offsets, docids = trie_build_native(codes, K)
    np.testing.assert_array_equal(unique_codes, py.unique_codes)
    np.testing.assert_array_equal(offsets, py.group_doc_offsets)
    np.testing.assert_array_equal(docids, py.group_docids)
    np.testing.assert_array_equal(children, py.children)


def test_trie_native_via_build_trie_flag():
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 8, (200, 4))
    a = build_trie(codes, 8, use_native=True)
    b = build_trie(codes, 8, use_native=False)
    np.testing.assert_array_equal(a.children, b.children)
    np.testing.assert_array_equal(a.unique_codes, b.unique_codes)


def _random_run_qrel(seed, n_q=30, n_d=200, per_q=50):
    rng = np.random.default_rng(seed)
    run, qrel = {}, {}
    for q in range(n_q):
        docs = rng.choice(n_d, per_q, replace=False)
        run[f"q{q}"] = {f"d{d}": float(rng.standard_normal()) for d in docs}
        rel = rng.choice(n_d, 3, replace=False)
        qrel[f"q{q}"] = {f"d{d}": int(rng.integers(1, 4)) for d in rel}
    return run, qrel


@pytest.mark.parametrize("metric,k,py_fn", [
    ("mrr", 10, mrr_k), ("recall", 10, recall_k), ("recall", 100, recall_k),
    ("ndcg_cut", 10, ndcg_cut_k),
])
def test_metrics_native_parity(metric, k, py_fn):
    run, qrel = _random_run_qrel(0)
    native = eval_metrics_native(run, qrel, metric, k)
    python = py_fn(run, qrel, k)
    assert native == pytest.approx(python, abs=1e-9), (metric, k)


def test_metrics_native_tie_breaking():
    # equal scores -> docid string descending, both paths
    run = {"q": {"a": 1.0, "b": 1.0, "c": 1.0}}
    qrel = {"q": {"a": 1}}
    assert eval_metrics_native(run, qrel, "mrr", 10) == \
        pytest.approx(mrr_k(run, qrel, 10))
