"""HNSW ANN index (native/hnsw.cc + evaluation/hnsw.py) — parity with the
reference's faiss IndexHNSWFlat inner-product baseline
(reference tasks/evaluator.py:28-190)."""
import numpy as np
import pytest

from ripor_tpu import native_ext
from ripor_tpu.evaluation.hnsw import HnswIndex, recall_vs_exact


def _clustered_data(rng, n=3000, d=32, n_clusters=50):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32) * 3
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign] + rng.normal(size=(n, d)).astype(np.float32)
    return x.astype(np.float32)


def test_hnsw_recall_vs_exact(np_rng):
    x = _clustered_data(np_rng)
    q = _clustered_data(np_rng, n=50)
    index = HnswIndex.build(x, num_links=16, ef_construct=100, seed=1)
    rec = recall_vs_exact(index, x, q, k=10, ef_search=128)
    # native graph should be near-exact at this scale; the brute-force
    # fallback is exact by construction
    assert rec >= 0.9, rec


@pytest.mark.skipif(not native_ext.native_available(),
                    reason="native library unavailable")
def test_hnsw_native_build_search_save_load(tmp_path, np_rng):
    x = _clustered_data(np_rng, n=2000)
    q = _clustered_data(np_rng, n=20)
    index = HnswIndex.build(x, num_links=16, ef_construct=80,
                            docids=[f"d{i}" for i in range(len(x))], seed=7)
    assert index.is_native
    assert index.size == len(x)

    ids, scores = index.search(q, k=5, ef_search=64)
    assert ids.shape == (20, 5) and scores.shape == (20, 5)
    # scores descending per row and consistent with the stored vectors
    assert np.all(np.diff(scores, axis=1) <= 1e-5)
    recomputed = np.einsum("qd,qkd->qk", q, x[ids])
    np.testing.assert_allclose(scores, recomputed, rtol=1e-4, atol=1e-4)

    index.save(str(tmp_path))
    loaded = HnswIndex.load(str(tmp_path))
    assert loaded.is_native and loaded.size == len(x)
    ids2, scores2 = loaded.search(q, k=5, ef_search=64)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(scores, scores2, rtol=1e-6)
    assert loaded.docids[:2] == ["d0", "d1"]


def test_hnsw_retrieve_to_run(np_rng):
    x = _clustered_data(np_rng, n=500)
    q = x[:3] + 0.01  # near-duplicates: top hit should be the doc itself
    index = HnswIndex.build(x, num_links=16, ef_construct=80,
                            docids=[f"doc{i}" for i in range(len(x))])
    run = index.retrieve_to_run(["q0", "q1", "q2"], q, k=10)
    assert set(run) == {"q0", "q1", "q2"}
    for qi, qid in enumerate(["q0", "q1", "q2"]):
        best = max(run[qid], key=run[qid].get)
        assert best == f"doc{qi}", (qid, best)


def test_hnsw_fallback_matches_exact(np_rng):
    # force the brute-force path regardless of native availability
    x = _clustered_data(np_rng, n=300)
    q = _clustered_data(np_rng, n=10)
    index = HnswIndex(vecs=x)
    ids, scores = index.search(q, k=7)
    sims = q @ x.T
    exact = np.argsort(-sims, axis=1)[:, :7]
    exact_scores = np.take_along_axis(sims, exact, axis=1)
    np.testing.assert_allclose(np.sort(scores, axis=1),
                               np.sort(exact_scores, axis=1), rtol=1e-5)
    assert (np.sort(ids, axis=1) == np.sort(exact, axis=1)).mean() > 0.99
