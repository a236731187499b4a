"""RQ / k-means quality tests (replaces faiss parity: synthetic recovery +
reconstruction-error contracts; SURVEY.md §4 item (a))."""
import jax
import numpy as np

from ripor_tpu.quantize import (
    kmeans_fit,
    reconstruction_mse,
    rq_decode,
    rq_encode,
    train_rq,
)


def gaussian_mixture(n, k, d, scale=0.05, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, d)).astype(np.float32)
    assign = rng.integers(0, k, n)
    x = centers[assign] + scale * rng.standard_normal((n, d)).astype(np.float32)
    return x.astype(np.float32), centers, assign


def test_kmeans_recovers_centroids():
    x, centers, _ = gaussian_mixture(2000, 8, 16)
    fit, assign = kmeans_fit(x, 8, iters=25, key=jax.random.PRNGKey(0))
    fit = np.asarray(fit)
    # every true center has a fitted centroid nearby
    d = np.linalg.norm(centers[:, None] - fit[None], axis=-1).min(axis=1)
    assert d.max() < 0.2, d
    # assignments are consistent with nearest centroid
    a = np.asarray(assign)
    manual = np.linalg.norm(x[:, None] - fit[None], axis=-1).argmin(1)
    assert (a == manual).mean() > 0.999


def test_rq_reconstruction_improves_with_stages():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3000, 32)).astype(np.float32)
    errs = []
    for M in (1, 2, 4):
        books = train_rq(x, M=M, K=16, kmeans_iters=15)
        errs.append(reconstruction_mse(books, x, beam=1))
    assert errs[0] > errs[1] > errs[2], errs


def test_rq_beam_no_worse_than_greedy():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1000, 16)).astype(np.float32)
    books = train_rq(x, M=4, K=8, kmeans_iters=15)
    greedy = reconstruction_mse(books, x, beam=1)
    beamed = reconstruction_mse(books, x, beam=4)
    assert beamed <= greedy * 1.0001, (beamed, greedy)


def test_rq_encode_decode_shapes_and_range():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((500, 24)).astype(np.float32)
    books = train_rq(x, M=6, K=16, kmeans_iters=10)
    codes = rq_encode(books, x, beam=2)
    assert codes.shape == (500, 6)
    assert codes.min() >= 0 and codes.max() < 16
    recon = rq_decode(books, codes)
    assert recon.shape == x.shape


def test_rq_codebooks_feed_model_layout():
    """[M, K, d] codebooks drop directly into RiporModel.codebooks
    (replaces change_customized_embed_layer.py surgery)."""
    import jax.numpy as jnp
    from ripor_tpu.models import RiporModel, ripor_small, install_codebooks

    cfg = ripor_small(M=4, K=8)
    x = np.random.default_rng(4).standard_normal((200, cfg.t5.d_model)).astype(np.float32)
    books = train_rq(x, M=4, K=8, kmeans_iters=5)
    model = RiporModel(cfg)
    ids = jnp.ones((1, 4), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, ids, ids,
                        jnp.zeros((1, 4), jnp.int32))["params"]
    params = install_codebooks(params, books.codebooks)
    np.testing.assert_array_equal(np.asarray(params["codebooks"]), books.codebooks)


def test_train_rq_streamed_readonly_memmap(tmp_path, np_rng):
    """Streamed RQ training must work on a read-only memmap (the corpus
    store) and match the in-HBM path's reconstruction quality."""
    import numpy as np
    from ripor_tpu.quantize import train_rq
    from ripor_tpu.quantize.rq import reconstruction_mse

    n, d = 400, 8
    x = np_rng.normal(size=(n, d)).astype(np.float32)
    path = tmp_path / "embs.mmap"
    mm = np.memmap(path, np.float32, "w+", shape=(n, d))
    mm[:] = x
    mm.flush()
    ro = np.memmap(path, np.float32, "r").reshape(n, d)

    full = train_rq(x, M=2, K=4, kmeans_iters=5)
    streamed = train_rq(ro, M=2, K=4, kmeans_iters=5, batch=128)
    m_full = reconstruction_mse(full, x)
    m_streamed = reconstruction_mse(streamed, x)
    assert m_streamed < m_full * 1.5 + 0.5, (m_full, m_streamed)
