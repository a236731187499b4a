"""Product quantization — the PQ baseline indexer.

Replaces faiss ``IndexPQ`` (reference ProductQuantizeIndexer,
tasks/evaluator.py:265-288): the d-dim space splits into M subspaces of
d/M dims, each with its own K-entry codebook (independent k-means —
embarrassingly parallel, one vmap over subspaces).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.quantize.kmeans import kmeans_fit


@dataclasses.dataclass
class PQCodebooks:
    """codebooks: [M, K, d/M] float32."""

    codebooks: np.ndarray

    @property
    def M(self) -> int:
        return self.codebooks.shape[0]

    @property
    def K(self) -> int:
        return self.codebooks.shape[1]

    def save(self, path: str) -> None:
        np.save(path, self.codebooks)

    @staticmethod
    def load(path: str) -> "PQCodebooks":
        return PQCodebooks(np.load(path))


def train_pq(x, M: int, K: int, kmeans_iters: int = 25,
             key: Optional[jax.Array] = None) -> PQCodebooks:
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    assert d % M == 0, (d, M)
    sub = x.reshape(n, M, d // M)
    if key is None:
        key = jax.random.PRNGKey(0)
    books = []
    for m in range(M):
        key, k_key = jax.random.split(key)
        centroids, _ = kmeans_fit(sub[:, m], K, kmeans_iters, k_key)
        books.append(np.asarray(centroids, np.float32))
    return PQCodebooks(np.stack(books))


def pq_encode(books: PQCodebooks | np.ndarray, x) -> np.ndarray:
    b = jnp.asarray(books.codebooks if isinstance(books, PQCodebooks) else books)
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    M, K, ds = b.shape
    sub = x.reshape(n, M, ds)
    # argmin ||x_m - c||^2 per subspace, batched einsum
    dots = jnp.einsum("nms,mks->nmk", sub, b, preferred_element_type=jnp.float32)
    c2 = jnp.sum(b * b, axis=-1)  # [M, K]
    return np.asarray(jnp.argmin(c2[None] - 2 * dots, axis=-1), np.int32)


def pq_decode(books: PQCodebooks | np.ndarray, codes) -> np.ndarray:
    b = np.asarray(books.codebooks if isinstance(books, PQCodebooks) else books)
    codes = np.asarray(codes)
    M = b.shape[0]
    return b[np.arange(M)[None, :], codes].reshape(codes.shape[0], -1)
