"""Residual quantization (RQ) — the DocID builder.

TPU-native replacement for faiss ``IndexResidualQuantizer(d, M, nbits)``
(reference: tasks/evaluator.py:406-421 trains it on the 8.8M x 768 embedding
mmap; aq_preprocess/create_customized_smtid_file.py:33-59 extracts the codes
with ``rq.compute_codes``; change_customized_embed_layer.py:44-81 reads
``rq.codebooks`` into the model's embedding tables).

Here all three become one module: ``train_rq`` fits the [M, K, d] codebook
tensor (whose layout directly initializes ``RiporModel.codebooks`` — no
checkpoint surgery), ``rq_encode`` assigns codes by beam search over stages
(faiss's residual quantizer beam-searches too; greedy == beam 1), and
``rq_decode`` reconstructs. Every hot step is a batched matmul on the MXU.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ripor_tpu.quantize.kmeans import assign_codes, kmeans_fit, kmeans_fit_batched


@dataclasses.dataclass
class RQCodebooks:
    """codebooks: [M, K, d] float32 — same layout as RiporModel.codebooks."""

    codebooks: np.ndarray

    @property
    def M(self) -> int:
        return self.codebooks.shape[0]

    @property
    def K(self) -> int:
        return self.codebooks.shape[1]

    @property
    def d(self) -> int:
        return self.codebooks.shape[2]

    def save(self, path: str) -> None:
        np.save(path, self.codebooks)

    @staticmethod
    def load(path: str) -> "RQCodebooks":
        return RQCodebooks(np.load(path))


def train_rq(x, M: int, K: int, kmeans_iters: int = 25,
             key: Optional[jax.Array] = None, batch: int = 0) -> RQCodebooks:
    """Fit M residual-stage codebooks of K centroids each on x [N, d].

    Stage m runs k-means on the residuals after subtracting stages < m
    (greedy residual training, faiss's default). ``batch`` > 0 streams
    datasets larger than HBM through kmeans_fit_batched.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    books = []
    if batch:
        # residuals are updated in place per stage; copy (the input is
        # typically a read-only memmap of the corpus embeddings)
        residual = np.array(x, np.float32, copy=True)
        for _ in range(M):
            key, sub = jax.random.split(key)
            centroids = np.asarray(
                kmeans_fit_batched(residual, K, kmeans_iters, sub, batch),
                np.float32)
            for s in range(0, residual.shape[0], batch):
                blk = jnp.asarray(residual[s:s + batch])
                a = np.asarray(assign_codes(blk, jnp.asarray(centroids)))
                residual[s:s + batch] -= centroids[a]
            books.append(centroids)
    else:
        residual = jnp.asarray(x, jnp.float32)
        for _ in range(M):
            key, sub = jax.random.split(key)
            centroids, assign = kmeans_fit(residual, K, kmeans_iters, sub)
            books.append(np.asarray(centroids, np.float32))
            residual = residual - centroids[assign]
    return RQCodebooks(np.stack(books, axis=0))


@functools.partial(jax.jit, static_argnames=("beam",))
def _rq_beam_encode(x: jnp.ndarray, books: jnp.ndarray, beam: int):
    """Beam-search RQ encoding. x: [N, d], books: [M, K, d] ->
    (codes [N, M] int32, err [N] final squared reconstruction error)."""
    n, d = x.shape
    M, K, _ = books.shape
    assert beam <= K, "beam width cannot exceed codebook size"
    residual = jnp.broadcast_to(x[:, None, :], (n, beam, d)).astype(jnp.float32)
    codes = jnp.zeros((n, beam, M), jnp.int32)
    # only beam slot 0 is live initially (others would duplicate it)
    err = jnp.where(jnp.arange(beam) == 0, 0.0, jnp.inf)[None, :]
    err = jnp.broadcast_to(err, (n, beam))

    def stage(carry, inp):
        m, book = inp                                     # book: [K, d]
        residual, codes, err = carry
        dots = jnp.einsum("nbd,kd->nbk", residual, book,
                          preferred_element_type=jnp.float32)
        c2 = jnp.sum(book * book, axis=-1)
        r2 = jnp.sum(residual * residual, axis=-1, keepdims=True)
        cand = err[:, :, None] + r2 - 2.0 * dots + c2[None, None, :]
        neg_err, top_idx = jax.lax.top_k(-cand.reshape(n, beam * K), beam)
        src = top_idx // K                                 # [N, beam]
        tok = (top_idx % K).astype(jnp.int32)
        residual = jnp.take_along_axis(residual, src[:, :, None], axis=1)
        residual = residual - book[tok]
        codes = jnp.take_along_axis(codes, src[:, :, None], axis=1)
        codes = jnp.where((jnp.arange(M) == m)[None, None, :],
                          tok[:, :, None], codes)
        return (residual, codes, -neg_err), None

    (_, codes, err), _ = jax.lax.scan(
        stage, (residual, codes, err), (jnp.arange(M), books))
    return codes[:, 0, :], err[:, 0]


def rq_encode(books: RQCodebooks | np.ndarray, x, beam: int = 4,
              block: int = 262_144) -> np.ndarray:
    """Assign RQ codes to x [N, d] -> [N, M] int32 (replaces
    ``rq.compute_codes`` + faiss BitstringReader unpacking,
    create_customized_smtid_file.py:34-45). Streams in blocks."""
    books_arr = jnp.asarray(
        books.codebooks if isinstance(books, RQCodebooks) else books, jnp.float32)
    x = np.asarray(x, np.float32)
    outs = []
    for s in range(0, x.shape[0], block):
        codes, _ = _rq_beam_encode(jnp.asarray(x[s:s + block]), books_arr, beam)
        outs.append(np.asarray(codes))
    return np.concatenate(outs, axis=0)


def rq_decode(books: RQCodebooks | np.ndarray, codes) -> np.ndarray:
    """Reconstruct vectors from codes [N, M] -> [N, d]."""
    b = np.asarray(books.codebooks if isinstance(books, RQCodebooks) else books)
    codes = np.asarray(codes)
    M = b.shape[0]
    return b[np.arange(M)[None, :], codes].sum(axis=1)


def reconstruction_mse(books, x, codes=None, beam: int = 4) -> float:
    x = np.asarray(x, np.float32)
    if codes is None:
        codes = rq_encode(books, x, beam=beam)
    recon = rq_decode(books, codes)
    return float(np.mean(np.sum((x - recon) ** 2, axis=-1)))
