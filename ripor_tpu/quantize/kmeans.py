"""Sharded k-means in pure JAX (replaces faiss's CPU k-means inside
IndexResidualQuantizer; reference call site tasks/evaluator.py:406-421).

Lloyd iterations are MXU-friendly: distance = ||x||^2 - 2 x C^T + ||C||^2 is
one big matmul; cluster sums are segment-sums. Under jit with the data batch
sharded over the 'data' mesh axis and centroids replicated, XLA inserts the
psum over ICI automatically — no hand-written collectives needed.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def assign_codes(x: jnp.ndarray, centroids: jnp.ndarray,
                 block: int = 0) -> jnp.ndarray:
    """Nearest-centroid assignment. x: [N, d], centroids: [K, d] -> [N] int32.

    Squared-L2 argmin == argmax(x·c - ||c||^2/2); one matmul on the MXU.
    """
    logits = x @ centroids.T - 0.5 * jnp.sum(centroids * centroids, axis=-1)[None]
    return jnp.argmin(-logits, axis=-1).astype(jnp.int32)


def _lloyd_step(x, centroids, key):
    k = centroids.shape[0]
    assign = assign_codes(x, centroids)
    one_hot = jax.nn.one_hot(assign, k, dtype=x.dtype)          # [N, K]
    sums = one_hot.T @ x                                        # [K, d]
    counts = jnp.sum(one_hot, axis=0)                           # [K]
    new_centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    # empty-cluster repair: re-seed dead centroids from random points
    # (faiss does the same during its k-means)
    rand_idx = jax.random.randint(key, (k,), 0, x.shape[0])
    new_centroids = jnp.where((counts > 0)[:, None], new_centroids, x[rand_idx])
    return new_centroids, assign


def _kmeanspp_init(x: jnp.ndarray, k: int, key: jax.Array) -> jnp.ndarray:
    """k-means++ seeding: each new centroid sampled with prob ∝ D(x)^2.

    One matmul-free distance update per step (only against the newest
    centroid), so the whole init costs ~one Lloyd iteration."""
    n, d = x.shape
    key, first = jax.random.split(key)
    c0 = x[jax.random.randint(first, (), 0, n)]
    centroids = jnp.zeros((k, d), x.dtype).at[0].set(c0)
    d2 = jnp.sum((x - c0) ** 2, axis=-1)

    def body(i, carry):
        centroids, d2, key = carry
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        idx = jax.random.categorical(sub, jnp.log(probs + 1e-30))
        c = x[idx]
        centroids = centroids.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((x - c) ** 2, axis=-1))
        return centroids, d2, key

    centroids, _, _ = jax.lax.fori_loop(1, k, body, (centroids, d2, key))
    return centroids


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(x: jnp.ndarray, k: int, iters: int = 20,
               key: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fit k centroids with Lloyd's algorithm, k-means++ init.
    Returns (centroids [K, d], assignments [N])."""
    if key is None:
        key = jax.random.PRNGKey(0)
    key, init_key = jax.random.split(key)
    n = x.shape[0]
    centroids = _kmeanspp_init(x, k, init_key)

    def body(carry, step_key):
        c, _ = carry
        c, assign = _lloyd_step(x, c, step_key)
        return (c, assign), None

    step_keys = jax.random.split(key, iters)
    (centroids, assign), _ = jax.lax.scan(
        body, (centroids, jnp.zeros((n,), jnp.int32)), step_keys)
    return centroids, assign


def kmeans_fit_batched(x, k: int, iters: int = 20, key=None,
                       batch: int = 1_000_000):
    """Host-driven k-means for datasets too large for one device buffer:
    each Lloyd iteration streams batches (device does matmuls + partial
    sums, host accumulates). Use kmeans_fit when x fits in HBM."""
    import numpy as np

    if key is None:
        key = jax.random.PRNGKey(0)
    x = np.asarray(x)
    n, d = x.shape
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    centroids = jnp.asarray(x[rng.choice(n, size=k, replace=n < k)])

    @jax.jit
    def partial_stats(xb, c):
        assign = assign_codes(xb, c)
        one_hot = jax.nn.one_hot(assign, c.shape[0], dtype=xb.dtype)
        return one_hot.T @ xb, jnp.sum(one_hot, axis=0)

    for _ in range(iters):
        sums = np.zeros((k, d), np.float64)
        counts = np.zeros((k,), np.float64)
        for s in range(0, n, batch):
            bs, bc = partial_stats(jnp.asarray(x[s:s + batch]), centroids)
            sums += np.asarray(bs, np.float64)
            counts += np.asarray(bc, np.float64)
        new = sums / np.maximum(counts, 1.0)[:, None]
        dead = counts == 0
        if dead.any():
            new[dead] = x[rng.choice(n, size=int(dead.sum()))]
        centroids = jnp.asarray(new, x.dtype if hasattr(x, "dtype") else jnp.float32)
    return centroids
