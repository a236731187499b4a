"""Auxiliary losses and regularizers.

Capability parity with the reference's losses/ package (SPLADE-era pieces
kept for the sparse loss_types in the whitelist, arguments.py:82-100):
  RegWeightScheduler (losses/regulariaztion.py:27-49), FLOPS/L0/L1/
  SparsityRatio (:4-67), RankNet pairwise (losses/pairwise.py:3-45).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class RegWeightScheduler:
    """Quadratic ramp of a regularizer weight over T steps, then constant
    (reference :27-49: lambda * (step/T)^2 for step <= T)."""

    def __init__(self, lambda_: float, T: int):
        self.lambda_ = lambda_
        self.T = T

    def __call__(self, step) -> jnp.ndarray:
        ratio = jnp.minimum(step / self.T, 1.0)
        return self.lambda_ * ratio ** 2

    # torch-style stateful API kept for familiarity
    def step(self, step):
        return self(step)


def flops_reg(reps: jnp.ndarray) -> jnp.ndarray:
    """FLOPS regularizer: sum_j (mean_i |a_ij|)^2 (reference :4-11)."""
    return jnp.sum(jnp.mean(jnp.abs(reps), axis=0) ** 2)


def l1_reg(reps: jnp.ndarray) -> jnp.ndarray:
    """Mean L1 norm (reference :24-31)."""
    return jnp.mean(jnp.sum(jnp.abs(reps), axis=-1))


def l0_stat(reps: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Mean number of (near-)nonzero activations — a *statistic*, not a
    differentiable loss (reference L0 :34-45)."""
    return jnp.mean(jnp.sum((jnp.abs(reps) > eps).astype(jnp.float32), axis=-1))


def sparsity_ratio(reps: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    """Fraction of zero activations (reference :48-67)."""
    return 1.0 - l0_stat(reps, eps) / reps.shape[-1]


def ranknet_loss(pos_scores: jnp.ndarray, neg_scores: jnp.ndarray,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """RankNet pairwise loss: -log sigma(s+ - s-) (reference pairwise.py:3-45,
    used by the t5seq_aq_encoder_ranknet loss_type)."""
    margin = (pos_scores - neg_scores).astype(jnp.float32)
    loss = jnp.log1p(jnp.exp(-margin))
    if weights is not None:
        loss = loss * weights
    return jnp.mean(loss)
