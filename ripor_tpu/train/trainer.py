"""Trainer: jitted SPMD train step + optimizer + loop.

Replaces the reference's ~870-line forked HF Trainer (tasks/trainer.py:104-977)
with a compact functional design: one jitted train step under the mesh
(gradient psum over ICI happens inside jit via batch sharding — the DDP
boundary at tasks/trainer.py:252-261 disappears), weighted multi-loss
accounting (:232-243), gradient accumulation (:621-628), clipping + AdamW +
linear warmup/decay (HF defaults the reference inherits), and NaN-loss
filtering (:632-639).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ripor_tpu.parallel.sharding import shard_batch
from ripor_tpu.train import losses as loss_lib


@dataclasses.dataclass
class TrainConfig:
    loss_type: str = "t5seq_aq_encoder_margin_mse"
    learning_rate: float = 1e-4
    warmup_steps: int = 0
    total_steps: int = 100_000
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    grad_accum: int = 1
    loss_weights: Optional[Dict[str, float]] = None  # default: all 1.0 (arguments.py:109-141)
    bf16_compute: bool = True
    # ZeRO-style: shard Adam mu/nu over the mesh 'data' axis (the reference
    # only inherits dead fairscale ShardedDDP branches, tasks/trainer.py:34)
    shard_opt_state: bool = False
    # Decoupled L2-SP anchor (continual-learning regularizer; no reference
    # analogue — the reference's MS MARCO phase 3 never re-ranks a trainset
    # small enough to erode the doc->smtid mapping, but at slice scale the
    # rank stages measurably do; artifacts/phase3_dynamics_r5.md §2). Each
    # step, AFTER the optimizer update, params relax toward the anchor
    # checkpoint: p <- p - r*(p - anchor) with r = l2sp_rate. Decoupled
    # (applied outside the loss) because a coupled L2 penalty is normalized
    # away by Adam's per-coordinate rescaling. Random-walk drift then
    # reaches a stationary scale ~ lr*sqrt(1/(2r)) while a coordinate with
    # persistent data gradient can still travel ~ lr/r — the spring damps
    # unopposed drift (forgetting) much harder than consistent learning
    # signal. Requires anchor_params at Trainer construction.
    l2sp_rate: float = 0.0


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.learning_rate, max(cfg.warmup_steps, 1)),
         optax.linear_schedule(cfg.learning_rate, 0.0,
                               max(cfg.total_steps - cfg.warmup_steps, 1))],
        [cfg.warmup_steps])
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=cfg.weight_decay),
    )


def make_train_step(model, cfg: TrainConfig,
                    tx: optax.GradientTransformation,
                    anchor_params=None) -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    Micro-batching for gradient accumulation happens inside the step via
    lax.scan over a leading accumulation axis when cfg.grad_accum > 1
    (batch arrays then have shape [accum, micro_bz, ...]).
    """
    loss_fn = loss_lib.LOSS_FNS[cfg.loss_type]
    weights = cfg.loss_weights or {}

    def weighted_total(loss_dict):
        total = 0.0
        for name, value in loss_dict.items():
            total = total + weights.get(name, 1.0) * value
        return total

    def loss_and_metrics(params, batch, rng):
        loss_dict = loss_fn(model, params, batch, train=True, rng=rng)
        total = weighted_total(loss_dict)
        # NaN/Inf filtering (reference tasks/trainer.py:632-639): zero the
        # step's contribution rather than poisoning the params
        safe_total = jnp.where(jnp.isfinite(total), total, 0.0)
        return safe_total, {**loss_dict, "loss": total}

    grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)

    def train_step(state: TrainState, batch, rng):
        if cfg.grad_accum > 1:
            def micro(carry, xs):
                acc_grads, acc_metrics = carry
                mb, r = xs
                (_, metrics), grads = grad_fn(state.params, mb, r)
                acc_grads = jax.tree.map(jnp.add, acc_grads, grads)
                acc_metrics = jax.tree.map(jnp.add, acc_metrics, metrics)
                return (acc_grads, acc_metrics), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            rngs = jax.random.split(rng, cfg.grad_accum)
            first_mb = jax.tree.map(lambda x: x[0], batch)
            (_, metrics0), g0 = grad_fn(state.params, first_mb, rngs[0])
            rest = jax.tree.map(lambda x: x[1:], batch)
            (grads, metrics), _ = jax.lax.scan(
                micro, (g0, metrics0), (rest, rngs[1:]))
            scale = 1.0 / cfg.grad_accum
            grads = jax.tree.map(lambda g: g * scale, grads)
            metrics = jax.tree.map(lambda m: m * scale, metrics)
        else:
            (_, metrics), grads = grad_fn(state.params, batch, rng)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        if anchor_params is not None and cfg.l2sp_rate > 0:
            r = cfg.l2sp_rate
            params = jax.tree.map(
                lambda p, a: (p - r * (p - a.astype(p.dtype))),
                params, anchor_params)
            metrics["anchor_drift"] = optax.global_norm(
                jax.tree.map(lambda p, a: p - a.astype(p.dtype),
                             params, anchor_params))
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return train_step


def jit_train_step(train_step: Callable, mesh: Mesh, params_example,
                  opt_specs=None) -> Callable:
    """Jit the step with state replicated-or-TP-sharded and batch
    data-sharded; XLA inserts the gradient all-reduce over ICI. The state
    (params + Adam moments, ~3x params bytes) is DONATED so the update is
    in place instead of double-buffered. ``opt_specs``: optional
    PartitionSpec pytree pinning the optimizer state (ZeRO sharding over
    'data'; parallel/sharding.py::opt_state_pspec_tree)."""
    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, batch, rng):
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))),
            batch)
        new_state, metrics = train_step(state, batch, rng)
        if opt_specs is not None:
            new_state = new_state.replace(opt_state=jax.tree.map(
                lambda x, s: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, s)),
                new_state.opt_state, opt_specs))
        return new_state, metrics

    return step


class Trainer:
    """Minimal training loop driver: host feeds batches, device steps.

    Model-agnostic: ``model`` is any flax module whose LOSS_FNS entry knows
    its apply signature (RiporModel, T5SeqCrossEncoder, BertCrossEncoder,
    T5DenseEncoder — the reference trains all of these through one trainer,
    tasks/trainer.py + main.py loss_type dispatch).

    Periodic checkpointing + auto-resume mirror the reference trainer's
    save_steps / resume_from_checkpoint (tasks/trainer.py:186-200,
    380-412,521-544): pass a ``checkpoint_dir`` and an interrupted run
    restarts from the latest step (params + optimizer state + step count;
    already-consumed batches are skipped to preserve the data order)."""

    def __init__(self, model, cfg: TrainConfig, params,
                 mesh: Optional[Mesh] = None, log_fn=None,
                 checkpoint_dir: Optional[str] = None,
                 save_steps: int = 15_000, max_to_keep: int = 5,
                 eval_fn=None, eval_steps: int = 0, anchor_params=None):
        self.model = model
        self.cfg = cfg
        self.tx = make_optimizer(cfg)
        # the step DONATES the state (in-place update, no double buffer);
        # copy once so the caller's params pytree stays valid
        params = jax.tree.map(jnp.copy, params)
        self.state = TrainState.create(params, self.tx)
        self.mesh = mesh
        opt_specs = None
        if mesh is not None and cfg.shard_opt_state:
            from ripor_tpu.parallel.sharding import (opt_state_pspec_tree,
                                                     shard_opt_state)
            opt_specs = opt_state_pspec_tree(self.state.opt_state, params)
            self.state = self.state.replace(
                opt_state=shard_opt_state(self.state.opt_state, params, mesh))
        if cfg.l2sp_rate > 0 and anchor_params is None:
            raise ValueError("l2sp_rate > 0 requires anchor_params")
        step = make_train_step(model, cfg, self.tx,
                               anchor_params=anchor_params)
        self._step = (jit_train_step(step, mesh, params, opt_specs)
                      if mesh is not None
                      else jax.jit(step, donate_argnums=(0,)))
        self.log_fn = log_fn or (lambda m, s: None)
        self.save_steps = save_steps
        # periodic in-training evaluation (reference CondDocID_DRTrainer
        # evaluate() on dev queries, tasks/trainer.py:870-977): eval_fn
        # receives the live params and returns a metrics dict that is
        # emitted as its own log record for the same step (separate from the
        # train-metric line; e.g. evaluation/dev_eval.py::dev_eval)
        self.eval_fn = eval_fn
        self.eval_steps = eval_steps
        self._ckpt = None
        if checkpoint_dir is not None:
            from ripor_tpu.train.checkpoint import CheckpointManager
            self._ckpt = CheckpointManager(checkpoint_dir, max_to_keep)
            latest = self._ckpt.latest_step()
            if latest is not None:
                self.state = self._ckpt.restore(latest, like=self.state)
        # resume point: pass start_batch=trainer.resume_step to the batch
        # builders (data/collators.py batches_from_*) so resume skips
        # consumed batches at the sampler-index level instead of
        # re-collating them (the reference fast-forwards its sampler)
        self.resume_step = int(self.state.step)

    def run(self, batches, rng, log_every: int = 100,
            flops_per_step: Optional[float] = None,
            batches_start: int = 0):
        """batches: iterable of fixed-shape batch dicts. Pass
        ``flops_per_step`` (e.g. 6 * n_params * tokens_per_batch) to get
        MFU in the logs (utils/observability.py; the reference only has
        HF's FLOs counter, tasks/trainer.py:649).

        ``batches_start``: global index of the first yielded batch (set it
        to the builder's start_batch for fast resume). The per-step dropout
        rng is fold_in(rng, step) so resumed and uninterrupted runs are
        bit-identical regardless of how batches were fast-forwarded."""
        from ripor_tpu.utils.observability import StepTimer
        timer = StepTimer(warmup=2, flops_per_step=flops_per_step,
                          n_devices=(self.mesh.size if self.mesh else 1))
        metrics = None
        start_step = int(self.state.step)
        for i, batch in enumerate(batches, start=batches_start):
            if i < start_step:      # fallback: iterable not fast-forwarded
                continue
            sub = jax.random.fold_in(rng, i)
            if self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            with timer:
                self.state, metrics = self._step(self.state, batch, sub)
            step = int(self.state.step)
            if step % log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host.update(timer.summary())
                self.log_fn(host, step)
            if (self.eval_fn is not None and self.eval_steps
                    and step % self.eval_steps == 0):
                self.log_fn(dict(self.eval_fn(self.state.params)), step)
            if self._ckpt is not None and step % self.save_steps == 0:
                self._ckpt.save(step, self.state)
        if self._ckpt is not None and metrics is not None:
            self._ckpt.save(int(self.state.step), self.state)
        return self.state, metrics
