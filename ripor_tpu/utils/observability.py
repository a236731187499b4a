"""Tracing / profiling / metrics — greenfield subsystem (the reference has
none beyond HF's FLOs counter; SURVEY.md §5.1).

* ``profile_trace`` — jax.profiler trace context writing TensorBoard-readable
  traces (works on TPU; view with xprof/tensorboard-profile).
* ``StepTimer`` — wall-clock step timing with warmup skip + percentile
  summary + MFU given a per-step FLOP estimate.
* ``MetricsLogger`` — JSONL metrics sink with optional wandb mirroring
  (rank-0 gated, like the reference's main.py:160-162).
"""
from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

# v5e bf16 peak per chip (MXU): 197 TFLOP/s
TPU_PEAK_FLOPS = {"v5e": 197e12, "v4": 275e12, "v5p": 459e12}


@contextlib.contextmanager
def profile_trace(log_dir: str | Path) -> Iterator[None]:
    """Capture a device trace: ``with profile_trace('/tmp/trace'): step()``."""
    import jax
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def estimate_train_flops_per_token(n_params: int) -> float:
    """6 * params per token (fwd 2x + bwd 4x), the standard estimate."""
    return 6.0 * n_params


class StepTimer:
    def __init__(self, warmup: int = 2,
                 flops_per_step: Optional[float] = None,
                 chip: str = "v5e", n_devices: int = 1):
        self.warmup = warmup
        self.flops_per_step = flops_per_step
        self.peak = TPU_PEAK_FLOPS.get(chip, 197e12) * n_devices
        self.times: list = []
        self._t0: Optional[float] = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        out = {
            "steps": int(len(arr)),
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p95_s": float(np.percentile(arr, 95)),
            "steps_per_sec": float(1.0 / arr.mean()),
        }
        if self.flops_per_step:
            out["mfu"] = float(self.flops_per_step / arr.mean() / self.peak)
        return out


class MetricsLogger:
    """Append-only JSONL metrics + optional wandb (never required)."""

    def __init__(self, path: Optional[str | Path] = None,
                 wandb_project: Optional[str] = None, rank: int = 0):
        self.path = Path(path) if path else None
        self.rank = rank
        self._wandb = None
        if wandb_project and rank == 0:
            try:
                import wandb
                self._wandb = wandb.init(project=wandb_project)
            except Exception:
                self._wandb = None
        if self.path and rank == 0:
            self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if self.rank != 0:
            return
        rec = {"step": step, "ts": time.time(), **metrics}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def __call__(self, metrics: Dict[str, float], step: int) -> None:
        self.log(metrics, step)
