"""Checkpointing with Orbax + phase-transition transforms.

Replaces the reference's HF Trainer checkpoints (tasks/trainer.py:186-200,
resume :380-412,521-544) and — crucially — the between-phase *checkpoint
surgery* scripts that change tensor shapes
(aq_preprocess/change_customized_embed_layer.py:59-84): here codebook
install/resize is an explicit transform applied at restore time.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp

from ripor_tpu.models.config import RiporConfig


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 5):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any, config: Optional[RiporConfig] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if config is not None:
            (self.directory / "config.json").write_text(config.to_json())
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, like: Any = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if like is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(like))
        return self._mgr.restore(step)

    def load_config(self) -> RiporConfig:
        return RiporConfig.from_json((self.directory / "config.json").read_text())


def save_params(path: str | Path, params, config: Optional[RiporConfig] = None):
    """One-shot final save (reference trainer's final save, main.py:185-186)."""
    path = Path(path).absolute()
    path.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path / "params", params)
    ckpt.wait_until_finished()
    if config is not None:
        (path / "config.json").write_text(config.to_json())


def load_params(path: str | Path, like=None):
    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path / "params", target=like)


def resize_codebooks(params: dict, new_M: int, new_K: int,
                     init_scale: float = 1.0, seed: int = 0) -> dict:
    """Phase-transition transform: change DocID geometry between phases
    (the reference does this by rebuilding nn.Embedding lists and saving a
    'no_share_checkpoint'; change_customized_embed_layer.py:59-84).
    Existing rows are kept where they fit; new rows are N(0, init_scale)."""
    rng = np.random.default_rng(seed)
    out = dict(params)
    for name in ("codebooks", "output_codebooks"):
        if name not in params:
            continue
        old = np.asarray(params[name])
        M, K, d = old.shape
        new = (init_scale * rng.standard_normal((new_M, new_K, d))).astype(old.dtype)
        new[:min(M, new_M), :min(K, new_K)] = old[:min(M, new_M), :min(K, new_K)]
        out[name] = new
    return out
