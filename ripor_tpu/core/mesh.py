"""Device mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP substrate (reference: t5_pretrainer/evaluate.py:181-182,
torch.distributed.launch in full_scripts/*.sh) with a jax.sharding.Mesh. The framework
uses a 2-D logical mesh:

  * ``data``  — data parallelism (batch sharding, gradient psum). Maps to the
                reference's 8-way DDP.
  * ``model`` — tensor parallelism over attention heads / d_ff / codebook K
                (absent in the reference; first-class here).

Multi-host (multi-slice) runs call :func:`distributed_init` once per process;
single-process multi-device runs (one host with N chips, or the CPU-simulated
8-device mesh used in tests) just build the mesh from ``jax.devices()``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh geometry. ``data * model`` must equal the device count."""

    data: int = -1  # -1: infer (device_count // model)
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        model = self.model
        data = self.data
        if data == -1:
            if n_devices % model != 0:
                raise ValueError(f"{n_devices} devices not divisible by model={model}")
            data = n_devices // model
        if data * model != n_devices:
            raise ValueError(f"mesh {data}x{model} != {n_devices} devices")
        return MeshSpec(data=data, model=model)


def create_mesh(spec: MeshSpec | None = None, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    spec = (spec or MeshSpec()).resolve(len(devices))
    dev_array = np.asarray(devices).reshape(spec.data, spec.model)
    return Mesh(dev_array, axis_names=(DATA_AXIS, MODEL_AXIS))


def local_mesh() -> Mesh:
    """Data-parallel-only mesh over all visible devices."""
    return create_mesh(MeshSpec(data=-1, model=1))


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (maps to the reference's init_process_group,
    t5_pretrainer/evaluate.py:181-182). No-op when single-process."""
    if num_processes is None:
        num_processes = int(os.environ.get("RIPOR_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def shard(mesh: Mesh, *axes: Optional[str]) -> NamedSharding:
    """NamedSharding for the given per-dimension mesh axes (None = replicated)."""
    return NamedSharding(mesh, P(*axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, ndim_tail: int = 0) -> NamedSharding:
    """Batch-dim sharded over 'data', remaining dims replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * ndim_tail)))


def process_count() -> int:
    return jax.process_count()


def is_first_process() -> bool:
    """Rank-0 gate (reference: utils/utils.py:6-7 ``is_first_worker``)."""
    return jax.process_index() == 0
