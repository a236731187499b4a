"""Parameter / batch sharding rules over the ('data', 'model') mesh.

The reference's only strategy is 8-way DDP (SURVEY.md §2.5). Here data
parallelism is batch sharding over the 'data' axis (XLA inserts the gradient
psum over ICI), and tensor parallelism is first-class: attention heads and
d_ff shard over the 'model' axis megatron-style, the token-embedding vocab
dim likewise; codebooks/norms/rel-pos tables replicate (K=256 rows are too
small to matter, and replication keeps constrained-decode gathers local).
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ripor_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


def param_partition_spec(path: tuple, leaf: Any) -> P:
    """PartitionSpec for one parameter, keyed by its pytree path."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    ndim = getattr(leaf, "ndim", 0)

    if ndim < 2:
        return P()
    # attention projections: qkv [d_model, inner] shard inner; o [inner, d_model]
    if joined.endswith("q/kernel") or joined.endswith("k/kernel") or joined.endswith("v/kernel"):
        return P(None, MODEL_AXIS)
    if joined.endswith("o/kernel"):
        return P(MODEL_AXIS, None)
    # FFN: wi/wi_0/wi_1 [d_model, d_ff] shard d_ff; wo [d_ff, d_model]
    if "wi" in joined.split("/")[-2:][0] and joined.endswith("kernel"):
        return P(None, MODEL_AXIS)
    if joined.endswith("wo/kernel"):
        return P(MODEL_AXIS, None)
    # token embedding [vocab, d_model]: shard vocab
    if joined.endswith("shared/embedding"):
        return P(MODEL_AXIS, None)
    # codebooks [M, K, d], rel-pos tables, norms: replicate
    return P()


def params_pspec_tree(params):
    return jax.tree_util.tree_map_with_path(param_partition_spec, params)


def shard_params(params, mesh: Mesh):
    """Device-put params with TP/replication shardings."""
    specs = params_pspec_tree(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Shard every batch array along its leading (batch) dim."""
    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)
