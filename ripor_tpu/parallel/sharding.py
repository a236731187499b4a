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


def decode_param_partition_spec(path: tuple, leaf: Any) -> P:
    """TP PartitionSpec for one parameter on the DECODE path (shard_map):
    like :func:`param_partition_spec` except (a) the token embedding
    replicates — lookups use global ids, a vocab shard would zero OOV rows —
    and (b) relative-position bias tables [buckets, H] shard by head so the
    per-device attention sees exactly its head slice."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if joined.endswith("shared/embedding"):
        return P()
    if joined.endswith("rel_bias/rel_embedding"):
        return P(None, MODEL_AXIS)
    return param_partition_spec(path, leaf)


def decode_params_pspec_tree(params):
    return jax.tree_util.tree_map_with_path(decode_param_partition_spec,
                                            params)


def shard_params(params, mesh: Mesh):
    """Device-put params with TP/replication shardings."""
    specs = params_pspec_tree(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def opt_moment_spec(param_spec: P, leaf: Any) -> P:
    """ZeRO-style spec for one optimizer moment: keep the param's TP axes
    and shard the largest remaining free dim over 'data'.

    The reference inherits (but never enables) HF/fairscale sharded-optimizer
    code paths (tasks/trainer.py:34,61,467-475 ``ShardedDDPOption``); here
    optimizer-state sharding is first-class: Adam's mu/nu — 2/3 of training
    state bytes — distribute over the data axis and XLA GSPMD inserts the
    reduce-scatter/all-gather pair around the update."""
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0:
        return P()
    spec = list(param_spec) + [None] * (ndim - len(param_spec))
    spec = spec[:ndim]
    free = [i for i, s in enumerate(spec) if s is None]
    if not free:
        return P(*spec)
    largest = max(free, key=lambda i: leaf.shape[i])
    if leaf.shape[largest] < 8:  # tiny tensors: replication is cheaper
        return P(*spec)
    spec[largest] = DATA_AXIS
    return P(*spec)


def opt_state_pspec_tree(opt_state, params):
    """PartitionSpec pytree for an optax state: subtrees that mirror the
    params pytree (Adam mu/nu) get :func:`opt_moment_spec`; everything else
    (step counts, empty states) replicates."""
    pstruct = jax.tree.structure(params)
    pspecs = params_pspec_tree(params)

    def is_param_tree(x):
        try:
            return jax.tree.structure(x) == pstruct
        except Exception:
            return False

    def per_node(x):
        if is_param_tree(x):
            return jax.tree.map(opt_moment_spec, pspecs, x)
        return jax.tree.map(lambda _: P(), x)

    return jax.tree.map(per_node, opt_state, is_leaf=is_param_tree)


def shard_opt_state(opt_state, params, mesh: Mesh):
    """Device-put an optax state with ZeRO-style 'data'-axis sharding."""
    specs = opt_state_pspec_tree(opt_state, params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        opt_state, specs)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Shard every batch array along its leading (batch) dim.

    Multi-host semantics (the reference's DistributedSampler contract,
    t5_pretrainer/main.py:116-124): when ``jax.process_count() > 1`` each
    process feeds its LOCAL slice of the global batch (e.g. via
    ``emb_store.host_shard_slice``) and the slices are assembled into one
    global array with ``make_array_from_process_local_data`` — no host ever
    materialises the full batch. Single-process runs device_put the whole
    batch onto the mesh as before."""
    import numpy as np

    multihost = jax.process_count() > 1

    def put(x):
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree.map(put, batch)
