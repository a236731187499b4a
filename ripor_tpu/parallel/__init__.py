from ripor_tpu.parallel.sharding import (
    batch_sharding,
    opt_state_pspec_tree,
    param_partition_spec,
    shard_batch,
    shard_opt_state,
    shard_params,
)

__all__ = ["param_partition_spec", "shard_params", "shard_batch",
           "batch_sharding", "opt_state_pspec_tree", "shard_opt_state"]
