from ripor_tpu.parallel.sharding import (
    batch_sharding,
    param_partition_spec,
    shard_batch,
    shard_params,
)

__all__ = ["param_partition_spec", "shard_params", "shard_batch", "batch_sharding"]
