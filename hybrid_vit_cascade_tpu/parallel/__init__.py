"""Parallelism layer: one `jax.sharding.Mesh` + NamedSharding layouts.

Replaces the reference's entire distributed stack — mp.spawn + NCCL process
groups + DistributedDataParallel + DistributedSampler + dist.barrier
(train_direct_4gpu.py:25-37, train_progressive_4gpu.py:32-44) — with data
declarations: parameters replicated, batches sharded over the 'data' axis,
gradient all-reduce inserted automatically by XLA over ICI.
"""

from .mesh import (
    ambient_mesh,
    data_sharding,
    local_device_count,
    make_mesh,
    model_axis_size,
    replicated_sharding,
    gather_model_axis,
    shard_spatial_d,
    shard_tokens,
)

__all__ = [
    "ambient_mesh",
    "data_sharding",
    "local_device_count",
    "make_mesh",
    "model_axis_size",
    "replicated_sharding",
    "gather_model_axis",
    "shard_spatial_d",
    "shard_tokens",
]
