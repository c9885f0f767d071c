"""Mesh construction and sharding plans (tensor/data parallel serving)."""

from caesar_tpu.parallel.plan import (
    make_mesh,
    shard_params,
    shard_cache,
    param_shardings,
)

__all__ = ["make_mesh", "shard_params", "shard_cache", "param_shardings"]
