"""SPMD parallelism: mesh construction and sharding policies."""

from neraf_tpu.parallel.sharding import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_pytree_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_pytree_batch"]
