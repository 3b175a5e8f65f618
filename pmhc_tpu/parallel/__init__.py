"""Device-mesh parallelism utilities."""

from pmhc_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch_spec,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding", "shard_batch_spec"]
