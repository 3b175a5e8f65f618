"""Device-mesh parallelism utilities."""

from pmhc_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch_spec,
    tp_param_shardings,
)
from pmhc_tpu.parallel.distributed import initialize_multihost, loader_shard_args
from pmhc_tpu.parallel.context import (
    egnn_forward_cp,
    egnn_forward_ring,
    egnn_layer_cp,
)

__all__ = [
    "egnn_forward_cp",
    "egnn_forward_ring",
    "egnn_layer_cp",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch_spec",
    "tp_param_shardings",
    "initialize_multihost",
    "loader_shard_args",
]
