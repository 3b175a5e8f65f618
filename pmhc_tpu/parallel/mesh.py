"""Mesh construction and sharding rules.

The reference has no distributed machinery at all (single process, single
device — SURVEY.md §2.3). The TPU-native scaling story:

- a 1-D ``Mesh(('data',))`` over all chips; the global batch is sharded on
  its leading axis, parameters and optimizer state are replicated;
- the train step runs under ``jit`` with NamedSharding annotations: XLA's
  SPMD partitioner turns the batch-mean gradient into per-shard partial
  sums + an ICI all-reduce (the ``psum`` the reference would have needed
  NCCL for);
- multi-host: ``jax.distributed.initialize()`` + per-host entry sharding
  in the data loader (``PrefetchLoader(process_index=..., ...)``); the
  same collectives ride DCN transparently on multi-slice.

A ``model`` axis is reserved in ``make_mesh`` for sharding scaled-up score
networks' MLP hidden dims (tensor parallelism); at the reference's 79K
parameters it stays size 1 (SURVEY.md §2.3 "TP").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_context: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model', 'context') mesh over the available devices.

    'data' shards the batch (DP), 'model' shards MLP hidden dims (TP,
    Megatron layout via ``tp_param_shardings``), 'context' shards the EGNN
    neighbour axis (CP, ``pmhc_tpu.parallel.context``). Unused axes stay
    size 1 and are free.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // (n_model * n_context)
    n = n_data * n_model * n_context
    devices = np.asarray(devices[:n]).reshape(n_data, n_model, n_context)
    return Mesh(devices, ("data", "model", "context"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_spec(batch: dict, mesh: Mesh) -> dict:
    """NamedSharding pytree matching a batch dict: every array sharded on
    its leading (batch) dimension."""
    spec = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda _: spec, batch)


def tp_param_shardings(mesh: Mesh, params) -> dict:
    """Tensor-parallel NamedSharding pytree for a score-network params
    tree (docs/scaling.md "Tensor parallelism"): every MLP becomes a
    Megatron-style column-parallel / row-parallel pair on the 'model'
    mesh axis —

      lin1.w [in, TRANSITION]: P(None, 'model')   (column parallel)
      lin1.b [TRANSITION]:     P('model')
      lin2.w [TRANSITION, out]: P('model', None)  (row parallel)
      lin2.b [out]:            replicated

    so the hidden (transition) dim never materializes unsharded and XLA
    inserts exactly one psum per MLP at the lin2 contraction. Pure
    annotations — the model code is unchanged.

    The rule matches on path suffixes ('lin1'/'lin2' + rank), so it also
    shards any params-MIRRORING tree — in particular optax optimizer
    states, whose mu/nu subtrees embed the params paths; non-MLP leaves
    (e.g. Adam's step count) fall through to replicated.
    """
    col = NamedSharding(mesh, P(None, "model"))
    colb = NamedSharding(mesh, P("model"))
    row = NamedSharding(mesh, P("model", None))
    repl = replicated_sharding(mesh)

    def rule(path, leaf):
        keys = [getattr(p, "key", None) for p in path]
        if "lin1" in keys:
            return col if leaf.ndim == 2 else colb
        if "lin2" in keys:
            return row if leaf.ndim == 2 else repl
        return repl

    return jax.tree_util.tree_map_with_path(rule, params)
