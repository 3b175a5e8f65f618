"""The flagship score network: a 2-layer EGNN noise predictor.

Behavioral twin of the reference ``Model`` (``diffusion/model.py:336-421``):
- node features = 22-dim sequence one-hot + a scalar time feature t/T
  (pocket nodes get 0 for the time slot, ``model.py:394-401``);
- edge features = one-hot relative-position encoding of depth 2*max_len-1
  over peptide pairs, zero toward the pocket (``model.py:349-359``);
- layer 1: H=23 -> I=64 features; ReLU; pocket features zero-padded 23->64
  (``model.py:407-412``); layer 2: 64 -> 1.

TPU-first: the one-hot edge encoding never exists at runtime — each
layer's edge contribution ``one_hot(relpos) @ W_e`` is a direct gather of
first-layer weight rows by relative-position index (``relpos_edge_pre``),
a [16, 16, 64] constant folded by XLA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from pmhc_tpu.geometry import RigidArray
from pmhc_tpu.models import nn
from pmhc_tpu.models.egnn import egnn_forward, init_egnn_layer


@dataclass(frozen=True)
class ScoreNetworkConfig:
    """Hyperparameters; defaults are the reference's hard-coded values
    (``optimize.py:54``, ``model.py:349-371``)."""

    max_len: int = 16  # peptide maxlen N
    node_input_size: int = 22  # sequence one-hot width
    noise_step_count: int = 1000  # T
    inner_size: int = 64  # I: features between the two layers
    message_size: int = 64  # M
    pocket_maxlen: int = 80  # P
    # "xla": block-matmul jnp implementation (the default).
    # "pallas": fused VMEM-resident kernel (pmhc_tpu.ops.egnn_pallas);
    # differentiable via custom VJP with an XLA-remat backward.
    # "pallas_lane": lane-packed fused kernel + hand-written Pallas
    # backward (ops/egnn_pallas_lane*.py) — the fastest f32 config.
    # "g8": pallas_lane's geom8 variant — 8 neighbours per loop
    # iteration, component-major quaternion algebra; fastest at bf16.
    # "blockwise": online-softmax streaming over neighbour blocks
    # (pmhc_tpu.models.egnn_blockwise) — O(block) neighbour memory.
    # "cp" / "ring": context parallelism — the neighbour axis sharded over
    # the ``cp_axis`` mesh axis (pmhc_tpu.parallel.context); must run
    # inside shard_map (Trainer/sampler wire this via context_parallel).
    backend: str = "xla"
    cp_axis: str = "context"
    # 4 is the largest block that fits v5e vmem (batch_block=8 needs
    # 149.6 MiB of 128 MiB); measured on hardware, see docs/status.md
    pallas_batch_block: int = 4
    neighbour_block: int = 32
    # lane block for backend="pallas_lane" (bn pairs per grid cell)
    lane_block: int = 1024

    @property
    def relposenc_depth(self) -> int:
        return self.max_len * 2 - 1

    @property
    def node_feature_size(self) -> int:
        return self.node_input_size + 1  # + time feature


def init_score_network(key: jax.Array, config: ScoreNetworkConfig) -> nn.Params:
    k1, k2 = jax.random.split(key)
    H = config.node_feature_size
    E = config.relposenc_depth
    return {
        "gnn1": init_egnn_layer(k1, H, E, config.inner_size, config.message_size),
        "gnn2": init_egnn_layer(k2, config.inner_size, E, 1, config.message_size),
    }


def relpos_index(max_len: int) -> np.ndarray:
    """[N, N] relative-position index in [0, 2N-2]; row i, col j ->
    (N-1) + (i - j), matching reference ``model.py:353-356``."""
    r = np.arange(max_len)
    return (max_len - 1) + (r[:, None] - r[None, :])


def relpos_edge_pre(layer_params: nn.Params, max_len: int) -> jnp.ndarray:
    """Edge contribution to a layer's message pre-activation:
    ``one_hot(relpos, depth) @ W1[2H:]`` == gather of W1 edge rows.
    Returns [N, N, TRANSITION]."""
    # jnp.asarray first: params may arrive as host numpy (e.g. imported
    # from a torch checkpoint), and numpy arrays cannot be indexed by
    # traced values inside jit/scan
    w = jnp.asarray(layer_params["message"]["lin1"]["w"])
    edge_depth = max_len * 2 - 1
    w_e = w[-edge_depth:]  # [E, T] — edge rows are the tail of the concat
    return w_e[relpos_index(max_len)]


def score_network_forward(
    params: nn.Params,
    batch: Dict[str, Any],
    t,
    config: ScoreNetworkConfig,
    precision=nn.DEFAULT_PRECISION,
    neighbour_sharding=None,
) -> Dict[str, Any]:
    """Predict the noise on a batch of noised states.

    Args:
        batch: dict with ``frames`` (RigidArray [B, N]), ``torsions``
            [B, N, 7, 2], ``features`` [B, N, 22], ``mask`` [B, N],
            ``pocket_frames`` (RigidArray [B, P]), ``pocket_mask`` [B, P],
            ``pocket_features`` [B, P, 22]. Masks may be bool or float.
        t: timestep (python int or traced int array — fully scan-safe).

    Returns: ``{"frames": RigidArray, "torsions": [B, N, 7, 2]}``.
    """
    frames: RigidArray = batch["frames"]
    torsions = batch["torsions"]
    features = batch["features"]
    mask = batch["mask"].astype(jnp.float32)
    pocket_frames: RigidArray = batch["pocket_frames"]
    pocket_mask = batch["pocket_mask"].astype(jnp.float32)
    pocket_features = batch["pocket_features"]

    B, N = mask.shape
    P = pocket_mask.shape[-1]

    # time feature t/T on every peptide node; zero on pocket nodes
    # (reference model.py:394-401). t may be scalar or per-sample [B].
    ft = jnp.broadcast_to(
        (jnp.asarray(t, jnp.float32) / config.noise_step_count).reshape(-1, 1, 1),
        (B, N, 1),
    )
    h = jnp.concatenate((features, ft), axis=-1)  # [B, N, 23]
    pocket_h = jnp.concatenate(
        (pocket_features, jnp.zeros((B, P, 1), dtype=pocket_features.dtype)), axis=-1
    )

    if config.backend in ("pallas_lane", "g8"):
        # round-2 lane-packed fused kernel: (residue, batch) pairs on the
        # lane axis, neighbour loop with online softmax. Fully
        # differentiable: the neighbour loop carries a hand-written
        # Pallas BACKWARD (pmhc_tpu/ops/egnn_pallas_lane_vjp.py), so
        # training pays no XLA-remat tax. "g8" selects the geom8 group
        # kernels (8 neighbours per iteration, component-major quats).
        from pmhc_tpu.ops.egnn_pallas_lane_vjp import (
            egnn_forward_pallas_lane_vjp,
        )

        interpret = jax.default_backend() != "tpu"
        # kernel matmul mode from the precision convention: None -> bf16
        # (--bf16), lax.Precision.HIGH -> 3-pass f32 (--fast-f32),
        # anything else -> parity-exact f32 (HIGHEST)
        mm_mode = (True if precision is None
                   else "high" if precision == jax.lax.Precision.HIGH
                   else False)

        def layer(p, *args):
            return egnn_forward_pallas_lane_vjp(
                p, *args, lane_block=config.lane_block, interpret=interpret,
                bf16=mm_mode,
                g8=config.backend == "g8",
            )
    elif config.backend == "pallas":
        # differentiable: Pallas forward + XLA-remat backward, so the
        # backend works in training as well as sampling
        from pmhc_tpu.ops import egnn_forward_pallas_trainable

        # Mosaic kernels only compile for TPU; fall back to the pallas
        # interpreter elsewhere (CPU tests / debugging) so the backend
        # flag is usable on any platform
        interpret = jax.default_backend() != "tpu"

        def layer(p, *args):
            return egnn_forward_pallas_trainable(
                p, *args, batch_block=config.pallas_batch_block,
                interpret=interpret,
            )
    elif config.backend in ("cp", "ring"):
        # context parallelism: neighbour axis sharded over config.cp_axis;
        # only valid inside shard_map (the Trainer/sampler CP paths)
        from pmhc_tpu.parallel.context import egnn_layer_cp

        def layer(p, *args):
            return egnn_layer_cp(
                p, *args, axis_name=config.cp_axis,
                ring=config.backend == "ring", precision=precision,
            )
    elif config.backend == "blockwise":
        from pmhc_tpu.models.egnn_blockwise import egnn_forward_blockwise

        def layer(p, *args):
            return egnn_forward_blockwise(
                p, *args, neighbour_block=config.neighbour_block,
                precision=precision,
            )
    else:
        # xla backend; neighbour_sharding (egnn.neighbour_shardings)
        # additionally turns it into GSPMD context parallelism — the
        # DP x TP x CP composition path (docs/scaling.md)
        def layer(p, *args):
            return egnn_forward(
                p, *args, precision, neighbour_sharding=neighbour_sharding
            )

    with jax.named_scope("egnn_layer_1"):
        edge_pre1 = relpos_edge_pre(params["gnn1"], config.max_len)
        frames1, torsions1, inner = layer(
            params["gnn1"], frames, torsions, h, edge_pre1, mask,
            pocket_h, pocket_frames, pocket_mask,
        )

    inner = jax.nn.relu(inner)
    # pocket features zero-padded up to the inner width (model.py:411-412)
    pocket_inner = jnp.pad(
        pocket_h, ((0, 0), (0, 0), (0, config.inner_size - pocket_h.shape[-1]))
    )

    with jax.named_scope("egnn_layer_2"):
        edge_pre2 = relpos_edge_pre(params["gnn2"], config.max_len)
        frames2, torsions2, _ = layer(
            params["gnn2"], frames1, torsions1, inner, edge_pre2, mask,
            pocket_inner, pocket_frames, pocket_mask,
        )

    return {"frames": frames2, "torsions": torsions2}
