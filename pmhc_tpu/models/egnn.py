"""E(n)-equivariant GNN layer over the fully connected peptide<->pocket graph.

Behavioral twin of the reference's ``EGNNLayer``
(``diffusion/model.py:14-333``): every peptide residue exchanges messages
with every other peptide residue and every pocket residue (N=16 peptide +
P=80 pocket neighbours), six 2-layer MLPs produce messages, attention
weights, feature/translation/rotation/torsion updates.

TPU-first re-design (same math, different dataflow):

- **No concat materialization.** Each "Linear over cat(a, b, c)" becomes
  block matmuls ``a @ W_a + b @ W_b + c @ W_c + bias`` with broadcasting:
  node terms stay [B, N, 1, D] / [B, 1, N+P, D] instead of being expanded
  to the [B, N, N+P, *] neighbour grid before the matmul. This cuts HBM
  traffic on the hot [B, 16, 96, 64] tensors roughly 3x.
- **The edge-feature matmul is free.** The reference's edge features are a
  constant one-hot relative-position encoding (``model.py:349-359``), so
  ``e @ W_e`` is a gather of W_e rows by relative-position index — computed
  once per layer as a [N, N, hidden] constant, zero for pocket neighbours
  (the reference zero-pads pocket edges, ``model.py:209-220``).
- **Quat-native rotations.** Neighbour-local quaternion conjugation uses
  Hamilton products directly; the reference pays an eigendecomposition per
  forward to recover quats from matrix-backed rotations (SURVEY.md §3.5.4).
- Everything is a pure function of (params, inputs): jit/vmap/scan/pjit
  compose for free.

Reference quirks preserved deliberately (SURVEY.md §3.5):
- the rotation MLP's sigmoid output is used UNNORMALIZED as a quaternion
  delta (``model.py:291-292`` computes normalize() and discards it);
  normalization happens only after the attention-weighted mean;
- masked softmax via a -1e9 additive penalty (``model.py:243``), so fully
  masked rows get uniform weights, exactly as in the reference;
- messages are summed over ALL neighbours (masked included) for the
  feature update (``model.py:151``) — padding contributes MLP(bias-only)
  terms, which the reference relies on being deterministic.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pmhc_tpu.geometry import (
    RigidArray,
    multiply_sin_cos,
    quat_invert,
    quat_multiply,
    torch_normalize,
)
from pmhc_tpu.models import nn

INFINITY = 1e9  # softmax mask penalty, reference ``diffusion/model.py:11``
N_TORSIONS = 7
TRANSITION = 64  # hidden width of every MLP, reference ``model.py:36``


def init_egnn_layer(
    key: jax.Array,
    node_input_size: int,
    edge_input_size: int,
    node_output_size: int,
    message_size: int,
) -> nn.Params:
    """Parameter pytree for one layer; MLP in/out sizes match the reference
    construction ``diffusion/model.py:21-81`` exactly (the shipped
    checkpoint's 48 tensors map 1:1 onto these)."""
    keys = jax.random.split(key, 6)
    return {
        "feature": nn.mlp_init(keys[0], node_input_size + message_size, TRANSITION, node_output_size),
        "message": nn.mlp_init(keys[1], 2 * node_input_size + edge_input_size, TRANSITION, message_size),
        "attention": nn.mlp_init(keys[2], message_size + 2, TRANSITION, 1),
        "translation": nn.mlp_init(keys[3], message_size, TRANSITION, 1),
        "rotation": nn.mlp_init(keys[4], message_size + 4, TRANSITION, 4),
        "torsion": nn.mlp_init(keys[5], message_size + N_TORSIONS * 2, TRANSITION, N_TORSIONS),
    }


def neighbour_shardings(mesh, data_axis: str = "data", cp_axis: str = "context"):
    """Sharding factory for GSPMD context parallelism: returns a
    rank -> NamedSharding callable placing the batch axis (0) on
    ``data_axis`` and the neighbour axis (2) on ``cp_axis``. Passed as
    ``egnn_forward(neighbour_sharding=...)``, XLA's partitioner then
    shards every [B, N, N+P, *] tensor over the context axis and inserts
    the softmax/reduction collectives itself — this composes with the
    Megatron TP param layout in one jit (DP x TP x CP), unlike the
    manual shard_map backends ('cp'/'ring')."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def by_rank(ndim: int):
        dims = (data_axis, None, cp_axis) + (None,) * (ndim - 3)
        return NamedSharding(mesh, P(*dims))

    return by_rank


def _constrain(x: jnp.ndarray, sharding_by_rank) -> jnp.ndarray:
    if sharding_by_rank is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding_by_rank(x.ndim))


def egnn_forward(
    params: nn.Params,
    peptide_frames: RigidArray,  # [B, N]
    peptide_torsions: jnp.ndarray,  # [B, N, 7, 2]
    peptide_features: jnp.ndarray,  # [B, N, H]
    edge_pre: jnp.ndarray,  # [N, N, TRANSITION] precomputed e @ W_e (see relpos_edge_pre)
    peptide_mask: jnp.ndarray,  # [B, N] float32 {0, 1}
    pocket_features: jnp.ndarray,  # [B, P, H]
    pocket_frames: RigidArray,  # [B, P]
    pocket_mask: jnp.ndarray,  # [B, P] float32 {0, 1}
    precision=nn.DEFAULT_PRECISION,
    neighbour_sharding=None,  # see neighbour_shardings (GSPMD CP)
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """One message-passing round. Returns (frames, torsions, node features)
    with the exact update semantics of reference ``model.py:83-181``."""
    B, N = peptide_mask.shape
    P = pocket_mask.shape[-1]
    H = peptide_features.shape[-1]
    M = params["translation"]["lin1"]["w"].shape[0]

    # --- message mask [B, N, N+P] (reference model.py:110-120) -----------
    not_self = 1.0 - jnp.eye(N, dtype=jnp.float32)
    pep_pair_mask = peptide_mask[:, :, None] * peptide_mask[:, None, :] * not_self
    pocket_pair_mask = peptide_mask[:, :, None] * pocket_mask[:, None, :]
    message_mask = jnp.concatenate((pep_pair_mask, pocket_pair_mask), axis=-1)

    # --- neighbour geometry (broadcast, never expanded) ------------------
    # neighbours along the last axis are [peptide nodes | pocket nodes]
    q_j = jnp.concatenate((peptide_frames.quats, pocket_frames.quats), axis=-2)  # [B, N+P, 4]
    t_j = jnp.concatenate((peptide_frames.trans, pocket_frames.trans), axis=-2)  # [B, N+P, 3]
    q_i = peptide_frames.quats  # [B, N, 4]
    t_i = peptide_frames.trans  # [B, N, 3]

    # --- message MLP, first layer as block matmuls (model.py:183-226) ----
    # cat(h_i, h_j, e) @ W1 == h_i @ W1[:H] + h_j @ W1[H:2H] + e @ W1[2H:]
    mp = params["message"]
    a_i = nn.linear_block(mp["lin1"], peptide_features, 0, H, precision)  # [B, N, T]
    h_j = jnp.concatenate((peptide_features, pocket_features), axis=-2)  # [B, N+P, H]
    a_j = nn.linear_block(mp["lin1"], h_j, H, H, precision)  # [B, N+P, T]
    # edge term: constant per layer; pocket neighbours have zero edges
    a_e = jnp.pad(edge_pre, ((0, 0), (0, P), (0, 0)))  # [N, N+P, T]
    pre = a_i[:, :, None, :] + a_j[:, None, :, :] + a_e[None] + mp["lin1"]["b"]
    pre = _constrain(pre, neighbour_sharding)
    message = _constrain(
        nn.mlp_hidden(mp, pre, precision=precision), neighbour_sharding
    )  # [B, N, N+P, M]

    # --- attention (model.py:228-245) -------------------------------------
    d2 = jnp.sum(jnp.square(t_i[:, :, None, :] - t_j[:, None, :, :]), axis=-1)  # [B, N, N+P]
    qdot = jnp.sum(q_i[:, :, None, :] * q_j[:, None, :, :], axis=-1)
    qdot2 = jnp.square(qdot)
    ap = params["attention"]
    att_pre = (
        nn.linear_block(ap["lin1"], message, 0, M, precision)
        + (-d2)[..., None] * ap["lin1"]["w"][M]
        + qdot2[..., None] * ap["lin1"]["w"][M + 1]
        + ap["lin1"]["b"]
    )
    att_logits = nn.mlp_hidden(ap, att_pre, precision=precision)[..., 0]  # [B, N, N+P]
    att_logits = _constrain(
        att_logits - (1.0 - message_mask) * INFINITY, neighbour_sharding
    )
    neighbour_weights = jax.nn.softmax(att_logits, axis=-1)

    # --- feature update (model.py:151); message summed over ALL neighbours
    fp = params["feature"]
    msg_sum = jnp.sum(message, axis=-2)  # [B, N, M]
    feat_pre = (
        nn.linear_block(fp["lin1"], peptide_features, 0, H, precision)
        + nn.linear_block(fp["lin1"], msg_sum, H, M, precision)
        + fp["lin1"]["b"]
    )
    node_out = nn.mlp_hidden(fp, feat_pre, precision=precision)  # [B, N, O]

    # --- rotation update (model.py:272-312) -------------------------------
    inv_q_j = quat_invert(q_j)[:, None, :, :]  # [B, 1, N+P, 4]
    q_j_b = q_j[:, None, :, :]
    local_quats = quat_multiply(inv_q_j, quat_multiply(q_i[:, :, None, :], q_j_b))
    rp = params["rotation"]
    rot_pre = (
        nn.linear_block(rp["lin1"], message, 0, M, precision)
        + nn.linear_block(rp["lin1"], local_quats, M, 4, precision)
        + rp["lin1"]["b"]
    )
    # sigmoid output used UNNORMALIZED (reference quirk, model.py:291-292)
    local_delta = nn.mlp_hidden(rp, rot_pre, final_sigmoid=True, precision=precision)
    global_delta = quat_multiply(q_j_b, quat_multiply(local_delta, inv_q_j))
    gd = jnp.sum(global_delta * neighbour_weights[..., None], axis=-2)  # [B, N, 4]
    has_neighbours = jnp.sum(message_mask, axis=-1) > 0.0
    identity_q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=gd.dtype)
    gd = jnp.where(has_neighbours[..., None], gd, identity_q)
    gd = torch_normalize(gd)
    upd_q = quat_multiply(gd, q_i)  # [B, N, 4]

    # --- torsion update (model.py:247-270) --------------------------------
    flat_torsions = peptide_torsions.reshape(B, N, N_TORSIONS * 2)
    tp = params["torsion"]
    tor_pre = (
        nn.linear_block(tp["lin1"], message, 0, M, precision)
        + nn.linear_block(tp["lin1"], flat_torsions, M, N_TORSIONS * 2, precision)[:, :, None, :]
        + tp["lin1"]["b"]
    )
    m_delta_a = nn.mlp_hidden(tp, tor_pre, precision=precision)  # [B, N, N+P, 7]
    delta_a = jnp.sum(m_delta_a * neighbour_weights[..., None], axis=-2)  # [B, N, 7]
    delta_t = jnp.stack((jnp.sin(delta_a), jnp.cos(delta_a)), axis=-1)
    upd_torsions = multiply_sin_cos(delta_t, peptide_torsions)

    # --- translation update (model.py:314-333) ----------------------------
    # (the reference rebuilds neighbour frames with the updated quats first,
    # model.py:166-174, but only reads their translations — identical to the
    # originals — so the rebuild is a no-op and is elided here.)
    lp = params["translation"]
    m = nn.mlp_apply(lp, message, precision=precision)  # [B, N, N+P, 1]
    r = t_i[:, :, None, :] - t_j[:, None, :, :]  # [B, N, N+P, 3]
    upd_x = t_i + jnp.sum(m * r * neighbour_weights[..., None], axis=-2)

    # output frames carry normalized quats (model.py:181)
    out_frames = RigidArray(torch_normalize(upd_q), upd_x)
    return out_frames, upd_torsions, node_out
