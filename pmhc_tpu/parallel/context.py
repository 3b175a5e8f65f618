"""Context parallelism: the EGNN neighbour axis sharded across a mesh axis.

The reference is single-device with a dense [B, N, N+P, M] message tensor
(SURVEY.md §2.3 "SP/CP": absent by construction at N<=16, P<=80). This
module implements the scaling design from docs/scaling.md for when the
pocket/neighbour axis grows: each device holds a SLICE of the neighbours
and the attention softmax plus all four attention-weighted reductions are
computed with a two-pass distributed softmax —

  pass 1: local max  -> lax.pmax  over the mesh axis
  pass 2: local sums of exp(logit - global_max) and of
          exp * {message values, quat deltas, torsion deltas, translations}
          -> lax.psum

which is exactly the ring-attention/flash decomposition specialized to a
one-shot all-reduce (the neighbour axis is fully resident across the mesh;
no ppermute ring is needed until memory forces streaming).

``egnn_forward_cp`` runs INSIDE shard_map: peptide-side inputs are
replicated, neighbour-side inputs (features, frames, edge term, mask) are
sharded on their neighbour axis. Output equals
``pmhc_tpu.models.egnn.egnn_forward`` to float32 tolerance
(tests/unit/test_context_parallel.py, 8-virtual-device CPU mesh).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from pmhc_tpu.geometry import (
    RigidArray,
    multiply_sin_cos,
    quat_invert,
    quat_multiply,
    torch_normalize,
)
from pmhc_tpu.models import nn

INFINITY = 1e9
N_TORSIONS = 7


def egnn_forward_cp(
    params: nn.Params,
    peptide_frames: RigidArray,  # [B, N] (replicated)
    peptide_torsions: jnp.ndarray,  # [B, N, 7, 2] (replicated)
    peptide_features: jnp.ndarray,  # [B, N, H] (replicated)
    edge_pre_shard: jnp.ndarray,  # [N, NPs, T] local slice of e @ W_e
    message_mask_shard: jnp.ndarray,  # [B, N, NPs] local slice (incl. self-excl.)
    neighbour_features: jnp.ndarray,  # [B, NPs, H] local slice
    neighbour_frames: RigidArray,  # [B, NPs] local slice
    axis_name: str,
    precision=nn.DEFAULT_PRECISION,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """One message-passing round with the neighbour axis sharded over
    ``axis_name``. Semantics identical to ``egnn_forward`` on the
    unsharded inputs."""
    B, N = peptide_features.shape[:2]
    H = peptide_features.shape[-1]
    M = params["translation"]["lin1"]["w"].shape[0]

    q_i, t_i = peptide_frames.quats, peptide_frames.trans
    q_j, t_j = neighbour_frames.quats, neighbour_frames.trans
    mask = message_mask_shard.astype(jnp.float32)

    # --- local message block [B, N, NPs, M] --------------------------------
    mp = params["message"]
    a_i = nn.linear_block(mp["lin1"], peptide_features, 0, H, precision)
    a_j = nn.linear_block(mp["lin1"], neighbour_features, H, H, precision)
    pre = a_i[:, :, None, :] + a_j[:, None, :, :] + edge_pre_shard[None] + mp["lin1"]["b"]
    message = nn.mlp_hidden(mp, pre, precision=precision)

    # --- attention logits (local), then 2-pass distributed softmax --------
    d2 = jnp.sum(jnp.square(t_i[:, :, None, :] - t_j[:, None, :, :]), axis=-1)
    qdot2 = jnp.square(jnp.sum(q_i[:, :, None, :] * q_j[:, None, :, :], axis=-1))
    ap = params["attention"]
    att_pre = (
        nn.linear_block(ap["lin1"], message, 0, M, precision)
        + (-d2)[..., None] * ap["lin1"]["w"][M]
        + qdot2[..., None] * ap["lin1"]["w"][M + 1]
        + ap["lin1"]["b"]
    )
    logits = nn.mlp_hidden(ap, att_pre, precision=precision)[..., 0]
    logits = logits - (1.0 - mask) * INFINITY  # [B, N, NPs]

    g_max = lax.pmax(jnp.max(logits, axis=-1), axis_name)  # [B, N]
    expw = jnp.exp(logits - g_max[..., None])  # [B, N, NPs]
    denom = lax.psum(jnp.sum(expw, axis=-1), axis_name)  # [B, N]

    def wsum(values):
        """psum of Sum_j expw * values_j, normalized -> softmax-weighted sum.
        values: [B, N, NPs, C]."""
        local = jnp.sum(expw[..., None] * values, axis=-2)
        return lax.psum(local, axis_name) / denom[..., None]

    # --- feature update: message summed over ALL neighbours (masked incl.)
    fp = params["feature"]
    msg_sum = lax.psum(jnp.sum(message, axis=-2), axis_name)
    feat_pre = (
        nn.linear_block(fp["lin1"], peptide_features, 0, H, precision)
        + nn.linear_block(fp["lin1"], msg_sum, H, M, precision)
        + fp["lin1"]["b"]
    )
    node_out = nn.mlp_hidden(fp, feat_pre, precision=precision)

    # --- rotation update ----------------------------------------------------
    inv_q_j = quat_invert(q_j)[:, None, :, :]
    q_j_b = q_j[:, None, :, :]
    local_quats = quat_multiply(inv_q_j, quat_multiply(q_i[:, :, None, :], q_j_b))
    rp = params["rotation"]
    rot_pre = (
        nn.linear_block(rp["lin1"], message, 0, M, precision)
        + nn.linear_block(rp["lin1"], local_quats, M, 4, precision)
        + rp["lin1"]["b"]
    )
    local_delta = nn.mlp_hidden(rp, rot_pre, final_sigmoid=True, precision=precision)
    global_delta = quat_multiply(q_j_b, quat_multiply(local_delta, inv_q_j))
    gd = wsum(global_delta)  # [B, N, 4]
    has_nb = lax.psum(jnp.sum(mask, axis=-1), axis_name) > 0.0
    identity_q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=gd.dtype)
    gd = jnp.where(has_nb[..., None], gd, identity_q)
    gd = torch_normalize(gd)
    upd_q = quat_multiply(gd, q_i)

    # --- torsion update -----------------------------------------------------
    flat_torsions = peptide_torsions.reshape(B, N, N_TORSIONS * 2)
    tp = params["torsion"]
    tor_pre = (
        nn.linear_block(tp["lin1"], message, 0, M, precision)
        + nn.linear_block(tp["lin1"], flat_torsions, M, N_TORSIONS * 2, precision)[:, :, None, :]
        + tp["lin1"]["b"]
    )
    m_delta_a = nn.mlp_hidden(tp, tor_pre, precision=precision)
    delta_a = wsum(m_delta_a)  # [B, N, 7]
    delta_t = jnp.stack((jnp.sin(delta_a), jnp.cos(delta_a)), axis=-1)
    upd_torsions = multiply_sin_cos(delta_t, peptide_torsions)

    # --- translation update -------------------------------------------------
    lp = params["translation"]
    m = nn.mlp_apply(lp, message, precision=precision)  # [B, N, NPs, 1]
    r = t_i[:, :, None, :] - t_j[:, None, :, :]
    upd_x = t_i + wsum(m * r)

    return RigidArray(torch_normalize(upd_q), upd_x), upd_torsions, node_out
