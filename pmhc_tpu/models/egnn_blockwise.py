"""Streaming EGNN forward: the neighbour axis processed in fixed blocks
with an online (flash-style) softmax.

The dense layer materializes [B, N, N+P, *] tensors; memory grows linearly
in the neighbour count. This variant scans over neighbour blocks keeping
only [B, N, block, *] live, maintaining running (max, denominator,
weighted-numerator) state for the attention softmax and the four
attention-weighted reductions — the single-chip counterpart of the
sharded two-pass softmax in ``pmhc_tpu.parallel.context`` (docs/scaling.md
"Blockwise neighbours"). Output equals ``egnn_forward`` to f32 tolerance
(tests/unit/test_blockwise.py).

The standard online-softmax recurrence: for each new block with local max
m_b, denominator l_b and numerators n_b, rescale the running state by
exp(m_old - m_new) before accumulating. All four weighted reductions
(rotation deltas [4], torsion deltas [7], translation pulls [3]) share the
same weights, so they ride in one concatenated numerator.
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
from pmhc_tpu.models.egnn import INFINITY, N_TORSIONS


def egnn_forward_blockwise(
    params: nn.Params,
    peptide_frames: RigidArray,  # [B, N]
    peptide_torsions: jnp.ndarray,  # [B, N, 7, 2]
    peptide_features: jnp.ndarray,  # [B, N, H]
    edge_pre: jnp.ndarray,  # [N, N, T]
    peptide_mask: jnp.ndarray,  # [B, N]
    pocket_features: jnp.ndarray,  # [B, P, H]
    pocket_frames: RigidArray,  # [B, P]
    pocket_mask: jnp.ndarray,  # [B, P]
    neighbour_block: int = 32,
    precision=nn.DEFAULT_PRECISION,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Drop-in equivalent of ``egnn_forward`` with O(block) neighbour
    memory. N+P must be divisible by ``neighbour_block``."""
    B, N = peptide_mask.shape
    P = pocket_mask.shape[-1]
    NP = N + P
    H = peptide_features.shape[-1]
    M = params["translation"]["lin1"]["w"].shape[0]
    T_hid = params["message"]["lin1"]["b"].shape[0]
    assert NP % neighbour_block == 0, (NP, neighbour_block)
    n_blocks = NP // neighbour_block

    pep_mask = peptide_mask.astype(jnp.float32)
    pk_mask = pocket_mask.astype(jnp.float32)
    not_self = 1.0 - jnp.eye(N, dtype=jnp.float32)
    msg_mask = jnp.concatenate(
        (
            pep_mask[:, :, None] * pep_mask[:, None, :] * not_self,
            pep_mask[:, :, None] * pk_mask[:, None, :],
        ),
        axis=-1,
    )  # [B, N, NP]

    h_all = jnp.concatenate((peptide_features, pocket_features), axis=-2)
    q_all = jnp.concatenate((peptide_frames.quats, pocket_frames.quats), axis=-2)
    t_all = jnp.concatenate((peptide_frames.trans, pocket_frames.trans), axis=-2)
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, P), (0, 0)))  # [N, NP, T]

    q_i, t_i = peptide_frames.quats, peptide_frames.trans

    # per-node precomputable first-layer terms
    mp, ap = params["message"], params["attention"]
    rp, tp, lp, fp = (
        params["rotation"], params["torsion"], params["translation"], params["feature"],
    )
    a_i = nn.linear_block(mp["lin1"], peptide_features, 0, H, precision)  # [B, N, T]
    flat_torsions = peptide_torsions.reshape(B, N, N_TORSIONS * 2)
    tor_node = nn.linear_block(tp["lin1"], flat_torsions, M, N_TORSIONS * 2, precision)

    # reshape the neighbour axis into blocks as scan inputs
    def blk(x, axis):
        shape = list(x.shape)
        shape[axis : axis + 1] = [n_blocks, neighbour_block]
        return jnp.moveaxis(x.reshape(shape), axis, 0)

    xs = (
        blk(h_all, 1),  # [n_blocks, B, nb, H]
        blk(q_all, 1),
        blk(t_all, 1),
        blk(msg_mask, 2),  # [n_blocks, B, N, nb]
        blk(edge_full, 1),  # [n_blocks, N, nb, T]
    )

    # running state: softmax max/denominator + weighted numerators + plain
    # message sum (C = 4 rot + 7 tor + 3 trans = 14 weighted channels)
    C = 4 + N_TORSIONS + 3
    init = (
        jnp.full((B, N), -jnp.inf),  # running max
        jnp.zeros((B, N)),  # running denominator
        jnp.zeros((B, N, C)),  # running weighted numerators
        jnp.zeros((B, N, M)),  # plain message sum (all neighbours)
    )

    inv_q_i = quat_invert(q_i)

    def body(carry, x):
        m_run, l_run, num_run, msum_run = carry
        h_j, q_j, t_j, mask_b, edge_b = x

        pre = (
            a_i[:, :, None, :]
            + nn.linear_block(mp["lin1"], h_j, H, H, precision)[:, None, :, :]
            + edge_b[None]
            + mp["lin1"]["b"]
        )
        message = nn.mlp_hidden(mp, pre, precision=precision)  # [B, N, nb, M]
        msum_run = msum_run + jnp.sum(message, axis=-2)

        d2 = jnp.sum(jnp.square(t_i[:, :, None, :] - t_j[:, None, :, :]), axis=-1)
        qdot2 = jnp.square(jnp.sum(q_i[:, :, None, :] * q_j[:, None, :, :], axis=-1))
        att_pre = (
            nn.linear_block(ap["lin1"], message, 0, M, precision)
            + (-d2)[..., None] * ap["lin1"]["w"][M]
            + qdot2[..., None] * ap["lin1"]["w"][M + 1]
            + ap["lin1"]["b"]
        )
        logits = nn.mlp_hidden(ap, att_pre, precision=precision)[..., 0]
        logits = logits - (1.0 - mask_b) * INFINITY  # [B, N, nb]

        # weighted values for this block
        inv_q_j = quat_invert(q_j)[:, None, :, :]
        q_j_b = q_j[:, None, :, :]
        local_quats = quat_multiply(inv_q_j, quat_multiply(q_i[:, :, None, :], q_j_b))
        rot_pre = (
            nn.linear_block(rp["lin1"], message, 0, M, precision)
            + nn.linear_block(rp["lin1"], local_quats, M, 4, precision)
            + rp["lin1"]["b"]
        )
        local_delta = nn.mlp_hidden(rp, rot_pre, final_sigmoid=True, precision=precision)
        global_delta = quat_multiply(q_j_b, quat_multiply(local_delta, inv_q_j))

        tor_pre = (
            nn.linear_block(tp["lin1"], message, 0, M, precision)
            + tor_node[:, :, None, :]
            + tp["lin1"]["b"]
        )
        m_delta_a = nn.mlp_hidden(tp, tor_pre, precision=precision)  # [B, N, nb, 7]

        m_tr = nn.mlp_apply(lp, message, precision=precision)  # [B, N, nb, 1]
        r = t_i[:, :, None, :] - t_j[:, None, :, :]
        values = jnp.concatenate((global_delta, m_delta_a, m_tr * r), axis=-1)

        # online softmax update
        m_blk = jnp.max(logits, axis=-1)
        m_new = jnp.maximum(m_run, m_blk)
        rescale = jnp.exp(m_run - m_new)
        expw = jnp.exp(logits - m_new[..., None])  # [B, N, nb]
        l_new = l_run * rescale + jnp.sum(expw, axis=-1)
        num_new = num_run * rescale[..., None] + jnp.sum(
            expw[..., None] * values, axis=-2
        )
        return (m_new, l_new, num_new, msum_run), None

    (m_run, l_run, num, msg_sum), _ = jax.lax.scan(body, init, xs)
    weighted = num / l_run[..., None]  # [B, N, C]

    # feature update
    feat_pre = (
        nn.linear_block(fp["lin1"], peptide_features, 0, H, precision)
        + nn.linear_block(fp["lin1"], msg_sum, H, M, precision)
        + fp["lin1"]["b"]
    )
    node_out = nn.mlp_hidden(fp, feat_pre, precision=precision)

    # rotation update
    gd = weighted[..., :4]
    has_nb = jnp.sum(msg_mask, axis=-1) > 0.0
    identity_q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=gd.dtype)
    gd = jnp.where(has_nb[..., None], gd, identity_q)
    gd = torch_normalize(gd)
    upd_q = quat_multiply(gd, q_i)

    # torsion update
    delta_a = weighted[..., 4 : 4 + N_TORSIONS]
    delta_t = jnp.stack((jnp.sin(delta_a), jnp.cos(delta_a)), axis=-1)
    upd_torsions = multiply_sin_cos(delta_t, peptide_torsions)

    # translation update
    upd_x = t_i + weighted[..., 4 + N_TORSIONS :]

    return RigidArray(torch_normalize(upd_q), upd_x), upd_torsions, node_out
