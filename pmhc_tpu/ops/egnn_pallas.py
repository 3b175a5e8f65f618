"""Fused EGNN layer forward as a single Pallas TPU kernel.

Motivation (SURVEY.md §7 step 8): the layer's hot state is the message
tensor [B, N, N+P, M] = [64, 16, 96, 64] plus one hidden activation of the
same shape per MLP. The XLA path materializes several of these in HBM per
layer (6 MLPs share `message`, so fusion cannot eliminate it). This kernel
keeps EVERYTHING for a block of batch elements resident in VMEM: inputs
stream in once, the four outputs stream out once, and the ~6x [B*N*(N+P), 64]
x [64, 64] matmuls run back to back on the MXU with VPU epilogues fused in
between.

Semantics are identical to ``pmhc_tpu.models.egnn.egnn_forward`` (itself
the behavioral twin of reference ``diffusion/model.py:83-333``), including
the quirks: unnormalized sigmoid quat deltas, -1e9 softmax masking,
all-neighbour message sums. Parity is enforced by
``tests/unit/test_pallas.py`` (interpret mode on CPU) and the TPU check in
the benchmarks.

Grid: one cell per batch block (BB elements). Weights and the constant
edge term use constant index maps, so Mosaic keeps them VMEM-resident
across grid steps. The forward is used for inference/sampling (no custom
VJP yet — training uses the XLA path, whose backward XLA generates).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmhc_tpu.geometry import RigidArray

N_TORSIONS = 7
INFINITY = 1e9

F32 = jnp.float32


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), preferred_element_type=F32,
        precision=lax.Precision.HIGHEST,
    )


def _quat_mul(q1, q2):
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=-1,
    )


def _kernel(
    # data refs (leading dim = batch block BB)
    h_ref,  # [BB, N, H]
    hall_ref,  # [BB, NP, H]
    qi_ref,  # [BB, N, 4]
    ti_ref,  # [BB, N, 3]
    qj_ref,  # [BB, NP, 4]
    tj_ref,  # [BB, NP, 3]
    tors_ref,  # [BB, N, 14]
    mask_ref,  # [BB, N, NP] message mask (float)
    edge_pre_ref,  # [N, NP, T] constant edge contribution
    # message mlp
    mw1_ref, mb1_ref, mw2_ref, mb2_ref,
    # attention mlp
    aw1_ref, ab1_ref, aw2_ref, ab2_ref,
    # feature mlp
    fw1_ref, fb1_ref, fw2_ref, fb2_ref,
    # translation mlp
    lw1_ref, lb1_ref, lw2_ref, lb2_ref,
    # rotation mlp
    rw1_ref, rb1_ref, rw2_ref, rb2_ref,
    # torsion mlp
    tw1_ref, tb1_ref, tw2_ref, tb2_ref,
    # outputs
    out_q_ref,  # [BB, N, 4]
    out_t_ref,  # [BB, N, 3]
    out_tors_ref,  # [BB, N, 14]
    out_feat_ref,  # [BB, N, O]
):
    BB, N, H = h_ref.shape
    NP = hall_ref.shape[1]
    T = mb1_ref.shape[0]
    M = mb2_ref.shape[0]

    h = h_ref[:]
    h_all = hall_ref[:]
    q_i = qi_ref[:]
    t_i = ti_ref[:]
    q_j = qj_ref[:]
    t_j = tj_ref[:]
    mask = mask_ref[:]

    # ---- message: pre-activation via block matmuls, then hidden->M ------
    mw1 = mw1_ref[:]  # [2H + E, T]
    a_i = _dot(h.reshape(BB * N, H), mw1[:H]).reshape(BB, N, 1, T)
    a_j = _dot(h_all.reshape(BB * NP, H), mw1[H : 2 * H]).reshape(BB, 1, NP, T)
    pre = a_i + a_j + edge_pre_ref[:][None] + mb1_ref[:]
    hid = jnp.maximum(pre, 0.0)
    message = (
        _dot(hid.reshape(BB * N * NP, T), mw2_ref[:]) + mb2_ref[:]
    ).reshape(BB, N, NP, M)

    # ---- attention ------------------------------------------------------
    d2 = jnp.sum(jnp.square(t_i[:, :, None, :] - t_j[:, None, :, :]), axis=-1)
    qdot = jnp.sum(q_i[:, :, None, :] * q_j[:, None, :, :], axis=-1)
    qdot2 = jnp.square(qdot)
    aw1 = aw1_ref[:]  # [M + 2, T]
    att_pre = (
        _dot(message.reshape(BB * N * NP, M), aw1[:M]).reshape(BB, N, NP, T)
        + (-d2)[..., None] * aw1[M]
        + qdot2[..., None] * aw1[M + 1]
        + ab1_ref[:]
    )
    att_hid = jnp.maximum(att_pre, 0.0)
    logits = (
        _dot(att_hid.reshape(BB * N * NP, T), aw2_ref[:]) + ab2_ref[:]
    ).reshape(BB, N, NP)
    logits = logits - (1.0 - mask) * INFINITY
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    exp = jnp.exp(logits)
    weights = exp / jnp.sum(exp, axis=-1, keepdims=True)  # [BB, N, NP]

    # ---- feature update (sums over ALL neighbours, masked included) -----
    msg_sum = jnp.sum(message, axis=-2)  # [BB, N, M]
    fw1 = fw1_ref[:]  # [H + M, T]
    feat_pre = (
        _dot(h.reshape(BB * N, H), fw1[:H])
        + _dot(msg_sum.reshape(BB * N, M), fw1[H:])
        + fb1_ref[:]
    )
    feat_hid = jnp.maximum(feat_pre, 0.0)
    out_feat = _dot(feat_hid, fw2_ref[:]) + fb2_ref[:]
    out_feat_ref[:] = out_feat.reshape(BB, N, -1)

    # ---- rotation update ------------------------------------------------
    # conjugate built by concatenation (pallas kernels cannot capture
    # host-constant arrays)
    conj_q_j = jnp.concatenate((q_j[..., :1], -q_j[..., 1:]), axis=-1)
    inv_q_j = conj_q_j / jnp.sum(q_j * q_j, axis=-1, keepdims=True)
    inv_q_j = inv_q_j[:, None, :, :]
    q_j_b = q_j[:, None, :, :]
    local_quats = _quat_mul(inv_q_j, _quat_mul(q_i[:, :, None, :], q_j_b))
    rw1 = rw1_ref[:]  # [M + 4, T]
    rot_pre = (
        _dot(message.reshape(BB * N * NP, M), rw1[:M]).reshape(BB, N, NP, T)
        + _dot(local_quats.reshape(BB * N * NP, 4), rw1[M:]).reshape(BB, N, NP, T)
        + rb1_ref[:]
    )
    rot_hid = jnp.maximum(rot_pre, 0.0)
    local_delta = jax.nn.sigmoid(
        (_dot(rot_hid.reshape(BB * N * NP, T), rw2_ref[:]) + rb2_ref[:]).reshape(
            BB, N, NP, 4
        )
    )  # used UNNORMALIZED (reference quirk, model.py:291-292)
    global_delta = _quat_mul(q_j_b, _quat_mul(local_delta, inv_q_j))
    gd = jnp.sum(global_delta * weights[..., None], axis=-2)  # [BB, N, 4]
    has_nb = jnp.sum(mask, axis=-1) > 0.0
    identity_q = (
        jax.lax.broadcasted_iota(jnp.int32, (BB, N, 4), dimension=2) == 0
    ).astype(F32)
    gd = jnp.where(has_nb[..., None], gd, identity_q)
    gd = gd / jnp.maximum(
        jnp.sqrt(jnp.sum(gd * gd, axis=-1, keepdims=True)), 1e-12
    )
    upd_q = _quat_mul(gd, q_i)
    out_q_ref[:] = upd_q / jnp.maximum(
        jnp.sqrt(jnp.sum(upd_q * upd_q, axis=-1, keepdims=True)), 1e-12
    )

    # ---- torsion update -------------------------------------------------
    tors = tors_ref[:]  # [BB, N, 14] flat (sin, cos) pairs
    tw1 = tw1_ref[:]  # [M + 14, T]
    tor_pre = (
        _dot(message.reshape(BB * N * NP, M), tw1[:M]).reshape(BB, N, NP, T)
        + (_dot(tors.reshape(BB * N, 14), tw1[M:]) ).reshape(BB, N, 1, T)
        + tb1_ref[:]
    )
    tor_hid = jnp.maximum(tor_pre, 0.0)
    m_delta_a = (
        _dot(tor_hid.reshape(BB * N * NP, T), tw2_ref[:]) + tb2_ref[:]
    ).reshape(BB, N, NP, N_TORSIONS)
    delta_a = jnp.sum(m_delta_a * weights[..., None], axis=-2)  # [BB, N, 7]
    sin_d, cos_d = jnp.sin(delta_a), jnp.cos(delta_a)
    sin_t = tors.reshape(BB, N, N_TORSIONS, 2)[..., 0]
    cos_t = tors.reshape(BB, N, N_TORSIONS, 2)[..., 1]
    out_sin = sin_d * cos_t + cos_d * sin_t
    out_cos = cos_d * cos_t - sin_d * sin_t
    out_tors_ref[:] = jnp.stack((out_sin, out_cos), axis=-1).reshape(BB, N, 14)

    # ---- translation update ---------------------------------------------
    lw1 = lw1_ref[:]  # [M, T]
    tr_pre = _dot(message.reshape(BB * N * NP, M), lw1) + lb1_ref[:]
    tr_hid = jnp.maximum(tr_pre, 0.0)
    m = (_dot(tr_hid, lw2_ref[:]) + lb2_ref[:]).reshape(BB, N, NP, 1)
    r = t_i[:, :, None, :] - t_j[:, None, :, :]
    out_t_ref[:] = t_i + jnp.sum(m * r * weights[..., None], axis=-2)


def egnn_forward_pallas(
    params,
    peptide_frames: RigidArray,
    peptide_torsions: jnp.ndarray,
    peptide_features: jnp.ndarray,
    edge_pre: jnp.ndarray,
    peptide_mask: jnp.ndarray,
    pocket_features: jnp.ndarray,
    pocket_frames: RigidArray,
    pocket_mask: jnp.ndarray,
    batch_block: int = 8,
    interpret: bool = False,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ``pmhc_tpu.models.egnn.egnn_forward``."""
    B, N = peptide_mask.shape
    P = pocket_mask.shape[-1]
    NP = N + P
    H = peptide_features.shape[-1]
    T = params["message"]["lin1"]["b"].shape[0]
    O = params["feature"]["lin2"]["b"].shape[0]

    # pad the batch up to a block multiple
    BB = min(batch_block, B)
    pad = (-B) % BB
    if pad:
        padder = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    else:
        padder = lambda x: x

    pep_mask = peptide_mask.astype(F32)
    pk_mask = pocket_mask.astype(F32)
    not_self = 1.0 - jnp.eye(N, dtype=F32)
    msg_mask = jnp.concatenate(
        (
            pep_mask[:, :, None] * pep_mask[:, None, :] * not_self,
            pep_mask[:, :, None] * pk_mask[:, None, :],
        ),
        axis=-1,
    )

    h_all = jnp.concatenate((peptide_features, pocket_features), axis=-2)
    q_j = jnp.concatenate((peptide_frames.quats, pocket_frames.quats), axis=-2)
    t_j = jnp.concatenate((peptide_frames.trans, pocket_frames.trans), axis=-2)
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, P), (0, 0)))  # [N, NP, T]
    tors_flat = peptide_torsions.reshape(B, N, N_TORSIONS * 2)

    mlps = []
    for name in ("message", "attention", "feature", "translation", "rotation", "torsion"):
        p = params[name]
        mlps += [p["lin1"]["w"], p["lin1"]["b"], p["lin2"]["w"], p["lin2"]["b"]]
    mlps = [jnp.asarray(w, F32) for w in mlps]

    grid = ((B + pad) // BB,)
    db = lambda *tail: pl.BlockSpec((BB,) + tail, lambda i: (i,) + (0,) * len(tail),
                                    memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    in_specs = [
        db(N, H),       # h
        db(NP, H),      # h_all
        db(N, 4),       # q_i
        db(N, 3),       # t_i
        db(NP, 4),      # q_j
        db(NP, 3),      # t_j
        db(N, 14),      # torsions
        db(N, NP),      # mask
        const((N, NP, T)),  # edge_pre
    ] + [const(w.shape) for w in mlps]

    out_specs = (db(N, 4), db(N, 3), db(N, 14), db(N, O))
    out_shape = (
        jax.ShapeDtypeStruct((B + pad, N, 4), F32),
        jax.ShapeDtypeStruct((B + pad, N, 3), F32),
        jax.ShapeDtypeStruct((B + pad, N, 14), F32),
        jax.ShapeDtypeStruct((B + pad, N, O), F32),
    )

    out_q, out_t, out_tors, out_feat = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        padder(peptide_features),
        padder(h_all),
        padder(peptide_frames.quats),
        padder(peptide_frames.trans),
        padder(q_j),
        padder(t_j),
        padder(tors_flat),
        padder(msg_mask),
        edge_full,
        *mlps,
    )

    if pad:
        out_q, out_t, out_tors, out_feat = (
            out_q[:B], out_t[:B], out_tors[:B], out_feat[:B]
        )
    return (
        RigidArray(out_q, out_t),
        out_tors.reshape(B, N, N_TORSIONS, 2),
        out_feat,
    )
