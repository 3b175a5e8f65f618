"""Fused EGNN layer forward as a single Pallas TPU kernel.

Motivation (SURVEY.md §7 step 8): the layer's hot state is the message
tensor [B, N, N+P, M] = [64, 16, 96, 64] plus one hidden activation of the
same shape per MLP. The XLA path materializes several of these in HBM per
layer (6 MLPs share `message`, so fusion cannot eliminate it). This kernel
keeps EVERYTHING for a block of batch elements resident in VMEM: inputs
stream in once, the outputs stream out once, and the ~6x
[B*N*(N+P), 64] x [64, 64] matmuls run back to back on the MXU with VPU
epilogues fused in between.

Semantics are identical to ``pmhc_tpu.models.egnn.egnn_forward`` (itself
the behavioral twin of reference ``diffusion/model.py:83-333``), including
the quirks: unnormalized sigmoid quat deltas, -1e9 softmax masking,
all-neighbour message sums. Parity is enforced by
``tests/unit/test_pallas.py`` (interpret mode on CPU) plus a TPU run in
``tools/bench_sampler.py``.

Layout discipline (Mosaic rejects shape casts that move the lane dim):
every tensor keeps its FEATURE axis (H/T/M/7/4/3/1) as the last (lane)
dimension; the pair structure (BB, N, NP) lives in sublane dims and is
reshaped/reduced freely. Per-pair scalars are [R, 1]; attention weights
are [BB*N, NP, 1] and reduce over the sublane NP axis. Quaternion algebra
works on [R, 4] arrays via lane slicing + lane concatenation.

Grid: one cell per batch block (BB elements). Weights and the constant
edge term use constant index maps, so Mosaic keeps them VMEM-resident
across grid steps. Forward-only: used for inference/sampling (training
stays on the XLA path, whose backward XLA generates).
"""

from __future__ import annotations

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
    return lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())), preferred_element_type=F32,
        precision=lax.Precision.HIGHEST,
    )


def _qmul(q1, q2):
    """Hamilton product on [R, 4] arrays: lane slices in, lane concat out."""
    w1, x1, y1, z1 = q1[:, 0:1], q1[:, 1:2], q1[:, 2:3], q1[:, 3:4]
    w2, x2, y2, z2 = q2[:, 0:1], q2[:, 1:2], q2[:, 2:3], q2[:, 3:4]
    return jnp.concatenate(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=-1,
    )


def _expand_i(x, NP):
    """[BB, N, C] -> [BB*N*NP, C]: broadcast each residue over neighbours."""
    BB, N, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (BB, N, NP, C)).reshape(BB * N * NP, C)


def _expand_j(x, N):
    """[BB, NP, C] -> [BB*N*NP, C]: tile the neighbour axis per residue."""
    BB, NP, C = x.shape
    return jnp.broadcast_to(x[:, None, :, :], (BB, N, NP, C)).reshape(BB * N * NP, C)


def _kernel(
    # data refs (leading dim = batch block BB)
    h_ref,  # [BB, N, H]
    hall_ref,  # [BB, NP, H]
    qi_ref,  # [BB, N, 4]
    ti_ref,  # [BB, N, 3]
    qj_ref,  # [BB, NP, 4]
    tj_ref,  # [BB, NP, 3]
    tors_flat_ref,  # [BB, N, 14] (sin0 cos0 sin1 cos1 ...)
    tors_sin_ref,  # [BB, N, 7]
    tors_cos_ref,  # [BB, N, 7]
    mask_ref,  # [BB, N, NP, 1] message mask (float)
    edge_pre_ref,  # [N, NP, T] constant edge contribution
    # six MLPs: (w1, b1, w2, b2) each; b* passed as [1, dim]
    mw1_ref, mb1_ref, mw2_ref, mb2_ref,
    aw1_ref, ab1_ref, aw2_ref, ab2_ref,
    fw1_ref, fb1_ref, fw2_ref, fb2_ref,
    lw1_ref, lb1_ref, lw2_ref, lb2_ref,
    rw1_ref, rb1_ref, rw2_ref, rb2_ref,
    tw1_ref, tb1_ref, tw2_ref, tb2_ref,
    # outputs
    out_q_ref,  # [BB, N, 4]
    out_t_ref,  # [BB, N, 3]
    out_sin_ref,  # [BB, N, 7]
    out_cos_ref,  # [BB, N, 7]
    out_feat_ref,  # [BB, N, O]
):
    BB, N, H = h_ref.shape
    NP = hall_ref.shape[1]
    T = mw2_ref.shape[0]
    M = mw2_ref.shape[1]
    R = BB * N * NP
    BN = BB * N

    h = h_ref[:]

    # ---- message: block matmuls -> hidden -> M --------------------------
    mw1 = mw1_ref[:]  # [2H + E, T]
    h_i = _expand_i(h, NP)  # [R, H]
    h_j = _expand_j(hall_ref[:], N)  # [R, H]
    edge = jnp.broadcast_to(edge_pre_ref[:][None], (BB, N, NP, T)).reshape(R, T)
    pre = _dot(h_i, mw1[:H]) + _dot(h_j, mw1[H : 2 * H]) + edge + mb1_ref[:]
    message = _dot(jnp.maximum(pre, 0.0), mw2_ref[:]) + mb2_ref[:]  # [R, M]

    # ---- attention logits -> [BN, NP, 1] softmax over sublane NP --------
    t_i = _expand_i(ti_ref[:], NP)  # [R, 3]
    t_j = _expand_j(tj_ref[:], N)  # [R, 3]
    d2 = jnp.sum(jnp.square(t_i - t_j), axis=-1, keepdims=True)  # [R, 1]
    q_i = _expand_i(qi_ref[:], NP)  # [R, 4]
    q_j = _expand_j(qj_ref[:], N)  # [R, 4]
    qdot = jnp.sum(q_i * q_j, axis=-1, keepdims=True)
    qdot2 = jnp.square(qdot)

    aw1 = aw1_ref[:]  # [M + 2, T]
    att_pre = (
        _dot(message, aw1[:M])
        + (-d2) * aw1[M : M + 1]
        + qdot2 * aw1[M + 1 : M + 2]
        + ab1_ref[:]
    )
    logits = _dot(jnp.maximum(att_pre, 0.0), aw2_ref[:]) + ab2_ref[:]  # [R, 1]
    logits3 = logits.reshape(BN, NP, 1)
    mask3 = mask_ref[:].reshape(BN, NP, 1)
    logits3 = logits3 - (1.0 - mask3) * INFINITY
    logits3 = logits3 - jnp.max(logits3, axis=-2, keepdims=True)
    expw = jnp.exp(logits3)
    w3 = expw / jnp.sum(expw, axis=-2, keepdims=True)  # [BN, NP, 1]

    # ---- feature update (sum over ALL neighbours, masked included) ------
    msg3 = message.reshape(BN, NP, M)
    msg_sum = jnp.sum(msg3, axis=-2)  # [BN, M]
    fw1 = fw1_ref[:]  # [H + M, T]
    feat_pre = (
        _dot(h.reshape(BN, H), fw1[:H]) + _dot(msg_sum, fw1[H:]) + fb1_ref[:]
    )
    out_feat = _dot(jnp.maximum(feat_pre, 0.0), fw2_ref[:]) + fb2_ref[:]
    out_feat_ref[:] = out_feat.reshape(BB, N, -1)

    # ---- rotation update ------------------------------------------------
    conj_qj = jnp.concatenate((q_j[:, 0:1], -q_j[:, 1:]), axis=-1)
    inv_qj = conj_qj / jnp.sum(q_j * q_j, axis=-1, keepdims=True)
    local_quats = _qmul(inv_qj, _qmul(q_i, q_j))  # [R, 4]
    rw1 = rw1_ref[:]  # [M + 4, T]
    rot_pre = _dot(message, rw1[:M]) + _dot(local_quats, rw1[M:]) + rb1_ref[:]
    # sigmoid output used UNNORMALIZED (reference quirk, model.py:291-292)
    local_delta = jax.nn.sigmoid(
        _dot(jnp.maximum(rot_pre, 0.0), rw2_ref[:]) + rb2_ref[:]
    )  # [R, 4]
    global_delta = _qmul(q_j, _qmul(local_delta, inv_qj))  # [R, 4]
    gd = jnp.sum(global_delta.reshape(BN, NP, 4) * w3, axis=-2)  # [BN, 4]
    has_nb = jnp.sum(mask3, axis=-2) > 0.0  # [BN, 1]
    identity_q = (
        lax.broadcasted_iota(jnp.int32, (BN, 4), dimension=1) == 0
    ).astype(F32)
    gd = jnp.where(has_nb, gd, identity_q)
    gd = gd / jnp.maximum(jnp.sqrt(jnp.sum(gd * gd, axis=-1, keepdims=True)), 1e-12)
    upd_q = _qmul(gd, qi_ref[:].reshape(BN, 4))
    upd_q = upd_q / jnp.maximum(
        jnp.sqrt(jnp.sum(upd_q * upd_q, axis=-1, keepdims=True)), 1e-12
    )
    out_q_ref[:] = upd_q.reshape(BB, N, 4)

    # ---- torsion update -------------------------------------------------
    tw1 = tw1_ref[:]  # [M + 14, T]
    tor_node = _dot(tors_flat_ref[:].reshape(BN, 14), tw1[M:])  # [BN, T]
    tor_node_exp = jnp.broadcast_to(
        tor_node.reshape(BN, 1, T), (BN, NP, T)
    ).reshape(R, T)
    tor_pre = _dot(message, tw1[:M]) + tor_node_exp + tb1_ref[:]
    m_delta_a = _dot(jnp.maximum(tor_pre, 0.0), tw2_ref[:]) + tb2_ref[:]  # [R, 7]
    delta_a = jnp.sum(m_delta_a.reshape(BN, NP, N_TORSIONS) * w3, axis=-2)  # [BN, 7]
    sin_d, cos_d = jnp.sin(delta_a), jnp.cos(delta_a)
    sin_t = tors_sin_ref[:].reshape(BN, N_TORSIONS)
    cos_t = tors_cos_ref[:].reshape(BN, N_TORSIONS)
    out_sin_ref[:] = (sin_d * cos_t + cos_d * sin_t).reshape(BB, N, N_TORSIONS)
    out_cos_ref[:] = (cos_d * cos_t - sin_d * sin_t).reshape(BB, N, N_TORSIONS)

    # ---- translation update ---------------------------------------------
    tr_hid = jnp.maximum(_dot(message, lw1_ref[:]) + lb1_ref[:], 0.0)
    m_tr = _dot(tr_hid, lw2_ref[:]) + lb2_ref[:]  # [R, 1]
    mw = m_tr.reshape(BN, NP, 1) * w3  # [BN, NP, 1]
    r3 = (t_i - t_j).reshape(BN, NP, 3)
    upd = jnp.sum(mw * r3, axis=-2)  # [BN, 3]
    out_t_ref[:] = (ti_ref[:].reshape(BN, 3) + upd).reshape(BB, N, 3)


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
    batch_block: int = 4,
    interpret: bool = False,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ``pmhc_tpu.models.egnn.egnn_forward``."""
    B, N = peptide_mask.shape
    P = pocket_mask.shape[-1]
    NP = N + P
    H = peptide_features.shape[-1]
    T = params["message"]["lin1"]["b"].shape[0]
    O = params["feature"]["lin2"]["b"].shape[0]

    BB = min(batch_block, B)
    pad = (-B) % BB
    padder = (
        (lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)))
        if pad
        else (lambda x: x)
    )

    pep_mask = peptide_mask.astype(F32)
    pk_mask = pocket_mask.astype(F32)
    not_self = 1.0 - jnp.eye(N, dtype=F32)
    msg_mask = jnp.concatenate(
        (
            pep_mask[:, :, None] * pep_mask[:, None, :] * not_self,
            pep_mask[:, :, None] * pk_mask[:, None, :],
        ),
        axis=-1,
    )[..., None]  # [B, N, NP, 1]

    h_all = jnp.concatenate((peptide_features, pocket_features), axis=-2)
    q_j = jnp.concatenate((peptide_frames.quats, pocket_frames.quats), axis=-2)
    t_j = jnp.concatenate((peptide_frames.trans, pocket_frames.trans), axis=-2)
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, P), (0, 0)))  # [N, NP, T]
    tors_flat = peptide_torsions.reshape(B, N, N_TORSIONS * 2)
    tors_sin = peptide_torsions[..., 0]
    tors_cos = peptide_torsions[..., 1]

    mlps = []
    for name in ("message", "attention", "feature", "translation", "rotation", "torsion"):
        p = params[name]
        mlps += [
            jnp.asarray(p["lin1"]["w"], F32),
            jnp.asarray(p["lin1"]["b"], F32).reshape(1, -1),
            jnp.asarray(p["lin2"]["w"], F32),
            jnp.asarray(p["lin2"]["b"], F32).reshape(1, -1),
        ]

    grid = ((B + pad) // BB,)
    db = lambda *tail: pl.BlockSpec(
        (BB,) + tail, lambda i: (i,) + (0,) * len(tail), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    in_specs = [
        db(N, H),        # h
        db(NP, H),       # h_all
        db(N, 4),        # q_i
        db(N, 3),        # t_i
        db(NP, 4),       # q_j
        db(NP, 3),       # t_j
        db(N, 14),       # torsions flat
        db(N, N_TORSIONS),  # torsion sin
        db(N, N_TORSIONS),  # torsion cos
        db(N, NP, 1),    # mask
        const((N, NP, T)),  # edge_pre
    ] + [const(w.shape) for w in mlps]

    out_specs = (db(N, 4), db(N, 3), db(N, N_TORSIONS), db(N, N_TORSIONS), db(N, O))
    out_shape = tuple(
        jax.ShapeDtypeStruct((B + pad, N, c), F32) for c in (4, 3, N_TORSIONS, N_TORSIONS, O)
    )

    out_q, out_t, out_sin, out_cos, out_feat = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        # Mosaic's default scoped-vmem cap is 16 MiB; the fused kernel's
        # intermediates (every [BN, NP, *] tensor is lane-padded to 128)
        # measure 34.9 MiB of scoped vmem at batch_block=2 on v5e, so raise
        # the cap (total vmem is 128 MiB; operands are < 2 MiB).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(
        padder(peptide_features),
        padder(h_all),
        padder(peptide_frames.quats),
        padder(peptide_frames.trans),
        padder(q_j),
        padder(t_j),
        padder(tors_flat),
        padder(tors_sin),
        padder(tors_cos),
        padder(msg_mask),
        edge_full,
        *mlps,
    )

    if pad:
        out_q, out_t, out_sin, out_cos, out_feat = (
            out_q[:B], out_t[:B], out_sin[:B], out_cos[:B], out_feat[:B]
        )
    out_tors = jnp.stack((out_sin, out_cos), axis=-1)
    return RigidArray(out_q, out_t), out_tors, out_feat


# ---------------------------------------------------------------------------
# Trainable wrapper: Pallas forward, XLA-autodiff backward.
#
# The fused kernel is forward-only (no hand-written transpose). For training,
# jax.custom_vjp pairs the Pallas forward with a backward that REMATERIALIZES
# the layer through the XLA implementation and differentiates it — the
# standard remat trade (one extra forward in the backward pass) with the
# pattern from the Pallas guide ("Patterns: Custom VJP"). The two forwards
# agree to float32 tolerance (tests/unit/test_pallas.py), so gradients are
# consistent.
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=None)
def _trainable(batch_block: int, interpret: bool):
    from pmhc_tpu.models.egnn import egnn_forward as _xla_forward

    @jax.custom_vjp
    def fused(params, frames, torsions, feats, edge_pre, mask, pk_feats,
              pk_frames, pk_mask):
        return egnn_forward_pallas(
            params, frames, torsions, feats, edge_pre, mask, pk_feats,
            pk_frames, pk_mask, batch_block=batch_block, interpret=interpret,
        )

    def fwd(*args):
        return fused(*args), args

    def bwd(residuals, cotangents):
        _, vjp_fn = jax.vjp(_xla_forward, *residuals)
        return vjp_fn(cotangents)

    fused.defvjp(fwd, bwd)
    return fused


def egnn_forward_pallas_trainable(
    params, frames, torsions, feats, edge_pre, mask, pk_feats, pk_frames,
    pk_mask, batch_block: int = 4, interpret: bool = False,
):
    """Differentiable fused layer: Pallas forward, XLA-remat backward."""
    return _trainable(batch_block, interpret)(
        params, frames, torsions, feats, edge_pre, mask, pk_feats,
        pk_frames, pk_mask,
    )
