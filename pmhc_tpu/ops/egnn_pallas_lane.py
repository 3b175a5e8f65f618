"""Lane-packed fused EGNN layer — the round-2 Pallas redesign.

Round 1's fused kernel (``egnn_pallas.py``) kept the FEATURE axis on the
lane dimension; every feature width in this model is <= 64, so each vector
register ran at <= half occupancy ([R, 1] tensors at 1/128), and the batch
grid serialized into many small launches. Measured result: XLA won 2.3-3.8x
at every configuration (docs/status.md "Measured design decisions").

This kernel flips the layout exactly as that analysis prescribed:

- **(batch, residue) pairs live on LANES.** Every activation is stored
  transposed, ``[C, BN]`` with bn = b*N + n on the lane axis — fully
  packed whenever BN is a multiple of 128 (BN = 1024 at the reference
  batch 64). Per-edge scalars (attention logits, translation weights) are
  ``[1, BN]`` — 128/128 lanes instead of 1/128.
- **Features live on SUBLANES** (T = M = 64 -> 8 f32 vregs), and every
  MLP matmul becomes ``W^T [out, in] @ X [in, BN]`` — the big operand is
  lane-dense on the MXU.
- **The neighbour axis is a sequential loop with an online softmax**
  (flash-style running max / denominator / numerators), so the
  [BN, NP, M] message tensor never exists even in VMEM: per step only
  [C, BNB] tiles are live. The grid is over lane blocks of BN — ONE cell
  at batch 64 (vs 16 serialized cells in round 1).
- The neighbour-dependent message pre-activation (a_j broadcast over
  query residues + relative-position edge term + bias) is precomputed by
  XLA as ``pre_add [NP, T, BN]`` and STREAMED through VMEM — trading
  sequencing flexibility for one O(R*T) HBM read, which at 800 GB/s is
  ~30 us/layer at batch 64 (vs the ~millisecond compute it feeds).

Semantics are identical to ``pmhc_tpu.models.egnn.egnn_forward``
(behavioral twin of reference ``diffusion/model.py:83-333``), including
the quirks: unnormalized sigmoid quat deltas, -1e9 softmax masking,
all-neighbour (masked included) message sums. Parity:
``tests/unit/test_pallas_lane.py`` (interpret mode) + on-chip runs.
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
    """[out, in] @ [in, BNB] -> [out, BNB] with f32 accumulation."""
    return lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=F32,
        precision=lax.Precision.HIGHEST,
    )


def _qmul_rows(q1, q2):
    """Hamilton product on [4, L] arrays (components on sublane rows)."""
    w1, x1, y1, z1 = q1[0:1], q1[1:2], q1[2:3], q1[3:4]
    w2, x2, y2, z2 = q2[0:1], q2[1:2], q2[2:3], q2[3:4]
    return jnp.concatenate(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=0,
    )


def _kernel(
    # per-node blocks (lane dim = bn block)
    h_ref,        # [H, BNB]
    qi_ref,       # [4, BNB]
    ti_ref,       # [3, BNB]
    tors_ref,     # [14, BNB] (sin0 cos0 sin1 cos1 ...)
    sin_ref,      # [7, BNB]
    cos_ref,      # [7, BNB]
    # per-neighbour streamed blocks
    pre_add_ref,  # [NP, T, BNB] = a_j + edge + b1, expanded over queries
    qj_ref,       # [NP, 4, BNB]
    tj_ref,       # [NP, 3, BNB]
    mask_ref,     # [NP, 1, BNB]
    # weights (transposed, constant across grid)
    wmi_ref,      # [T, H]   message W1 rows for h_i
    wm2_ref, bm2_ref,          # [M, T], [M, 1]
    wam_ref, wad_ref, waq_ref, ba1_ref,  # [T, M], [T, 1], [T, 1], [T, 1]
    wa2_ref, ba2_ref,          # [1, T], [1, 1]
    wfh_ref, wfm_ref, bf1_ref,  # [T, H], [T, M], [T, 1]
    wf2_ref, bf2_ref,          # [O, T], [O, 1]
    wl1_ref, bl1_ref, wl2_ref, bl2_ref,  # [T, M], [T, 1], [1, T], [1, 1]
    wrm_ref, wrq_ref, br1_ref,  # [T, M], [T, 4], [T, 1]
    wr2_ref, br2_ref,          # [4, T], [4, 1]
    wtm_ref, wtt_ref, bt1_ref,  # [T, M], [T, 14], [T, 1]
    wt2_ref, bt2_ref,          # [7, T], [7, 1]
    # outputs
    out_q_ref,    # [4, BNB]
    out_t_ref,    # [3, BNB]
    out_sin_ref,  # [7, BNB]
    out_cos_ref,  # [7, BNB]
    out_feat_ref,  # [O, BNB]
):
    NP = pre_add_ref.shape[0]
    M = wm2_ref.shape[0]
    BNB = h_ref.shape[-1]

    h = h_ref[:]
    q_i = qi_ref[:]
    t_i = ti_ref[:]

    # per-node terms, computed once per cell
    a_i = _dot(wmi_ref[:], h)                 # [T, BNB] (b1 lives in pre_add)
    tor_node = _dot(wtt_ref[:], tors_ref[:])  # [T, BNB]

    conj = jnp.concatenate((q_i[0:1], -q_i[1:]), axis=0)  # reused below? (q_i inverse not needed)

    def body(np_i, carry):
        m_run, acc_d, acc_gd, acc_ta, acc_tr, acc_msg, acc_cnt = carry

        pre = a_i + pre_add_ref[np_i]          # [T, BNB]
        msg = _dot(wm2_ref[:], jnp.maximum(pre, 0.0)) + bm2_ref[:]  # [M, BNB]

        q_j = qj_ref[np_i]                     # [4, BNB]
        t_j = tj_ref[np_i]                     # [3, BNB]
        mask = mask_ref[np_i]                  # [1, BNB]

        d2 = jnp.sum(jnp.square(t_i - t_j), axis=0, keepdims=True)   # [1, BNB]
        qdot = jnp.sum(q_i * q_j, axis=0, keepdims=True)
        qdot2 = jnp.square(qdot)

        att_pre = (
            _dot(wam_ref[:], msg)
            + wad_ref[:] * (-d2)               # [T,1] * [1,BNB]
            + waq_ref[:] * qdot2
            + ba1_ref[:]
        )
        logits = _dot(wa2_ref[:], jnp.maximum(att_pre, 0.0)) + ba2_ref[:]  # [1, BNB]
        logits = logits - (1.0 - mask) * INFINITY

        # rotation
        conj_qj = jnp.concatenate((q_j[0:1], -q_j[1:]), axis=0)
        inv_qj = conj_qj / jnp.sum(q_j * q_j, axis=0, keepdims=True)
        local_q = _qmul_rows(inv_qj, _qmul_rows(q_i, q_j))  # [4, BNB]
        rot_pre = _dot(wrm_ref[:], msg) + _dot(wrq_ref[:], local_q) + br1_ref[:]
        # sigmoid output used UNNORMALIZED (reference quirk, model.py:291-292)
        local_delta = jax.nn.sigmoid(
            _dot(wr2_ref[:], jnp.maximum(rot_pre, 0.0)) + br2_ref[:]
        )  # [4, BNB]
        gdelta = _qmul_rows(q_j, _qmul_rows(local_delta, inv_qj))

        # torsion
        tor_pre = _dot(wtm_ref[:], msg) + tor_node + bt1_ref[:]
        mdelta = _dot(wt2_ref[:], jnp.maximum(tor_pre, 0.0)) + bt2_ref[:]  # [7, BNB]

        # translation
        tr_hid = jnp.maximum(_dot(wl1_ref[:], msg) + bl1_ref[:], 0.0)
        mtr = _dot(wl2_ref[:], tr_hid) + bl2_ref[:]  # [1, BNB]
        mr = mtr * (t_i - t_j)                       # [3, BNB]

        # online softmax fold (running max / denominator / numerators)
        m_new = jnp.maximum(m_run, logits)
        r = jnp.exp(m_run - m_new)
        l = jnp.exp(logits - m_new)
        return (
            m_new,
            acc_d * r + l,
            acc_gd * r + l * gdelta,
            acc_ta * r + l * mdelta,
            acc_tr * r + l * mr,
            acc_msg + msg,   # plain sum over ALL neighbours (masked incl.)
            acc_cnt + mask,
        )

    init = (
        jnp.full((1, BNB), -1e30, F32),
        jnp.zeros((1, BNB), F32),
        jnp.zeros((4, BNB), F32),
        jnp.zeros((N_TORSIONS, BNB), F32),
        jnp.zeros((3, BNB), F32),
        jnp.zeros((M, BNB), F32),
        jnp.zeros((1, BNB), F32),
    )
    _, acc_d, acc_gd, acc_ta, acc_tr, acc_msg, acc_cnt = lax.fori_loop(
        0, NP, body, init
    )

    inv_d = 1.0 / acc_d  # [1, BNB]

    # feature update (message PLAIN sum, reference model.py:151)
    feat_pre = _dot(wfh_ref[:], h) + _dot(wfm_ref[:], acc_msg) + bf1_ref[:]
    out_feat_ref[:] = _dot(wf2_ref[:], jnp.maximum(feat_pre, 0.0)) + bf2_ref[:]

    # rotation compose
    gd = acc_gd * inv_d
    has_nb = acc_cnt > 0.0  # [1, BNB]
    iden = (lax.broadcasted_iota(jnp.int32, (4, BNB), 0) == 0).astype(F32)
    gd = jnp.where(has_nb, gd, iden)
    gd = gd / jnp.maximum(jnp.sqrt(jnp.sum(gd * gd, axis=0, keepdims=True)), 1e-12)
    upd_q = _qmul_rows(gd, q_i)
    out_q_ref[:] = upd_q / jnp.maximum(
        jnp.sqrt(jnp.sum(upd_q * upd_q, axis=0, keepdims=True)), 1e-12
    )

    # torsion compose (sin/cos angle addition)
    delta_a = acc_ta * inv_d  # [7, BNB]
    sin_d, cos_d = jnp.sin(delta_a), jnp.cos(delta_a)
    sin_t, cos_t = sin_ref[:], cos_ref[:]
    out_sin_ref[:] = sin_d * cos_t + cos_d * sin_t
    out_cos_ref[:] = cos_d * cos_t - sin_d * sin_t

    # translation
    out_t_ref[:] = t_i + acc_tr * inv_d


def egnn_forward_pallas_lane(
    params,
    peptide_frames: RigidArray,
    peptide_torsions: jnp.ndarray,
    peptide_features: jnp.ndarray,
    edge_pre: jnp.ndarray,
    peptide_mask: jnp.ndarray,
    pocket_features: jnp.ndarray,
    pocket_frames: RigidArray,
    pocket_mask: jnp.ndarray,
    lane_block: int = 1024,
    interpret: bool = False,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ``egnn_forward`` (lane-packed)."""
    B, N = peptide_mask.shape
    P = pocket_mask.shape[-1]
    NP = N + P
    H = peptide_features.shape[-1]
    T = params["message"]["lin1"]["b"].shape[0]
    M = params["message"]["lin2"]["b"].shape[0]
    O = params["feature"]["lin2"]["b"].shape[0]
    BN = B * N

    BNB = min(lane_block, max(128, -(-BN // 128) * 128))
    BNp = -(-BN // BNB) * BNB  # round BN up to a multiple of the block
    pad = BNp - BN

    def node_t(x):
        """[B, N, C] -> [C, BNp] (bn = b*N + n on lanes)."""
        flat = jnp.transpose(x.reshape(BN, -1))
        return jnp.pad(flat, ((0, 0), (0, pad))) if pad else flat

    pep_mask = peptide_mask.astype(F32)
    pk_mask = pocket_mask.astype(F32)
    not_self = 1.0 - jnp.eye(N, dtype=F32)
    msg_mask = jnp.concatenate(
        (
            pep_mask[:, :, None] * pep_mask[:, None, :] * not_self,
            pep_mask[:, :, None] * pk_mask[:, None, :],
        ),
        axis=-1,
    )  # [B, N, NP]
    mask_t = jnp.transpose(msg_mask.reshape(BN, NP))  # [NP, BN]
    mask_t = (jnp.pad(mask_t, ((0, 0), (0, pad))) if pad else mask_t)[:, None, :]

    # neighbour-side tensors expanded over queries on the lane axis:
    # [.., B] -> repeat each batch N times -> bn = b*N + n ordering
    h_all = jnp.concatenate((peptide_features, pocket_features), axis=-2)
    q_all = jnp.concatenate((peptide_frames.quats, pocket_frames.quats), axis=-2)
    t_all = jnp.concatenate((peptide_frames.trans, pocket_frames.trans), axis=-2)

    def nbr_exp(x):
        """[B, NP, C] -> [NP, C, BNp]."""
        y = jnp.repeat(jnp.transpose(x, (1, 2, 0)), N, axis=-1)  # [NP, C, BN]
        return jnp.pad(y, ((0, 0), (0, 0), (0, pad))) if pad else y

    w1m = jnp.asarray(params["message"]["lin1"]["w"], F32)  # [2H+E, T]
    b1m = jnp.asarray(params["message"]["lin1"]["b"], F32)
    # a_j = h_all @ W1[H:2H]  -> [B, NP, T]; expand over queries; add the
    # edge term (zero toward the pocket) tiled over batches and the bias
    a_j = jnp.einsum(
        "bph,ht->bpt", h_all, w1m[H:2 * H],
        precision=lax.Precision.HIGHEST,
    )
    a_j_exp = jnp.repeat(jnp.transpose(a_j, (1, 2, 0)), N, axis=-1)  # [NP, T, BN]
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, P), (0, 0)))  # [N, NP, T]
    edge_t = jnp.tile(jnp.transpose(edge_full, (1, 2, 0)), (1, 1, B))  # [NP, T, BN]
    pre_add = a_j_exp + edge_t + b1m[None, :, None]
    if pad:
        pre_add = jnp.pad(pre_add, ((0, 0), (0, 0), (0, pad)))

    tors_flat = peptide_torsions.reshape(B, N, N_TORSIONS * 2)

    p = params
    col = lambda w: jnp.asarray(w, F32).T  # [in, out] -> [out, in]
    bias = lambda b: jnp.asarray(b, F32).reshape(-1, 1)
    w1a = jnp.asarray(p["attention"]["lin1"]["w"], F32)  # [M+2, T]
    w1f = jnp.asarray(p["feature"]["lin1"]["w"], F32)    # [H+M, T]
    w1r = jnp.asarray(p["rotation"]["lin1"]["w"], F32)   # [M+4, T]
    w1t = jnp.asarray(p["torsion"]["lin1"]["w"], F32)    # [M+14, T]
    weights = [
        col(w1m[:H]),                                     # wmi [T, H]
        col(p["message"]["lin2"]["w"]), bias(p["message"]["lin2"]["b"]),
        col(w1a[:M]), w1a[M].reshape(-1, 1), w1a[M + 1].reshape(-1, 1),
        bias(p["attention"]["lin1"]["b"]),
        col(p["attention"]["lin2"]["w"]), bias(p["attention"]["lin2"]["b"]),
        col(w1f[:H]), col(w1f[H:]), bias(p["feature"]["lin1"]["b"]),
        col(p["feature"]["lin2"]["w"]), bias(p["feature"]["lin2"]["b"]),
        col(p["translation"]["lin1"]["w"]), bias(p["translation"]["lin1"]["b"]),
        col(p["translation"]["lin2"]["w"]), bias(p["translation"]["lin2"]["b"]),
        col(w1r[:M]), col(w1r[M:]), bias(p["rotation"]["lin1"]["b"]),
        col(p["rotation"]["lin2"]["w"]), bias(p["rotation"]["lin2"]["b"]),
        col(w1t[:M]), col(w1t[M:]), bias(p["torsion"]["lin1"]["b"]),
        col(p["torsion"]["lin2"]["w"]), bias(p["torsion"]["lin2"]["b"]),
    ]

    grid = (BNp // BNB,)
    lane = lambda c: pl.BlockSpec((c, BNB), lambda i: (0, i), memory_space=pltpu.VMEM)
    nbr = lambda c: pl.BlockSpec(
        (NP, c, BNB), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    in_specs = [
        lane(H), lane(4), lane(3), lane(2 * N_TORSIONS),
        lane(N_TORSIONS), lane(N_TORSIONS),
        nbr(T), nbr(4), nbr(3), nbr(1),
    ] + [const(w.shape) for w in weights]
    out_specs = (lane(4), lane(3), lane(N_TORSIONS), lane(N_TORSIONS), lane(O))
    out_shape = tuple(
        jax.ShapeDtypeStruct((c, BNp), F32) for c in (4, 3, N_TORSIONS, N_TORSIONS, O)
    )

    out_q, out_t, out_sin, out_cos, out_feat = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(
        node_t(peptide_features),
        node_t(peptide_frames.quats),
        node_t(peptide_frames.trans),
        node_t(tors_flat),
        node_t(peptide_torsions[..., 0]),
        node_t(peptide_torsions[..., 1]),
        pre_add,
        nbr_exp(q_all),
        nbr_exp(t_all),
        mask_t,
        *weights,
    )

    def node_back(x):
        """[C, BNp] -> [B, N, C]."""
        return jnp.transpose(x[:, :BN]).reshape(B, N, -1)

    out_tors = jnp.stack((node_back(out_sin), node_back(out_cos)), axis=-1)
    return (
        RigidArray(node_back(out_q), node_back(out_t)),
        out_tors,
        node_back(out_feat),
    )


# ---------------------------------------------------------------------------
# Trainable wrapper: Pallas forward, XLA-autodiff backward (same remat
# pattern as egnn_pallas.py — the two forwards agree to f32 tolerance, so
# the gradients are consistent).
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=None)
def _trainable(lane_block: int, interpret: bool):
    from pmhc_tpu.models.egnn import egnn_forward as _xla_forward

    @jax.custom_vjp
    def fused(params, frames, torsions, feats, edge_pre, mask, pk_feats,
              pk_frames, pk_mask):
        return egnn_forward_pallas_lane(
            params, frames, torsions, feats, edge_pre, mask, pk_feats,
            pk_frames, pk_mask, lane_block=lane_block, interpret=interpret,
        )

    def fwd(*args):
        return fused(*args), args

    def bwd(residuals, cotangents):
        _, vjp_fn = jax.vjp(_xla_forward, *residuals)
        return vjp_fn(cotangents)

    fused.defvjp(fwd, bwd)
    return fused


def egnn_forward_pallas_lane_trainable(
    params, frames, torsions, feats, edge_pre, mask, pk_feats, pk_frames,
    pk_mask, lane_block: int = 1024, interpret: bool = False,
):
    """Differentiable fused layer: Pallas forward, XLA-remat backward."""
    return _trainable(lane_block, interpret)(
        params, frames, torsions, feats, edge_pre, mask, pk_feats,
        pk_frames, pk_mask,
    )
