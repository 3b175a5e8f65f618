"""Component-major 8-neighbour-packed fused EGNN layer ("geom8").

The lane-packed kernel (``egnn_pallas_lane.py``) is VPU-throughput bound,
and roughly half of its VPU cycles are SUBLANE-OCCUPANCY waste: the
quaternion / scalar geometry chain runs on [1..4, lanes] tiles, so every
vector register carries 1-4 useful sublanes out of 8 (docs/status.md
round-2 trace: fwd kernels 0.21 ms/step, bwd 0.59 ms at batch 64 bf16).

This kernel processes ONE GROUP OF 8 NEIGHBOURS per loop iteration in two
cooperating layouts:

- **MXU stages** (message/attention/rotation/torsion/translation MLPs)
  run lane-stacked ``[C, 8*BNB]`` — j-MAJOR lane blocks (lane =
  j*BNB + n*Bp + b): the same ops as before at 8x width, 8x fewer
  issues, unchanged FLOPs.
- **Quaternion algebra** runs component-major ``[32, BNB]`` — rows
  (w0..w7, x0..x7, y0..y7, z0..z7): every Hamilton-product term is a
  full-height [8, BNB] tile at 8/8 sublane occupancy instead of eight
  [1, BNB] row ops at 1/8.
- The two layouts meet through tiny constant 0/1 **selection matmuls**
  (built from iota once per cell): cm->lane-stacked is eight [4,32]
  selections + a j-major lane concat; lane-stacked->cm is eight [32,4]
  selections summed. Mosaic rejects the sublane-shuffle alternative
  ("offset mismatch on non-concat dimension"); the MXU route costs <1%
  extra FLOPs.
- The online-softmax fold becomes: per-group lane-block TREE max/sum
  down to node width (j-major blocks are contiguous), then one ordinary
  fold into the running accumulators (associativity of the streaming
  softmax).

Semantics are identical to ``egnn_forward`` / ``egnn_forward_pallas_lane``
(reference ``diffusion/model.py:83-333``), including the quirks
(unnormalized sigmoid quat deltas, -1e9 softmax masking, plain
all-neighbour message sums). Parity: tests/unit/test_pallas_lane_g8.py
(interpret mode vs the dense layer).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmhc_tpu.geometry import RigidArray
from pmhc_tpu.ops.egnn_pallas_lane import (
    _qmul_rows, lane_geometry, pack_lane_weights,
)

N_TORSIONS = 7
INFINITY = 1e9
F32 = jnp.float32
G = 8  # neighbours per group (the full sublane height of a vreg)

# Trace-time stage ablation for the FORWARD kernel cycle budget
# (tools/bench_fwd_stages.py; the backward twin lives in
# egnn_pallas_lane_vjp.ABLATE_STAGES). Each named stage is replaced by a
# shape-compatible stand-in so Mosaic dead-code-eliminates the stage and
# its exclusive producers; outputs are WRONG under ablation — timing
# only. Stages:
#   "expand"  neighbour operand expansion (aj/qj/tj repeats + the edge
#             selection matmuls)
#   "headmm"  the fused head lin1 matmul ([4T, T] @ relu(pre); the
#             message lin2 is folded in at pack time — whm = wheads@wm2)
#   "head2mm" the fused block-diagonal head lin2 matmul (w2all)
#   "rotcm"   the component-major quaternion chain + layout crossings
#   "fold"    the group tree-folds + online-softmax accumulation
ABLATE_STAGES: frozenset = frozenset()


def _mm_maker(bf16):
    """3-mode matmul family (False / True / "high") — see
    egnn_pallas_lane.mm_maker."""
    from pmhc_tpu.ops.egnn_pallas_lane import mm_maker

    _mm, _mm0, _ = mm_maker(bf16)
    return _mm, _mm0


def _qmul_cm(q1, q2):
    """Hamilton product in component-major layout: [32, L] x [32, L] ->
    [32, L]; every term is a full-occupancy [8, L] tile."""
    w1, x1, y1, z1 = q1[0:8], q1[8:16], q1[16:24], q1[24:32]
    w2, x2, y2, z2 = q2[0:8], q2[8:16], q2[16:24], q2[24:32]
    return jnp.concatenate(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=0,
    )


def _tree_lane(x, width, op):
    """Reduce the 8 j-major lane blocks of ``width`` lanes:
    [C, 8*width] -> [C, width] by a 3-level halving tree."""
    for m in (4, 2, 1):
        x = op(x[:, : m * width], x[:, m * width:])
    return x


def _sel_matrices():
    """Constant 0/1 selection matrices (iota-built, hoisted per cell)."""
    ic4 = lax.broadcasted_iota(jnp.int32, (4, 32), 0)
    ir4 = lax.broadcasted_iota(jnp.int32, (4, 32), 1)
    # cm -> lane block j: P_j [4, 32] with P_j[c, c*8+j] = 1
    p_sel = [(ir4 == ic4 * G + j).astype(F32) for j in range(G)]
    ic32 = lax.broadcasted_iota(jnp.int32, (32, 4), 0)
    ir32 = lax.broadcasted_iota(jnp.int32, (32, 4), 1)
    # lane block j -> cm rows: Q_j [32, 4] with Q_j[c*8+j, c] = 1
    q_sel = [(ic32 == ir32 * G + j).astype(F32) for j in range(G)]
    ic8 = lax.broadcasted_iota(jnp.int32, (8, 32), 0)
    ir8 = lax.broadcasted_iota(jnp.int32, (8, 32), 1)
    # per-j component sum: RSQ [8, 32] with RSQ[j, c*8+j] = 1
    rsq = (ir8 % G == ic8).astype(F32)
    ict = lax.broadcasted_iota(jnp.int32, (32, 8), 0)
    irt = lax.broadcasted_iota(jnp.int32, (32, 8), 1)
    # tile a [8, L] per-j row set to all 4 component blocks: T4 [32, 8]
    t4 = (ict % G == irt).astype(F32)
    # node [4, L] -> cm [32, L] row replication: T4Q[c*8+j, c] = 1
    t4q = (ic32 // G == ir32).astype(F32)
    # cm [32, L] -> node [4, L] grouped j-sum: R4[c, c*8+j] = 1
    r4 = (ir4 // G == ic4).astype(F32)
    return p_sel, q_sel, rsq, t4, t4q, r4


def _lane8(x):
    """Replicate a node-width tile to all 8 j-major lane blocks:
    [C, L] -> [C, 8L] by three concat-doublings."""
    for _ in range(3):
        x = jnp.concatenate((x, x), axis=1)
    return x


def pack_headmm_ext(weights: list) -> jnp.ndarray:
    """HEADPACK probe (VERDICT r3 next #5): extend the fused head-lin1
    matrix so ONE matmul produces the full per-group ``pre_heads``.

    The forward budget shows ``headmm`` ([4T, M] @ relu(pre), contraction
    M=64) at ~1.6x its bf16 MXU floor — a K<=128 contraction pays a full
    MXU pass regardless of depth, so the unused contraction rows are
    free. This folds INTO that same pass: the rotation head's separate
    K=4 matmul (``wrq @ local_quats`` — its own full pass), the
    attention head's rank-1 VPU terms (``wad*(-d2) + waq*qdot^2``), all
    four head biases (rank-1 vs a ones row), and the torsion head's
    node-constant term (``wtt @ torsions``), eliminating one MXU pass,
    the [4T, W8] four-block concat, and the VPU broadcasts per group:

        whm_ext [4T, M+21] = [whm | wrq@rot-rows | wad | waq | b | wtt]
        ext8    [M+21, W8] = [relu(pre); local_quats; -d2; qdot^2; 1; tors]
        pre_heads = whm_ext @ ext8          (contraction 85 <= 128)

    Exact in f32-HIGHEST up to dot reassociation (~1e-6 rel, same class
    as the pack-time whm fold); in bf16 mode the folded operands round
    to bf16 like every other matmul operand in that mode."""
    (_wmi, _bm1, whm, wad, waq, ba1, _w2all, _b2all, _wfh, _wfm2, _bf1,
     _wf2, _bf2, bl1, wrq, br1, wtt, bt1) = weights
    T4 = whm.shape[0]
    T = T4 // 4
    z = lambda r, c: jnp.zeros((r, c), F32)
    wrq_blk = jnp.concatenate((z(T, 4), wrq, z(2 * T, 4)), axis=0)
    wad_col = jnp.concatenate((wad, z(3 * T, 1)), axis=0)
    waq_col = jnp.concatenate((waq, z(3 * T, 1)), axis=0)
    bias_col = jnp.concatenate(
        (ba1, br1, bt1, jnp.broadcast_to(bl1, (T, 1))), axis=0)
    wtt_blk = jnp.concatenate(
        (z(2 * T, 2 * N_TORSIONS), wtt, z(T, 2 * N_TORSIONS)), axis=0)
    return jnp.concatenate(
        (whm, wrq_blk, wad_col, waq_col, bias_col, wtt_blk), axis=1)


def _make_kernel_g8(k: int, bf16: bool = False, unroll: int = 1,
                    headpack: bool = False):
    _mm, _mm0 = _mm_maker(bf16)
    abl = ABLATE_STAGES  # timing-only stage ablation (see definition)

    def _kernel(
        # per-node, node-lane layout [C, BNB] (lane = n*Bp+b) — the j-major
        # group-lane and component-major replicas are built IN-KERNEL
        h_ref,        # [H, BNB]
        qi_ref,       # [4, BNB]
        ti_ref,       # [3, BNB]
        tors_ref,     # [14, BNB] interleaved (sin0 cos0 ...)
        sin_ref,      # [7, BNB]
        cos_ref,      # [7, BNB]
        # resident neighbour-side tensors (old per-neighbour layout)
        aj_ref,       # [NP, T, Bp]
        qj_ref,       # [NP, 4, Bp]
        tj_ref,       # [NP, 3, Bp]
        qjg_cm_ref,   # [NG, 32, Bp] component-major groups
        edge_ref,     # [NP, k, T] (this cell's n rows)
        mask_ref,     # [NP, 1, BNB] (this cell's message-mask rows)
        s_ref,        # [k, BNB] one-hot n expansion
        # weights (pack_lane_weights order)
        wmi_ref, bm1_ref,
        whm_ref,
        wad_ref, waq_ref, ba1_ref,
        w2all_ref, b2all_ref,
        wfh_ref, wfm2_ref, bf1_ref,
        wf2_ref, bf2_ref,
        bl1_ref,
        wrq_ref, br1_ref,
        wtt_ref, bt1_ref,
        # outputs (node-lane layout)
        out_q_ref, out_t_ref, out_sin_ref, out_cos_ref, out_feat_ref,
    ):
        NG = qjg_cm_ref.shape[0]
        Th = wfm2_ref.shape[-1]  # message hidden width (relu(pre) rows)
        T = whm_ref.shape[0] // 4
        BNB = qi_ref.shape[-1]

        p_sel, q_sel, rsq, t4, t4q, _ = _sel_matrices()
        s_mat = s_ref[:]

        # hoisted per-cell tensors (node-width compute, then replicate)
        a_i8 = _lane8(_mm(wmi_ref[:], h_ref[:]) + bm1_ref[:])  # [T, BNB8]
        if headpack:
            # node-constant rows of the HEADPACK ext operand (torsions +
            # the bias ones-row); the wtt matmul rides whm_ext instead
            tors8 = _lane8(tors_ref[:])                        # [14, BNB8]
            ones8 = jnp.ones((1, G * BNB), F32)
            tor_node8 = None
        else:
            tor_node8 = _lane8(_mm(wtt_ref[:], tors_ref[:]))   # [T, BNB8]
        q_i8 = _lane8(qi_ref[:])
        t_i8 = _lane8(ti_ref[:])
        qi_cm = _mm(t4q, qi_ref[:])                            # [32, BNB]
        wad = wad_ref[:]
        waq = waq_ref[:]

        def rep(block):
            """[C, Bp] -> [C, BNB] (repeat across the cell's k query n)."""
            return pltpu.repeat(block, k, axis=1) if k > 1 else block

        def expand8(ref, g):
            """8 neighbours' [C, Bp] blocks -> [C, G*BNB] j-major."""
            return jnp.concatenate(
                [rep(ref[g * G + j]) for j in range(G)], axis=1
            )

        def cm_to_lane(x_cm):
            """[4*G, BNB] -> [4, G*BNB] via 8 selection matmuls."""
            return jnp.concatenate([_mm(p, x_cm) for p in p_sel], axis=1)

        def lane_to_cm(x_lane):
            """[4, G*BNB] -> [4*G, BNB] via 8 selection matmuls."""
            out = _mm0(q_sel[0].T, x_lane[:, :BNB])
            for j in range(1, G):
                out = out + _mm0(q_sel[j].T, x_lane[:, j * BNB:(j + 1) * BNB])
            return out

        def one_group(g, carry):
            (m_run, acc_d, acc_gd, acc_ta, acc_tr, acc_hid, acc_cnt) = carry

            if "expand" in abl:  # timing ablation: wrong outputs
                aj8 = a_i8
                pre8 = a_i8
                q_j8 = q_i8
                t_j8 = 0.5 * t_i8
            else:
                aj8 = expand8(aj_ref, g)                  # [T, BNB8]
                edge8 = jnp.concatenate(
                    [_mm0(edge_ref[g * G + j], s_mat) for j in range(G)],
                    axis=1,
                )                                          # [T, BNB8]
                pre8 = a_i8 + aj8 + edge8
                q_j8 = expand8(qj_ref, g)                 # [4, BNB8]
                t_j8 = expand8(tj_ref, g)                 # [3, BNB8]
            hid8 = jnp.maximum(pre8, 0.0)                 # [Th, BNB8]
            mask8 = jnp.concatenate(
                [mask_ref[g * G + j] for j in range(G)], axis=1
            )                                              # [1, BNB8]

            tdiff = t_i8 - t_j8                           # [3, BNB8]
            d2 = jnp.sum(jnp.square(tdiff), axis=0, keepdims=True)
            qdot = jnp.sum(q_i8 * q_j8, axis=0, keepdims=True)

            if headpack:
                # HEADPACK probe: rotation geometry first (its local
                # quats are contraction rows of the one fused matmul)
                qj_cm = rep(qjg_cm_ref[g])                # [32, BNB]
                sq = jnp.maximum(
                    _mm(rsq, jnp.square(qj_cm)), 1e-30)   # [8, BNB]
                conj = jnp.concatenate((qj_cm[0:8], -qj_cm[8:32]), axis=0)
                inv_cm = conj / _mm(t4, sq)               # [32, BNB]
                local_cm = _qmul_cm(inv_cm, _qmul_cm(qi_cm, qj_cm))
                ext8 = jnp.concatenate(
                    (hid8, cm_to_lane(local_cm), -d2, qdot * qdot,
                     ones8, tors8), axis=0)               # [Th+21, BNB8]
                # whm_ref holds whm_ext: heads + rot/att/bias/torsion
                # terms in ONE contraction<=128 MXU pass (pack_headmm_ext)
                pre_heads = _mm(whm_ref[:], ext8)         # [4T, BNB8]
                W8 = pre_heads.shape[-1]
            else:
                # message lin2 folded into the head lin1 (whm = wheads@wm2)
                heads8 = (pltpu.repeat(hid8, 4, axis=0) if "headmm" in abl
                          else _mm(whm_ref[:], hid8))     # [4T, BNB8]

                # ---- rotation geometry, component-major --------------
                W8 = heads8.shape[-1]
                if "rotcm" in abl:  # timing ablation: wrong outputs
                    rot_pre = tor_node8
                else:
                    qj_cm = rep(qjg_cm_ref[g])            # [32, BNB]
                    # exact-zero guard: batch-PADDING lanes carry zero
                    # quats and 0/0 NaNs would trip jax_debug_nans (and
                    # persist in the g8 sampler's scan carry) even though
                    # padded lanes are sliced off — same guard as the VJP
                    # twin (_g8_ctx)
                    sq = jnp.maximum(
                        _mm(rsq, jnp.square(qj_cm)), 1e-30)   # [8, BNB]
                    conj = jnp.concatenate(
                        (qj_cm[0:8], -qj_cm[8:32]), axis=0)
                    inv_cm = conj / _mm(t4, sq)           # [32, BNB]
                    local_cm = _qmul_cm(inv_cm, _qmul_cm(qi_cm, qj_cm))
                    rot_pre = (_mm(wrq_ref[:], cm_to_lane(local_cm))
                               + br1_ref[:])

                # the four heads' pre-activations as ONE [4T, BNB8]
                # tensor, one relu, one fused block-diagonal lin2 matmul
                pre_heads = heads8 + jnp.concatenate(
                    (
                        wad * (-d2) + waq * jnp.square(qdot) + ba1_ref[:],
                        rot_pre,
                        tor_node8 + bt1_ref[:],
                        jnp.broadcast_to(bl1_ref[:], (T, W8)),
                    ),
                    axis=0,
                )
            out_all = (pre_heads[0:32] if "head2mm" in abl else
                       _mm(w2all_ref[:], jnp.maximum(pre_heads, 0.0))
                       + b2all_ref[:])                     # [32, BNB8]
            logits = out_all[0:1] - (1.0 - mask8) * INFINITY
            # sigmoid quat used UNNORMALIZED (reference model.py:291-292)
            ld8 = jax.nn.sigmoid(out_all[8:12])            # [4, BNB8]
            if "rotcm" in abl:  # timing ablation: wrong outputs
                gdelta8 = ld8
            else:
                gdelta_cm = _qmul_cm(
                    qj_cm, _qmul_cm(lane_to_cm(ld8), inv_cm))
                gdelta8 = cm_to_lane(gdelta_cm)           # [4, BNB8]
            mdelta8 = out_all[16:23]                       # [7, BNB8]
            mtr8 = out_all[24:25]                          # [1, BNB8]
            mr8 = mtr8 * tdiff                             # [3, BNB8]

            if "fold" in abl:  # timing ablation: wrong outputs
                cut = lambda x: x[:, :BNB]
                return (
                    jnp.maximum(m_run, cut(logits)),
                    acc_d + cut(logits),
                    acc_gd + cut(gdelta8),
                    acc_ta + cut(mdelta8),
                    acc_tr + cut(mr8),
                    acc_hid + cut(hid8),
                    acc_cnt + cut(mask8),
                )

            # ---- group tree-fold to node width, then one online-softmax
            # fold into the running accumulators -----------------------
            gm = _tree_lane(logits, BNB, jnp.maximum)     # [1, BNB]
            m_new = jnp.maximum(m_run, gm)
            r = jnp.exp(m_run - m_new)
            m_new8 = m_new
            for _ in range(3):
                m_new8 = jnp.concatenate((m_new8, m_new8), axis=1)
            w8 = jnp.exp(logits - m_new8)                 # [1, BNB8]

            add = jnp.add
            return (
                m_new,
                acc_d * r + _tree_lane(w8, BNB, add),
                acc_gd * r + _tree_lane(w8 * gdelta8, BNB, add),
                acc_ta * r + _tree_lane(w8 * mdelta8, BNB, add),
                acc_tr * r + _tree_lane(w8 * mr8, BNB, add),
                # Σmsg = wm2 @ Σhid + NP·bm2, folded into wfm2/bf1'
                acc_hid + _tree_lane(hid8, BNB, add),
                acc_cnt + _tree_lane(mask8, BNB, add),
            )

        init = (
            jnp.full((1, BNB), -1e30, F32),
            jnp.zeros((1, BNB), F32),
            jnp.zeros((4, BNB), F32),
            jnp.zeros((N_TORSIONS, BNB), F32),
            jnp.zeros((3, BNB), F32),
            jnp.zeros((Th, BNB), F32),
            jnp.zeros((1, BNB), F32),
        )
        u = unroll if NG % unroll == 0 else 1

        def body(step, carry):
            for j in range(u):
                carry = one_group(step * u + j, carry)
            return carry

        _, acc_d, acc_gd, acc_ta, acc_tr, acc_hid, acc_cnt = lax.fori_loop(
            0, NG // u, body, init
        )

        # ---- finalize (identical to egnn_pallas_lane) ----------------
        inv_d = 1.0 / acc_d
        h = h_ref[:]
        q_i = qi_ref[:]
        t_i = ti_ref[:]

        feat_pre = (
            _mm(wfh_ref[:], h) + _mm(wfm2_ref[:], acc_hid) + bf1_ref[:]
        )
        out_feat_ref[:] = (
            _mm(wf2_ref[:], jnp.maximum(feat_pre, 0.0)) + bf2_ref[:]
        )

        gd = acc_gd * inv_d
        has_nb = acc_cnt > 0.0
        iden = (lax.broadcasted_iota(jnp.int32, (4, BNB), 0) == 0).astype(F32)
        gd = jnp.where(has_nb, gd, iden)
        gd = gd / jnp.maximum(
            jnp.sqrt(jnp.sum(gd * gd, axis=0, keepdims=True)), 1e-12
        )

        upd_q = _qmul_rows(gd, q_i)
        out_q_ref[:] = upd_q / jnp.maximum(
            jnp.sqrt(jnp.sum(upd_q * upd_q, axis=0, keepdims=True)), 1e-12
        )

        delta_a = acc_ta * inv_d
        sin_d, cos_d = jnp.sin(delta_a), jnp.cos(delta_a)
        sin_t, cos_t = sin_ref[:], cos_ref[:]
        out_sin_ref[:] = sin_d * cos_t + cos_d * sin_t
        out_cos_ref[:] = cos_d * cos_t - sin_d * sin_t

        out_t_ref[:] = t_i + acc_tr * inv_d

    return _kernel


# ---------------------------------------------------------------------------
# XLA-side layout preparation
# ---------------------------------------------------------------------------


def nbr_to_cm8(x: jnp.ndarray, Bp: int) -> jnp.ndarray:
    """[B, NP, C] -> [NG, C*G, Bp] component-major neighbour groups."""
    B, NP, C = x.shape
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
    t = jnp.transpose(x, (1, 2, 0))                      # [NP, C, Bp]
    t = t.reshape(NP // G, G, C, Bp)
    t = jnp.transpose(t, (0, 2, 1, 3))                   # [NG, C, G, Bp]
    return t.reshape(NP // G, C * G, Bp)


def nbr_to_cm8_bg(x: jnp.ndarray, Cb: int, nch: int) -> jnp.ndarray:
    """[B, NP, C] -> [NG, C*G, nch*Cb]: ``nbr_to_cm8`` per batch chunk,
    chunk-major on the lane axis (block bc = lanes [bc*Cb, (bc+1)*Cb))."""
    from pmhc_tpu.ops.egnn_pallas_lane import _chunk_stack

    y = _chunk_stack(x, Cb, nch)                         # [nch, Cb, NP, C]
    NP, C = y.shape[2], y.shape[3]
    t = jnp.transpose(y, (2, 3, 0, 1))                   # [NP, C, nch, Cb]
    t = t.reshape(NP // G, G, C, nch, Cb)
    t = jnp.transpose(t, (0, 2, 1, 3, 4))                # [NG, C, G, nch, Cb]
    return t.reshape(NP // G, C * G, nch * Cb)


def egnn_lane8_core(
    weights: list,
    h, qi, ti, tors14, sin, cos,  # node-lane per-node [C, N*Bp]
    aj3, qj3, tj3, qjg_cm,        # residents [NP, C, Bp] + cm groups
    edge3, mask_t, s_mat,
    *,
    k: int,
    Bp: int,
    O: int,
    interpret: bool = False,
    bf16: bool = False,
    unroll: int = 1,
    batch_grid: bool = False,
    headpack: bool | None = None,
):
    """The geom8 pallas_call on already-transposed operands — the same
    operand set as ``egnn_lane_core`` plus the component-major neighbour
    groups ``qjg_cm``. Returns node-lane outputs (q, t, sin, cos, feat).

    ``batch_grid``: grid cells are BATCH CHUNKS of Bp entries covering
    all k == N query residues (operands in the chunk-major ``*_bg``
    layouts, lane = bc*(N*Bp) + n*Bp + b). Each cell sees exactly the
    per-cell shapes of the non-bg call, so the kernel is unchanged; the
    lane/mask/output specs are also unchanged (block i IS chunk i when
    k == N) — only the resident/qjg/edge index maps differ. This
    replaces lax.map batch chunking so Mosaic pipelines chunk HBM
    transfers against compute (same win as the vjp batch-grid)."""
    if headpack is None:
        # default ON: measured 408.0 vs 371.5 samples/s (+9.9%) at bf16
        # B=1024 T=1000 on-chip, window-controlled (docs/status.md r4);
        # PMHC_G8_HEADPACK=0 restores the separate-stage kernel (the
        # stage-ablation budget tooling is wired for that one, so
        # ablation runs fall back automatically)
        import os

        headpack = (not ABLATE_STAGES
                    and bool(int(os.environ.get("PMHC_G8_HEADPACK", "1"))))
    if headpack:
        if ABLATE_STAGES:
            raise ValueError("stage ablation is only wired for the "
                             "non-headpack kernel (set PMHC_G8_HEADPACK=0)")
        weights = list(weights)
        weights[2] = pack_headmm_ext(weights)  # whm slot -> whm_ext
    NP = aj3.shape[0]
    NG = NP // G
    T = weights[0].shape[0]
    H = h.shape[0]
    BNB = k * Bp
    N = h.shape[-1] // Bp        # batch_grid: nch * (real N), so the
    grid = (N // k,)             # grid is (nch,) exactly when k == N

    lane = lambda c: pl.BlockSpec((c, BNB), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    bidx = (lambda i: (0, 0, i)) if batch_grid else (lambda i: (0, 0, 0))
    res = lambda c, w: pl.BlockSpec((NP, c, w), bidx,
                                    memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    in_specs = [
        lane(H), lane(4), lane(3), lane(2 * N_TORSIONS),
        lane(N_TORSIONS), lane(N_TORSIONS),
        res(T, Bp), res(4, Bp), res(3, Bp),
        pl.BlockSpec((NG, 4 * G, Bp), bidx, memory_space=pltpu.VMEM),
        pl.BlockSpec((NP, k, T),
                     (lambda i: (0, 0, 0)) if batch_grid
                     else (lambda i: (0, i, 0)),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NP, 1, BNB), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        const((k, BNB)),
    ] + [const(w.shape) for w in weights]

    out_specs = tuple(
        lane(c) for c in (4, 3, N_TORSIONS, N_TORSIONS, O)
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((c, h.shape[-1]), F32)
        for c in (4, 3, N_TORSIONS, N_TORSIONS, O)
    )

    return pl.pallas_call(
        _make_kernel_g8(k, bf16, unroll, headpack),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(h, qi, ti, tors14, sin, cos,
      aj3, qj3, tj3, qjg_cm, edge3, mask_t, s_mat, *weights)


def egnn_forward_pallas_lane_g8(
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
    bf16: bool = False,
    unroll: int = 1,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ``egnn_forward`` (geom8 layout)."""
    from pmhc_tpu.ops.egnn_pallas_lane import (
        lane_edge3, lane_msg_mask, lane_s_mat, lane_to_node, nbr_to_lane,
        node_to_lane,
    )

    B, N = peptide_mask.shape
    P = pocket_mask.shape[-1]
    NP = N + P
    if NP % G:
        raise ValueError(f"N+P={NP} must be a multiple of {G} for geom8")
    H = peptide_features.shape[-1]
    O = params["feature"]["lin2"]["b"].shape[0]

    # the group-lane tiles are G times wider than the lane kernel's, so
    # big batches tile the kernel GRID over batch chunks (heads8 at
    # B=1024 in one cell would be [4T, 64k] = 67 MB f32; per-chunk cells
    # keep it at 16 MB and Mosaic pipelines chunk HBM transfers).
    # batch-grid needs k == N query rows per cell at a lane-legal chunk
    # width: the [*, C, nch*Cb] residents are lane-blocked at Cb, which
    # Mosaic requires divisible by 128 when the block doesn't span the
    # whole axis (same constraint as the VJP's batch-grid; interpret
    # mode is exempt)
    CHUNK = 256
    Cb = 2048 // N if N <= 2048 else 0
    batch_grid = (B > CHUNK and N * Cb == 2048
                  and (interpret or Cb % 128 == 0))

    if B > CHUNK and not batch_grid:
        # no lane-legal batch-grid geometry: lax.map batch chunking
        pad = (-B) % CHUNK
        def padb(x):
            return jnp.pad(
                x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
            ) if pad else x

        stack = lambda x: padb(x).reshape(
            (B + pad) // CHUNK, CHUNK, *x.shape[1:]
        )
        chunked = (
            stack(peptide_frames.quats), stack(peptide_frames.trans),
            stack(peptide_torsions), stack(peptide_features),
            stack(peptide_mask), stack(pocket_features),
            stack(pocket_frames.quats), stack(pocket_frames.trans),
            stack(pocket_mask),
        )

        def one(chunk):
            fq, ft, tors, feats, pm, pkf, pkq, pkt, pkm = chunk
            fr, tr, hh = egnn_forward_pallas_lane_g8(
                params, RigidArray(fq, ft), tors, feats, edge_pre, pm,
                pkf, RigidArray(pkq, pkt), pkm, lane_block=lane_block,
                interpret=interpret, bf16=bf16, unroll=unroll,
            )
            return fr.quats, fr.trans, tr, hh

        oq, ot, otr, ohh = lax.map(one, chunked)
        merge = lambda x: x.reshape(-1, *x.shape[2:])[:B]
        return (RigidArray(merge(oq), merge(ot)), merge(otr), merge(ohh))

    # operand preparation shared by the single-cell and batch-grid paths
    weights = pack_lane_weights(params, H, NP)
    h_all = jnp.concatenate((peptide_features, pocket_features), axis=-2)
    q_all = jnp.concatenate(
        (peptide_frames.quats, pocket_frames.quats), axis=-2
    )
    t_all = jnp.concatenate(
        (peptide_frames.trans, pocket_frames.trans), axis=-2
    )

    w1m = jnp.asarray(params["message"]["lin1"]["w"], F32)
    a_j = jnp.einsum(
        "bph,ht->bpt", h_all, w1m[H:2 * H],
        precision=lax.Precision.HIGHEST,
    )

    tors_flat = peptide_torsions.reshape(B, N, N_TORSIONS * 2)

    if batch_grid:
        from pmhc_tpu.ops.egnn_pallas_lane import (
            lane_msg_mask_bg, lane_to_node_bg, nbr_to_lane_bg,
            node_to_lane_bg,
        )

        k = N                          # k == N query rows x Cb batch
        nch = -(-B // Cb)
        out_q, out_t, out_sin, out_cos, out_feat = egnn_lane8_core(
            weights,
            node_to_lane_bg(peptide_features, Cb, nch),
            node_to_lane_bg(peptide_frames.quats, Cb, nch),
            node_to_lane_bg(peptide_frames.trans, Cb, nch),
            node_to_lane_bg(tors_flat, Cb, nch),
            node_to_lane_bg(peptide_torsions[..., 0], Cb, nch),
            node_to_lane_bg(peptide_torsions[..., 1], Cb, nch),
            nbr_to_lane_bg(a_j, Cb, nch),
            nbr_to_lane_bg(q_all, Cb, nch),
            nbr_to_lane_bg(t_all, Cb, nch),
            nbr_to_cm8_bg(q_all, Cb, nch),
            lane_edge3(edge_pre, P),
            lane_msg_mask_bg(peptide_mask, pocket_mask, Cb, nch),
            lane_s_mat(k, Cb),
            k=k, Bp=Cb, O=O, interpret=interpret, bf16=bf16,
            unroll=unroll, batch_grid=True,
        )
        node_back = lambda x: lane_to_node_bg(x, B, Cb, nch)
        out_tors = jnp.stack(
            (node_back(out_sin), node_back(out_cos)), axis=-1)
        return (
            RigidArray(node_back(out_q), node_back(out_t)),
            out_tors,
            node_back(out_feat),
        )

    k, Bp = lane_geometry(B, N, lane_block)
    out_q, out_t, out_sin, out_cos, out_feat = egnn_lane8_core(
        weights,
        node_to_lane(peptide_features, Bp),
        node_to_lane(peptide_frames.quats, Bp),
        node_to_lane(peptide_frames.trans, Bp),
        node_to_lane(tors_flat, Bp),
        node_to_lane(peptide_torsions[..., 0], Bp),
        node_to_lane(peptide_torsions[..., 1], Bp),
        nbr_to_lane(a_j, Bp),
        nbr_to_lane(q_all, Bp),
        nbr_to_lane(t_all, Bp),
        nbr_to_cm8(q_all, Bp),
        lane_edge3(edge_pre, P),
        lane_msg_mask(peptide_mask, pocket_mask, Bp),
        lane_s_mat(k, Bp),
        k=k, Bp=Bp, O=O, interpret=interpret, bf16=bf16, unroll=unroll,
    )

    node_back = lambda x: lane_to_node(x, B, Bp)
    out_tors = jnp.stack((node_back(out_sin), node_back(out_cos)), axis=-1)
    return (
        RigidArray(node_back(out_q), node_back(out_t)),
        out_tors,
        node_back(out_feat),
    )
