"""Differentiable lane-packed EGNN layer: Pallas forward AND backward.

``egnn_pallas_lane.py``'s monolithic kernel is forward-only; its trainable
wrapper pays an extra full XLA forward in the backward (remat). This
module removes that tax with a hand-written backward kernel, structured
for differentiability:

    XLA pre-projections  ->  Pallas NEIGHBOUR LOOP (custom_vjp)  ->  XLA finalize
    (a_i, a_j, tor_node,     raw online-softmax accumulators         (feature MLP,
     layout transposes)      m, D, GD, TA, TR, MSG, CNT)             quat/torsion/
                                                                      translation
                                                                      composes)

Only the O(BN * NP) neighbour loop lives in Pallas; everything per-node is
plain jnp, so JAX autodiff handles the pre/post stages and the loop's
custom VJP supplies d(inputs) and d(weights) from a flash-style backward:
re-run the loop, recompute each neighbour block's intermediates, and turn
the softmax-numerator cotangents into logit/message/head gradients
(exact: the running max m is a shift the D-normalized finalize cancels,
so its cotangent is identically zero).

Weight gradients accumulate across grid cells in revisited output blocks
(constant index maps, zero-initialized at the first cell) — the standard
Pallas reduction-output pattern. Parity:
tests/unit/test_pallas_lane_vjp.py (interpret mode, values AND grads vs
the dense XLA layer).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmhc_tpu.geometry import (
    RigidArray,
    multiply_sin_cos,
    quat_multiply,
    torch_normalize,
)
from pmhc_tpu.ops.egnn_pallas_lane import _qmul_rows, mm_maker

N_TORSIONS = 7
INFINITY = 1e9
F32 = jnp.float32

# loop-weight pytree order (everything the neighbour loop consumes)
# "whm" fuses the four msg-consuming head lin1 matrices [wam; wrm; wtm;
# wl1] AND the message lin2 into one [4T, T] block (whm = wheads @ wm2;
# msg is consumed only linearly, so the lin2 folds into the weights —
# see egnn_pallas_lane.pack_lane_weights): ONE MXU op per neighbour from
# relu(pre) straight to the heads, one fused dW outer product and one
# d(hid) matmul in the backward. bm2's head contribution is folded into
# the ba1/br1/bt1/bl1 biases outside the kernel (differentiably).
# "w2all"/"b2all" fuse the four head lin2 matmuls the same way
# (egnn_pallas_lane.pack_head_lin2: block-diagonal [32, 4T], head rows
# at 8-aligned offsets) — one fused lin2 matmul, one fused dW2ALL outer
# product and one fused d(pre) matmul in the backward.
_LOOP_W = ("whm", "wad", "waq", "ba1", "w2all", "b2all",
           "bl1", "wrq", "br1", "bt1")


def _qconj(q):
    return jnp.concatenate((q[0:1], -q[1:]), axis=0)


# Timing-only instrumentation for tools/bench_bwd_stages.py: stage names
# the g8 BACKWARD loop kernel SKIPS at trace time, so on-chip A/B timing
# isolates each stage's device cost (the per-stage cycle budget of
# docs/status.md). Gradients are WRONG under ablation — production code
# never sets this; the bench tool sets it and calls
# _loop_fn.cache_clear() around each variant. Stages:
#   "rotcm"   component-major quaternion adjoint chains + crossings
#   "dw"      every weight-gradient accumulation (dW outer products,
#             bias rowsums)
#   "head2mm" the fused head-lin2 backward matmul (d pre_heads)
#   "headmm"  the fused head-lin1 backward matmul (d hid; the message
#             lin2 backward is folded in — whm = wheads @ wm2)
#   "nbr"     the per-neighbour collapse/output block (daj/dqj/dtj/dedge)
ABLATE_STAGES: frozenset = frozenset()


# the 3-mode kernel matmul family (False / True / "high") lives with the
# forward kernel
_mm_maker = mm_maker


def _recompute_block(w, _mm, _mm0, expand, a_i, tor_node, q_i, t_i,
                     aj, qj, tj, edge_kT, mask, s_mat, headpack_ctx=None):
    """Forward intermediates for one neighbour index (shared by the fwd
    kernel and the bwd recompute). ``headpack_ctx``: see _g8_ctx."""
    edge_exp = _mm0(edge_kT, s_mat)
    pre = a_i + expand(aj) + edge_exp
    hid_m = jnp.maximum(pre, 0.0)

    q_j = expand(qj)
    t_j = expand(tj)

    d2 = jnp.sum(jnp.square(t_i - t_j), axis=0, keepdims=True)
    qdot = jnp.sum(q_i * q_j, axis=0, keepdims=True)
    T = w["whm"].shape[0] // 4

    # exact-zero guard: batch-PADDING lanes carry zero quats, and 0/0
    # NaNs would poison the backward's lane-reduction weight grads even
    # though every padded cotangent is zero (NaN * 0 = NaN). Any real
    # quat has |q|^2 >> 1e-30, so this changes nothing else.
    sq = jnp.maximum(jnp.sum(q_j * q_j, axis=0, keepdims=True), 1e-30)
    inv_qj = _qconj(q_j) / sq
    v = _qmul_rows(q_i, q_j)
    local_q = _qmul_rows(inv_qj, v)

    if headpack_ctx is not None:
        wext, tors_rows, ones_row = headpack_ctx
        ext = jnp.concatenate(
            (hid_m, local_q, -d2, jnp.square(qdot), ones_row, tors_rows),
            axis=0,
        )
        pre_heads = _mm(wext, ext)  # [4T, BNB]
    else:
        # message lin2 folded into the head lin1 (whm = wheads @ wm2)
        heads = _mm(w["whm"], hid_m)  # [4T, BNB]: att | rot | tor | tr
        # fused head pre-activations + ONE block-diagonal lin2 (w2all)
        BNB = heads.shape[-1]
        pre_heads = heads + jnp.concatenate(
            (
                w["wad"] * (-d2) + w["waq"] * jnp.square(qdot) + w["ba1"],
                _mm(w["wrq"], local_q) + w["br1"],
                tor_node + w["bt1"],
                jnp.broadcast_to(w["bl1"], (T, BNB)),
            ),
            axis=0,
        )
    relu_heads = jnp.maximum(pre_heads, 0.0)
    out_all = _mm(w["w2all"], relu_heads) + w["b2all"]  # [32, BNB]
    logit = out_all[0:1] - (1.0 - mask) * INFINITY
    ld = jax.nn.sigmoid(out_all[8:12])
    u = _qmul_rows(ld, inv_qj)
    gdelta = _qmul_rows(q_j, u)
    mdelta = out_all[16:23]
    mtr = out_all[24:25]
    mr = mtr * (t_i - t_j)

    return dict(pre=pre, hid_m=hid_m, q_j=q_j, t_j=t_j, d2=d2,
                qdot=qdot, logit=logit,
                sq=sq, inv_qj=inv_qj, v=v, local_q=local_q,
                pre_heads=pre_heads, relu_heads=relu_heads,
                ld=ld, u=u, gdelta=gdelta,
                mdelta=mdelta, mtr=mtr, mr=mr, mask=mask)


def _make_loop_fwd(k: int, bf16: bool, unroll: int,
                   headpack: bool = False):
    _mm, _mm0, _mmL = _mm_maker(bf16)

    def kernel(ai_ref, tor_ref, qi_ref, ti_ref,
               aj_ref, qj_ref, tj_ref, edge_ref, mask_ref, s_ref,
               *w_then_out):
        w = dict(zip(_LOOP_W, w_then_out[: len(_LOOP_W)]))
        w = {n: r[:] for n, r in w.items()}
        nhp = 2 if headpack else 0
        if headpack:  # extra trailing inputs: raw torsions + whm_ext
            tor14_ref, wext_ref = w_then_out[len(_LOOP_W):len(_LOOP_W) + 2]
        (m_ref, d_ref, gd_ref, ta_ref, tr_ref, hid_ref, cnt_ref) = \
            w_then_out[len(_LOOP_W) + nhp:]
        NP = aj_ref.shape[0]
        Th = w["whm"].shape[-1]   # message hidden width (relu(pre) rows)
        BNB = ai_ref.shape[-1]

        a_i = ai_ref[:]
        tor_node = tor_ref[:]
        q_i = qi_ref[:]
        t_i = ti_ref[:]
        s_mat = s_ref[:]
        hp_ctx = ((wext_ref[:], tor14_ref[:], jnp.ones((1, BNB), F32))
                  if headpack else None)

        def expand(block):
            return pltpu.repeat(block, k, axis=1) if k > 1 else block

        def one(np_i, carry):
            m_run, acc_d, acc_gd, acc_ta, acc_tr, acc_hid, acc_cnt = carry
            r_ = _recompute_block(
                w, _mm, _mm0, expand, a_i, tor_node, q_i, t_i,
                aj_ref[np_i], qj_ref[np_i], tj_ref[np_i], edge_ref[np_i],
                mask_ref[np_i], s_mat, headpack_ctx=hp_ctx,
            )
            m_new = jnp.maximum(m_run, r_["logit"])
            r = jnp.exp(m_run - m_new)
            l = jnp.exp(r_["logit"] - m_new)
            return (
                m_new,
                acc_d * r + l,
                acc_gd * r + l * r_["gdelta"],
                acc_ta * r + l * r_["mdelta"],
                acc_tr * r + l * r_["mr"],
                # Σmsg = wm2 @ Σhid + NP·bm2 (linear lin2): the finalize
                # applies wm2 ONCE to this accumulator instead of the
                # loop applying it per neighbour
                acc_hid + r_["hid_m"],
                acc_cnt + r_["mask"],
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
        u_ = unroll if NP % unroll == 0 else 1

        def body(step, carry):
            for j in range(u_):
                carry = one(step * u_ + j, carry)
            return carry

        m, d, gd, ta, tr, hid, cnt = lax.fori_loop(0, NP // u_, body, init)
        m_ref[:] = m
        d_ref[:] = d
        gd_ref[:] = gd
        ta_ref[:] = ta
        tr_ref[:] = tr
        hid_ref[:] = hid
        cnt_ref[:] = cnt

    return kernel


def _make_loop_bwd(k: int, bf16: bool, unroll: int, batch_grid: bool = False,
                   headpack: bool = False):
    _mm, _mm0, _mmL = _mm_maker(bf16)

    def kernel(ai_ref, tor_ref, qi_ref, ti_ref,
               aj_ref, qj_ref, tj_ref, edge_ref, mask_ref, s_ref, j_ref,
               m_ref, gd_ct_ref, gta_ref, gtr_ref, gdn_ref, ghid_ref,
               *w_then_out):
        w = dict(zip(_LOOP_W, w_then_out[: len(_LOOP_W)]))
        w = {n: r[:] for n, r in w.items()}
        nhp = 2 if headpack else 0
        if headpack:  # extra trailing inputs: raw torsions + whm_ext
            tor14_ref, wext_ref = w_then_out[len(_LOOP_W):len(_LOOP_W) + 2]
        outs = w_then_out[len(_LOOP_W) + nhp:]
        (dai_ref, dtor_ref, dqi_ref, dti_ref,
         daj_ref, dqj_ref, dtj_ref, dedge_ref) = outs[:8]
        dw_refs = dict(zip(_LOOP_W, outs[8:]))

        NP = aj_ref.shape[0]
        BNB = ai_ref.shape[-1]

        a_i = ai_ref[:]
        tor_node = tor_ref[:]
        q_i = qi_ref[:]
        t_i = ti_ref[:]
        s_mat = s_ref[:]
        j_mat = j_ref[:]          # [BNB, Bp] lane-collapse: J[n*Bp+b, b]=1
        m_fin = m_ref[:]          # [1, BNB] final running max (residual)
        g_gd = gd_ct_ref[:]       # cotangent of GD [4, BNB]
        g_ta = gta_ref[:]         # [7, BNB]
        g_tr = gtr_ref[:]         # [3, BNB]
        g_d = gdn_ref[:]          # [1, BNB]
        g_hid = ghid_ref[:]       # [Th, BNB] cotangent of the HID sum

        first_cell = pl.program_id(0) == 0

        if batch_grid:
            # batch-grid mode (grid cell = batch chunk, single residue
            # cell): daj/dqj/dtj blocks are PER-CHUNK (each visited once,
            # fresh buffer -> unconditional zero); dedge's block is
            # constant (revisited consecutively across every chunk), so
            # it accumulates like the weight grads, zeroed at cell 0
            daj_ref[:] = jnp.zeros(daj_ref.shape, F32)
            dqj_ref[:] = jnp.zeros(dqj_ref.shape, F32)
            dtj_ref[:] = jnp.zeros(dtj_ref.shape, F32)

            @pl.when(first_cell)
            def _():
                dedge_ref[:] = jnp.zeros(dedge_ref.shape, F32)
                for r in dw_refs.values():
                    r[:] = jnp.zeros(r.shape, F32)
        else:
            @pl.when(first_cell)
            def _():
                daj_ref[:] = jnp.zeros(daj_ref.shape, F32)
                dqj_ref[:] = jnp.zeros(dqj_ref.shape, F32)
                dtj_ref[:] = jnp.zeros(dtj_ref.shape, F32)
                for r in dw_refs.values():
                    r[:] = jnp.zeros(r.shape, F32)

        def expand(block):
            return pltpu.repeat(block, k, axis=1) if k > 1 else block

        def collapse(x):
            """[C, BNB] -> [C, Bp]: sum over the k query tiles (the
            transpose of ``expand``), as one lane-contraction matmul.
            j_mat is exact 0/1 (bf16-representable), so the fast modes
            run it like every other loop matmul instead of f32-HIGHEST's
            ~6 passes — only the cotangent operand rounds."""
            return _mm(x, j_mat)

        hp_ctx = ((wext_ref[:], tor14_ref[:], jnp.ones((1, BNB), F32))
                  if headpack else None)

        def one(np_i, carry):
            (dai, dtor_node, dqi, dti, dw) = carry
            r_ = _recompute_block(
                w, _mm, _mm0, expand, a_i, tor_node, q_i, t_i,
                aj_ref[np_i], qj_ref[np_i], tj_ref[np_i], edge_ref[np_i],
                mask_ref[np_i], s_mat, headpack_ctx=hp_ctx,
            )
            q_j, t_j = r_["q_j"], r_["t_j"]
            inv_qj, ld, v, u_q = r_["inv_qj"], r_["ld"], r_["v"], r_["u"]

            e = jnp.exp(r_["logit"] - m_fin)  # [1, BNB]

            # softmax-numerator cotangents -> per-neighbour value/logit
            ge = (jnp.sum(g_gd * r_["gdelta"], axis=0, keepdims=True)
                  + jnp.sum(g_ta * r_["mdelta"], axis=0, keepdims=True)
                  + jnp.sum(g_tr * r_["mr"], axis=0, keepdims=True)
                  + g_d)
            dlogit = e * ge                      # [1, BNB]
            dgdelta = e * g_gd                   # [4, BNB]
            dmdelta = e * g_ta                   # [7, BNB]
            dmr = e * g_tr                       # [3, BNB]

            # ---- translation value path --------------------------------
            dmtr = jnp.sum(dmr * (t_i - t_j), axis=0, keepdims=True)
            dti = dti + dmr * r_["mtr"]
            dtj_np = -dmr * r_["mtr"]

            # ---- rotation chain above the sigmoid ----------------------
            # gdelta = q_j (x) u, u = ld (x) inv_qj   (bilinear adjoints:
            # d a = g (x) conj(b), d b = conj(a) (x) g)
            dqj_q = _qmul_rows(dgdelta, _qconj(u_q))
            du = _qmul_rows(_qconj(q_j), dgdelta)
            dld = _qmul_rows(du, _qconj(inv_qj))
            dinv = _qmul_rows(_qconj(ld), du)
            dz = dld * ld * (1.0 - ld)

            # ---- fused head lin2 backward ------------------------------
            # d(out_all) rows at the 8-aligned head offsets; one dW2ALL
            # outer product, one bias rowsum, one d(pre_heads) matmul
            # gated by the shared relu mask
            BNB_ = dlogit.shape[-1]
            z_rows = lambda r: jnp.zeros((r, BNB_), F32)
            dout_all = jnp.concatenate(
                (dlogit, z_rows(7), dz, z_rows(4), dmdelta, z_rows(1),
                 dmtr, z_rows(7)), axis=0)       # [32, BNB]
            dw["w2all"] += _mmL(dout_all, r_["relu_heads"])
            dw["b2all"] += jnp.sum(dout_all, axis=1, keepdims=True)
            dpre_heads = jnp.where(
                r_["pre_heads"] > 0.0, _mm0(w["w2all"], dout_all), 0.0
            )                                     # [4T, BNB]
            T = w["whm"].shape[0] // 4
            datt_pre = dpre_heads[0:T]
            drot_pre = dpre_heads[T:2 * T]
            dtor_pre = dpre_heads[2 * T:3 * T]
            dtr_pre = dpre_heads[3 * T:]

            # ---- per-head pre-activation extras ------------------------
            dw["bl1"] += jnp.sum(dtr_pre, axis=1, keepdims=True)
            dw["bt1"] += jnp.sum(dtor_pre, axis=1, keepdims=True)
            dtor_node = dtor_node + dtor_pre
            dw["br1"] += jnp.sum(drot_pre, axis=1, keepdims=True)
            dlocal = _mm0(w["wrq"], drot_pre)    # [4, BNB]
            # local_q = inv_qj (x) v, v = q_i (x) q_j
            dinv = dinv + _qmul_rows(dlocal, _qconj(v))
            dv = _qmul_rows(_qconj(inv_qj), dlocal)
            dqi = dqi + _qmul_rows(dv, _qconj(q_j))
            dqj_q = dqj_q + _qmul_rows(_qconj(q_i), dv)
            # inv_qj = conj(q_j) / |q_j|^2
            dconj = dinv / r_["sq"]
            dqj_q = dqj_q + _qconj(dconj)
            # divide by sq TWICE rather than by sq**2: the padding guard
            # sq=1e-30 would underflow to 0 when squared in f32 (0/0=NaN)
            ds = -jnp.sum(dinv * _qconj(q_j) / r_["sq"], axis=0,
                          keepdims=True) / r_["sq"]
            dqj_q = dqj_q + 2.0 * q_j * ds

            dw["ba1"] += jnp.sum(datt_pre, axis=1, keepdims=True)
            dw["wad"] += jnp.sum(datt_pre * (-r_["d2"]), axis=1, keepdims=True)
            dw["waq"] += jnp.sum(datt_pre * jnp.square(r_["qdot"]), axis=1,
                                 keepdims=True)
            # fused heads backward: one dW outer product + one dhid matmul
            # (whm = wheads @ wm2 — the message lin2 backward is folded
            # in). dwrq's LHS (drot_pre) is the rot row-slice of
            # dpre_heads, so concatenating local_q onto the RHS merges
            # BOTH dW outer products into one MXU pass-set; the kept
            # blocks are bit-identical to the separate matmuls (each
            # output element is the same lane dot product).
            Th = w["whm"].shape[-1]
            dwhl = _mmL(dpre_heads,
                        jnp.concatenate((r_["hid_m"], r_["local_q"]),
                                        axis=0))
            dw["whm"] += dwhl[:, :Th]
            dw["wrq"] += dwhl[T:2 * T, Th:]
            dd2 = -jnp.sum(w["wad"] * datt_pre, axis=0, keepdims=True)
            dqdot = 2.0 * r_["qdot"] * jnp.sum(w["waq"] * datt_pre, axis=0,
                                               keepdims=True)
            dti = dti + 2.0 * dd2 * (t_i - t_j)
            dtj_np = dtj_np - 2.0 * dd2 * (t_i - t_j)
            dqi = dqi + dqdot * q_j
            dqj_q = dqj_q + dqdot * q_i

            # ---- message MLP (fused): d(hid) = whm^T @ d(heads) + the
            # HID-sum cotangent (constant across neighbours) -------------
            dhid_m = _mm0(w["whm"], dpre_heads) + g_hid
            dpre = jnp.where(r_["pre"] > 0.0, dhid_m, 0.0)
            dai = dai + dpre

            # neighbour-side outputs: collapse query tiles; daj/dqj/dtj
            # ACCUMULATE across grid cells (shared blocks, zeroed at the
            # first cell); dedge's block is cell-exclusive and each np is
            # visited once, so it's a plain write. In batch-grid mode the
            # roles flip: daj/dqj/dtj blocks are chunk-exclusive (zeroed
            # unconditionally above) and dedge's block is shared across
            # every chunk, so IT accumulates.
            daj_ref[np_i] = daj_ref[np_i] + collapse(dpre)
            dqj_ref[np_i] = dqj_ref[np_i] + collapse(dqj_q)
            dtj_ref[np_i] = dtj_ref[np_i] + collapse(dtj_np)
            # edge grad: transpose of edge_exp = edge^T S -> dE = S dpre^T
            # (s_mat is exact 0/1; _mmL keeps one MXU pass in bf16 mode)
            if batch_grid:
                dedge_ref[np_i] = dedge_ref[np_i] + _mmL(s_mat, dpre)
            else:
                dedge_ref[np_i] = _mmL(s_mat, dpre)  # [k, T]

            return (dai, dtor_node, dqi, dti, dw)

        Th = w["whm"].shape[-1]
        dw0 = {n: jnp.zeros(w[n].shape, F32) for n in _LOOP_W}
        init = (
            jnp.zeros((Th, BNB), F32),  # da_i [T, BNB]
            jnp.zeros((Th, BNB), F32),  # dtor_node [T, BNB]
            jnp.zeros((4, BNB), F32),
            jnp.zeros((3, BNB), F32),
            dw0,
        )
        u_ = unroll if NP % unroll == 0 else 1

        def body(step, carry):
            for j in range(u_):
                carry = one(step * u_ + j, carry)
            return carry

        dai, dtor_node, dqi, dti, dw = lax.fori_loop(0, NP // u_, body, init)
        dai_ref[:] = dai
        dtor_ref[:] = dtor_node
        dqi_ref[:] = dqi
        dti_ref[:] = dti
        for n in _LOOP_W:
            dw_refs[n][:] += dw[n]

    return kernel


# ---------------------------------------------------------------------------
# geom8 group loop kernels: 8 neighbours per iteration, quaternion algebra
# component-major ([32, BNB] full-occupancy tiles), MLPs lane-stacked
# [C, 8*BNB] j-major, dW matmuls and bias reductions batched 8x. Layout
# rationale: ops/egnn_pallas_lane_g8.py. Enabled via backend="g8".
# ---------------------------------------------------------------------------


def _conj_cm(q):
    return jnp.concatenate((q[0:8], -q[8:32]), axis=0)


def _g8_ctx(w, _mm, _mm0, k, BNB, sel,
            a_i8, tor_node8, q_i8, t_i8, qi_cm,
            aj_ref, qj_ref, tj_ref, qjg_cm_ref, edge_ref, mask_ref, s_mat,
            headpack_ctx=None):
    """Shared group recompute for the g8 fwd and bwd loop kernels.

    ``headpack_ctx``: ``(wext, tors8, ones8)`` — when given, pre_heads8
    is produced by the ONE extended-contraction matmul of the HEADPACK
    layout (ops/egnn_pallas_lane_g8.pack_headmm_ext: the rotation-head
    matmul, attention rank-1 terms, biases, and the torsion node term
    fold into contraction rows 64..84), instead of the separate
    heads8 matmul + wrq matmul + four-block concat. All residuals the
    backward consumes (pre8/hid_m8/local8/pre_heads8/...) are unchanged."""
    from pmhc_tpu.ops.egnn_pallas_lane_g8 import G as G8
    from pmhc_tpu.ops.egnn_pallas_lane_g8 import _qmul_cm

    p_sel, q_sel, rsq, t4, t4q, r4 = sel
    T = w["whm"].shape[0] // 4

    def rep(block):
        return pltpu.repeat(block, k, axis=1) if k > 1 else block

    def expand8(ref, g):
        return jnp.concatenate(
            [rep(ref[g * G8 + j]) for j in range(G8)], axis=1
        )

    def cm_to_lane(x_cm):
        return jnp.concatenate([_mm(p, x_cm) for p in p_sel], axis=1)

    def lane_to_cm(x_lane):
        out = _mm0(q_sel[0].T, x_lane[:, :BNB])
        for j in range(1, G8):
            out = out + _mm0(q_sel[j].T, x_lane[:, j * BNB:(j + 1) * BNB])
        return out

    def recompute(g):
        aj8 = expand8(aj_ref, g)
        edge8 = jnp.concatenate(
            [_mm0(edge_ref[g * G8 + j], s_mat) for j in range(G8)], axis=1
        )
        pre8 = a_i8 + aj8 + edge8
        hid_m8 = jnp.maximum(pre8, 0.0)

        q_j8 = expand8(qj_ref, g)
        t_j8 = expand8(tj_ref, g)
        mask8 = jnp.concatenate(
            [mask_ref[g * G8 + j] for j in range(G8)], axis=1
        )

        tdiff8 = t_i8 - t_j8
        d28 = jnp.sum(jnp.square(tdiff8), axis=0, keepdims=True)
        qdot8 = jnp.sum(q_i8 * q_j8, axis=0, keepdims=True)

        qj_cm = rep(qjg_cm_ref[g])
        # exact-zero guard as in _recompute_block: padded lanes carry
        # zero quats; 0/0 NaNs would poison lane reductions
        sq8 = jnp.maximum(_mm(rsq, jnp.square(qj_cm)), 1e-30)   # [8, BNB]
        sq_cm = _mm(t4, sq8)                                    # [32, BNB]
        inv_cm = _conj_cm(qj_cm) / sq_cm
        v_cm = _qmul_cm(qi_cm, qj_cm)
        local_cm = _qmul_cm(inv_cm, v_cm)
        local8 = cm_to_lane(local_cm)

        if headpack_ctx is not None:
            wext, tors8, ones8 = headpack_ctx
            ext8 = jnp.concatenate(
                (hid_m8, local8, -d28, jnp.square(qdot8), ones8, tors8),
                axis=0,
            )
            pre_heads8 = _mm(wext, ext8)                # [4T, BNB8]
        else:
            # message lin2 folded into the head lin1 (whm = wheads@wm2)
            heads8 = _mm(w["whm"], hid_m8)
            # fused head pre-activations + ONE block-diag lin2 (w2all)
            W8 = heads8.shape[-1]
            pre_heads8 = heads8 + jnp.concatenate(
                (
                    w["wad"] * (-d28) + w["waq"] * jnp.square(qdot8)
                    + w["ba1"],
                    _mm(w["wrq"], local8) + w["br1"],
                    tor_node8 + w["bt1"],
                    jnp.broadcast_to(w["bl1"], (T, W8)),
                ),
                axis=0,
            )
        relu_heads8 = jnp.maximum(pre_heads8, 0.0)
        out_all8 = _mm(w["w2all"], relu_heads8) + w["b2all"]  # [32, BNB8]
        logit8 = out_all8[0:1] - (1.0 - mask8) * INFINITY
        ld8 = jax.nn.sigmoid(out_all8[8:12])
        ld_cm = lane_to_cm(ld8)
        u_cm = _qmul_cm(ld_cm, inv_cm)
        gdelta_cm = _qmul_cm(qj_cm, u_cm)
        gdelta8 = cm_to_lane(gdelta_cm)
        mdelta8 = out_all8[16:23]
        mtr8 = out_all8[24:25]
        mr8 = mtr8 * tdiff8

        return dict(
            pre8=pre8, hid_m8=hid_m8, q_j8=q_j8, t_j8=t_j8,
            mask8=mask8, tdiff8=tdiff8, d28=d28, qdot8=qdot8,
            logit8=logit8,
            qj_cm=qj_cm, sq8=sq8, sq_cm=sq_cm, inv_cm=inv_cm, v_cm=v_cm,
            local_cm=local_cm, local8=local8,
            pre_heads8=pre_heads8, relu_heads8=relu_heads8,
            ld8=ld8, ld_cm=ld_cm, u_cm=u_cm,
            gdelta_cm=gdelta_cm, gdelta8=gdelta8,
            mdelta8=mdelta8, mtr8=mtr8, mr8=mr8,
        )

    return recompute, cm_to_lane, lane_to_cm


def _make_loop_fwd_g8(k: int, bf16: bool, unroll: int,
                      headpack: bool = False):
    from pmhc_tpu.ops.egnn_pallas_lane_g8 import (
        _lane8, _sel_matrices, _tree_lane,
    )

    _mm, _mm0, _mmL = _mm_maker(bf16)

    def kernel(ai_ref, tor_ref, qi_ref, ti_ref,
               aj_ref, qj_ref, tj_ref, qjg_cm_ref, edge_ref, mask_ref,
               s_ref, *w_then_out):
        w = dict(zip(_LOOP_W, w_then_out[: len(_LOOP_W)]))
        w = {n: r[:] for n, r in w.items()}
        nhp = 2 if headpack else 0
        if headpack:  # extra trailing inputs: raw torsions + whm_ext
            tor14_ref, wext_ref = w_then_out[len(_LOOP_W):len(_LOOP_W) + 2]
        (m_ref, d_ref, gd_ref, ta_ref, tr_ref, hid_ref, cnt_ref) = \
            w_then_out[len(_LOOP_W) + nhp:]
        NP = aj_ref.shape[0]
        NG = NP // 8
        Th = w["whm"].shape[-1]
        BNB = ai_ref.shape[-1]

        sel = _sel_matrices()
        t4q = sel[4]
        a_i8 = _lane8(ai_ref[:])
        tor_node8 = _lane8(tor_ref[:])
        q_i8 = _lane8(qi_ref[:])
        t_i8 = _lane8(ti_ref[:])
        qi_cm = _mm(t4q, qi_ref[:])
        s_mat = s_ref[:]
        hp_ctx = ((wext_ref[:], _lane8(tor14_ref[:]),
                   jnp.ones((1, 8 * BNB), F32)) if headpack else None)

        recompute, _, _ = _g8_ctx(
            w, _mm, _mm0, k, BNB, sel, a_i8, tor_node8, q_i8, t_i8, qi_cm,
            aj_ref, qj_ref, tj_ref, qjg_cm_ref, edge_ref, mask_ref, s_mat,
            headpack_ctx=hp_ctx,
        )

        def one(g, carry):
            m_run, acc_d, acc_gd, acc_ta, acc_tr, acc_hid, acc_cnt = carry
            r_ = recompute(g)
            gm = _tree_lane(r_["logit8"], BNB, jnp.maximum)
            m_new = jnp.maximum(m_run, gm)
            r = jnp.exp(m_run - m_new)
            m_new8 = m_new
            for _ in range(3):
                m_new8 = jnp.concatenate((m_new8, m_new8), axis=1)
            w8 = jnp.exp(r_["logit8"] - m_new8)
            add = jnp.add
            return (
                m_new,
                acc_d * r + _tree_lane(w8, BNB, add),
                acc_gd * r + _tree_lane(w8 * r_["gdelta8"], BNB, add),
                acc_ta * r + _tree_lane(w8 * r_["mdelta8"], BNB, add),
                acc_tr * r + _tree_lane(w8 * r_["mr8"], BNB, add),
                acc_hid + _tree_lane(r_["hid_m8"], BNB, add),
                acc_cnt + _tree_lane(r_["mask8"], BNB, add),
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
        u_ = unroll if NG % unroll == 0 else 1

        def body(step, carry):
            for j in range(u_):
                carry = one(step * u_ + j, carry)
            return carry

        m, d, gd, ta, tr, hid, cnt = lax.fori_loop(0, NG // u_, body, init)
        m_ref[:] = m
        d_ref[:] = d
        gd_ref[:] = gd
        ta_ref[:] = ta
        tr_ref[:] = tr
        hid_ref[:] = hid
        cnt_ref[:] = cnt

    return kernel


def _make_loop_bwd_g8(k: int, bf16: bool, unroll: int,
                      batch_grid: bool = False, headpack: bool = False):
    from pmhc_tpu.ops.egnn_pallas_lane_g8 import (
        G as G8, _lane8, _qmul_cm, _sel_matrices, _tree_lane,
    )

    _mm, _mm0, _mmL = _mm_maker(bf16)
    abl = ABLATE_STAGES  # timing-only stage ablation (see definition)

    def kernel(ai_ref, tor_ref, qi_ref, ti_ref,
               aj_ref, qj_ref, tj_ref, qjg_cm_ref, edge_ref, mask_ref,
               s_ref, j_ref,
               m_ref, gd_ct_ref, gta_ref, gtr_ref, gdn_ref, ghid_ref,
               *w_then_out):
        w = dict(zip(_LOOP_W, w_then_out[: len(_LOOP_W)]))
        w = {n: r[:] for n, r in w.items()}
        nhp = 2 if headpack else 0
        if headpack:  # extra trailing inputs: raw torsions + whm_ext
            tor14_ref, wext_ref = w_then_out[len(_LOOP_W):len(_LOOP_W) + 2]
        outs = w_then_out[len(_LOOP_W) + nhp:]
        (dai_ref, dtor_ref, dqi_ref, dti_ref,
         daj_ref, dqj_ref, dtj_ref, dedge_ref) = outs[:8]
        dw_refs = dict(zip(_LOOP_W, outs[8:]))

        NP = aj_ref.shape[0]
        NG = NP // G8
        BNB = ai_ref.shape[-1]

        sel = _sel_matrices()
        p_sel, q_sel, rsq, t4, t4q, r4 = sel
        a_i8 = _lane8(ai_ref[:])
        tor_node8 = _lane8(tor_ref[:])
        q_i8 = _lane8(qi_ref[:])
        t_i8 = _lane8(ti_ref[:])
        qi_cm = _mm(t4q, qi_ref[:])
        s_mat = s_ref[:]
        j_mat = j_ref[:]
        m_fin8 = _lane8(m_ref[:])
        g_gd8 = _lane8(gd_ct_ref[:])
        g_ta8 = _lane8(gta_ref[:])
        g_tr8 = _lane8(gtr_ref[:])
        g_d8 = _lane8(gdn_ref[:])
        g_hid8 = _lane8(ghid_ref[:])

        first_cell = pl.program_id(0) == 0

        if batch_grid:
            # see _make_loop_bwd: chunk-exclusive neighbour blocks are
            # zeroed unconditionally; dedge + weight grads accumulate
            # across chunks, zeroed at the first grid cell
            daj_ref[:] = jnp.zeros(daj_ref.shape, F32)
            dqj_ref[:] = jnp.zeros(dqj_ref.shape, F32)
            dtj_ref[:] = jnp.zeros(dtj_ref.shape, F32)

            @pl.when(first_cell)
            def _():
                dedge_ref[:] = jnp.zeros(dedge_ref.shape, F32)
                for rr in dw_refs.values():
                    rr[:] = jnp.zeros(rr.shape, F32)
        else:
            @pl.when(first_cell)
            def _():
                daj_ref[:] = jnp.zeros(daj_ref.shape, F32)
                dqj_ref[:] = jnp.zeros(dqj_ref.shape, F32)
                dtj_ref[:] = jnp.zeros(dtj_ref.shape, F32)
                for rr in dw_refs.values():
                    rr[:] = jnp.zeros(rr.shape, F32)

        hp_ctx = ((wext_ref[:], _lane8(tor14_ref[:]),
                   jnp.ones((1, 8 * BNB), F32)) if headpack else None)
        recompute, cm_to_lane, lane_to_cm = _g8_ctx(
            w, _mm, _mm0, k, BNB, sel, a_i8, tor_node8, q_i8, t_i8, qi_cm,
            aj_ref, qj_ref, tj_ref, qjg_cm_ref, edge_ref, mask_ref, s_mat,
            headpack_ctx=hp_ctx,
        )

        def collapse(x):
            """[C, BNB] -> [C, Bp] (see _make_loop_bwd.collapse)."""
            return _mm(x, j_mat)

        def rowsum(x):
            return jnp.sum(x, axis=1, keepdims=True)

        add = jnp.add

        def rowsum_rows(x):
            return jnp.sum(x, axis=0, keepdims=True)

        def one(g, carry):
            (dai, dtor_node, dqi, dti, dw) = carry
            r_ = recompute(g)

            e8 = jnp.exp(r_["logit8"] - m_fin8)           # [1, BNB8]
            ge8 = (jnp.sum(g_gd8 * r_["gdelta8"], axis=0, keepdims=True)
                   + jnp.sum(g_ta8 * r_["mdelta8"], axis=0, keepdims=True)
                   + jnp.sum(g_tr8 * r_["mr8"], axis=0, keepdims=True)
                   + g_d8)
            dlogit8 = e8 * ge8
            dgdelta8 = e8 * g_gd8
            dmdelta8 = e8 * g_ta8
            dmr8 = e8 * g_tr8

            # ---- translation value path --------------------------------
            dmtr8 = rowsum_rows(dmr8 * r_["tdiff8"])
            dti = dti + _tree_lane(dmr8 * r_["mtr8"], BNB, add)
            dtj8 = -(dmr8 * r_["mtr8"])

            # ---- rotation chain above the sigmoid (component-major) ----
            qj_cm, inv_cm, ld_cm = r_["qj_cm"], r_["inv_cm"], r_["ld_cm"]
            if "rotcm" in abl:  # timing ablation: wrong grads
                dz8 = dgdelta8
            else:
                dgd_cm = lane_to_cm(dgdelta8)
                dqj_cm = _qmul_cm(dgd_cm, _conj_cm(r_["u_cm"]))
                du_cm = _qmul_cm(_conj_cm(qj_cm), dgd_cm)
                dld_cm = _qmul_cm(du_cm, _conj_cm(inv_cm))
                dinv_cm = _qmul_cm(_conj_cm(ld_cm), du_cm)
                dz_cm = dld_cm * ld_cm * (1.0 - ld_cm)
                dz8 = cm_to_lane(dz_cm)

            # ---- fused head lin2 backward ------------------------------
            W8_ = dlogit8.shape[-1]
            z_rows = lambda r: jnp.zeros((r, W8_), F32)
            dout_all8 = jnp.concatenate(
                (dlogit8, z_rows(7), dz8, z_rows(4), dmdelta8, z_rows(1),
                 dmtr8, z_rows(7)), axis=0)      # [32, BNB8]
            if "dw" not in abl:
                dw["w2all"] += _mmL(dout_all8, r_["relu_heads8"])
                dw["b2all"] += rowsum(dout_all8)
            dpre_heads8 = jnp.where(
                r_["pre_heads8"] > 0.0,
                pltpu.repeat(dout_all8, 8, axis=0) if "head2mm" in abl
                else _mm0(w["w2all"], dout_all8), 0.0
            )                                     # [4T, BNB8]
            T = w["whm"].shape[0] // 4
            datt_pre8 = dpre_heads8[0:T]
            drot_pre8 = dpre_heads8[T:2 * T]
            dtor_pre8 = dpre_heads8[2 * T:3 * T]
            dtr_pre8 = dpre_heads8[3 * T:]

            # ---- per-head pre-activation extras ------------------------
            if "dw" not in abl:
                dw["bl1"] += rowsum(dtr_pre8)
                dw["bt1"] += rowsum(dtor_pre8)
            dtor_node = dtor_node + _tree_lane(dtor_pre8, BNB, add)
            if "dw" not in abl:
                dw["br1"] += rowsum(drot_pre8)
            if "rotcm" in abl:  # timing ablation: wrong grads
                dqj_cm = jnp.zeros((32, BNB), F32)
            else:
                dlocal8 = _mm0(w["wrq"], drot_pre8)
                dlocal_cm = lane_to_cm(dlocal8)
                dinv_cm = dinv_cm + _qmul_cm(dlocal_cm, _conj_cm(r_["v_cm"]))
                dv_cm = _qmul_cm(_conj_cm(inv_cm), dlocal_cm)
                dqi = dqi + _mm(r4, _qmul_cm(dv_cm, _conj_cm(qj_cm)))
                dqj_cm = dqj_cm + _qmul_cm(_conj_cm(qi_cm), dv_cm)
                dconj_cm = dinv_cm / r_["sq_cm"]
                dqj_cm = dqj_cm + _conj_cm(dconj_cm)
                # divide by sq twice (not sq**2): the 1e-30 guard would
                # underflow to 0 when squared in f32 (0/0 = NaN)
                ds8 = -_mm(rsq, dinv_cm * _conj_cm(qj_cm) / r_["sq_cm"]) \
                    / r_["sq8"]
                dqj_cm = dqj_cm + 2.0 * qj_cm * _mm(t4, ds8)

            if "dw" not in abl:
                dw["ba1"] += rowsum(datt_pre8)
                dw["wad"] += rowsum(datt_pre8 * (-r_["d28"]))
                dw["waq"] += rowsum(datt_pre8 * jnp.square(r_["qdot8"]))
                # dwrq's LHS (drot_pre8) is the rot row-slice of
                # dpre_heads8: concatenating local8 onto the RHS merges
                # the whm and wrq dW outer products into one MXU
                # pass-set (kept blocks bit-identical to the separate
                # matmuls — same lane dot products)
                Th_ = w["whm"].shape[-1]
                dwhl = _mmL(dpre_heads8,
                            jnp.concatenate((r_["hid_m8"], r_["local8"]),
                                            axis=0))
                dw["whm"] += dwhl[:, :Th_]
                dw["wrq"] += dwhl[T:2 * T, Th_:]
            # fused heads backward: d(hid) = whm^T @ d(heads) + the
            # HID-sum cotangent (constant across groups)
            dhid8 = g_hid8 + (dpre_heads8[0:w["whm"].shape[-1]]
                              if "headmm" in abl
                              else _mm0(w["whm"], dpre_heads8))
            dd28 = -jnp.sum(w["wad"] * datt_pre8, axis=0, keepdims=True)
            dqdot8 = 2.0 * r_["qdot8"] * jnp.sum(
                w["waq"] * datt_pre8, axis=0, keepdims=True)
            dti = dti + _tree_lane(2.0 * dd28 * r_["tdiff8"], BNB, add)
            dtj8 = dtj8 - 2.0 * dd28 * r_["tdiff8"]
            dqi = dqi + _tree_lane(dqdot8 * r_["q_j8"], BNB, add)
            dqj_cm = dqj_cm + lane_to_cm(dqdot8 * q_i8)

            # ---- message MLP (lin2 folded into whm above) ---------------
            dpre8 = jnp.where(r_["pre8"] > 0.0, dhid8, 0.0)
            dai = dai + _tree_lane(dpre8, BNB, add)

            # ---- neighbour-side outputs --------------------------------
            if "nbr" not in abl:
                dqj_coll = collapse(dqj_cm)               # [32, Bp]
                for j in range(G8):
                    sl_ = slice(j * BNB, (j + 1) * BNB)
                    np_i = g * G8 + j
                    daj_ref[np_i] = daj_ref[np_i] + collapse(dpre8[:, sl_])
                    dtj_ref[np_i] = dtj_ref[np_i] + collapse(dtj8[:, sl_])
                    dqj_ref[np_i] = dqj_ref[np_i] + _mm(p_sel[j], dqj_coll)
                    if batch_grid:
                        dedge_ref[np_i] = dedge_ref[np_i] \
                            + _mmL(s_mat, dpre8[:, sl_])
                    else:
                        dedge_ref[np_i] = _mmL(s_mat, dpre8[:, sl_])

            return (dai, dtor_node, dqi, dti, dw)

        dw0 = {n: jnp.zeros(w[n].shape, F32) for n in _LOOP_W}
        Th = w["whm"].shape[-1]
        init = (
            jnp.zeros((Th, BNB), F32),
            jnp.zeros((Th, BNB), F32),
            jnp.zeros((4, BNB), F32),
            jnp.zeros((3, BNB), F32),
            dw0,
        )
        u_ = unroll if NG % unroll == 0 else 1

        def body(step, carry):
            for j in range(u_):
                carry = one(step * u_ + j, carry)
            return carry

        dai, dtor_node, dqi, dti, dw = lax.fori_loop(0, NG // u_, body, init)
        dai_ref[:] = dai
        dtor_ref[:] = dtor_node
        dqi_ref[:] = dqi
        dti_ref[:] = dti
        for n in _LOOP_W:
            dw_refs[n][:] += dw[n]

    return kernel


# ---------------------------------------------------------------------------
# pallas_call plumbing + custom VJP over the neighbour loop
# ---------------------------------------------------------------------------


def _cell_geometry(B, N, lane_block):
    if N % 16 == 0 and 16 * B <= max(lane_block, 2048):
        k = 16
    elif N % 8 == 0:
        k = 8
    else:
        raise ValueError(f"peptide maxlen {N} must be a multiple of 8")
    sub = 128 // min(k, 128)
    Bp = -(-B // sub) * sub
    return k, Bp, k * Bp, N // k


@functools.lru_cache(maxsize=None)
def _loop_fn(k: int, Bp: int, NP: int, T: int, M: int,
             bf16: bool, unroll: int, interpret: bool, g8: bool = False,
             batch_grid: bool = False, headpack: bool = False):
    """Build the custom-VJP neighbour loop for one static geometry.

    ``g8``: use the geom8 group kernels (8 neighbours per iteration,
    component-major quaternion algebra) and take the extra component-
    major neighbour resident ``qjg_cm`` [NP/8, 32, Bp].

    ``batch_grid``: grid cells are BATCH CHUNKS of Bp entries (requires
    a single residue cell, k == N, chunk-major lane layouts — see
    egnn_pallas_lane.node_to_lane_bg). Neighbour residents and the
    backward's daj/dqj/dtj outputs carry a per-chunk last axis
    [NP, C, ncells*Bp]; the edge term and its gradient are shared across
    every chunk (dedge accumulates in-kernel, like the weight grads).
    This replaces the lax.map batch chunking with ONE pallas call whose
    grid Mosaic pipelines — no per-chunk dispatch, no XLA-side chunk
    stacking, weight grads summed in-kernel."""
    BNB = k * Bp

    lane = lambda c: pl.BlockSpec((c, BNB), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    if batch_grid:
        res3 = lambda c, w_: pl.BlockSpec((NP, c, w_), lambda i: (0, 0, i),
                                          memory_space=pltpu.VMEM)
        celledge = pl.BlockSpec((NP, k, T), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        res3 = lambda c, w_: pl.BlockSpec((NP, c, w_), lambda i: (0, 0, 0),
                                          memory_space=pltpu.VMEM)
        celledge = pl.BlockSpec((NP, k, T), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    cellmask = pl.BlockSpec((NP, 1, BNB), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    w_shapes = {
        "whm": (4 * T, T),   # fused wheads @ wm2 (msg lin2 folded in)
        "wad": (T, 1), "waq": (T, 1), "ba1": (T, 1),
        "w2all": (32, 4 * T), "b2all": (32, 1),
        "bl1": (T, 1), "wrq": (T, 4), "br1": (T, 1), "bt1": (T, 1),
    }

    cmgroups = pl.BlockSpec(
        (NP // 8, 32, Bp),
        (lambda i: (0, 0, i)) if batch_grid else (lambda i: (0, 0, 0)),
        memory_space=pltpu.VMEM)

    # headpack (both loop variants, g8 and lane — PMHC_G8_HEADPACK gates
    # every lane-family kernel despite the G8 in the name, kept for
    # round-4 compatibility): two extra inputs after the loop weights —
    # the raw torsions lane tensor and the extended head matrix
    hp_w = (4 * T, T + 21)

    def fwd_call(loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm, edge3,
                 mask3, s_mat, tor14, whm_ext):
        ncells = ai.shape[-1] // BNB
        in_specs = (
            [lane(T), lane(T), lane(4), lane(3),
             res3(T, Bp), res3(4, Bp), res3(3, Bp)]
            + ([cmgroups] if g8 else [])
            + [celledge, cellmask, const((k, BNB))]
            + [const(w_shapes[n]) for n in _LOOP_W]
            + ([lane(2 * N_TORSIONS), const(hp_w)] if headpack else [])
        )
        out_specs = tuple(lane(c) for c in (1, 1, 4, N_TORSIONS, 3, T, 1))
        out_shape = tuple(
            jax.ShapeDtypeStruct((c, ncells * BNB), F32)
            for c in (1, 1, 4, N_TORSIONS, 3, T, 1)
        )
        operands = (
            (ai, tor, qi, ti, aj3, qj3, tj3)
            + ((qjg_cm,) if g8 else ())
            + (edge3, mask3, s_mat)
        )
        hp_ops = (tor14, whm_ext) if headpack else ()
        return pl.pallas_call(
            (_make_loop_fwd_g8 if g8 else _make_loop_fwd)(
                k, bf16, unroll, headpack),
            grid=(ncells,),  # residue cells, or batch chunks (batch_grid)
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*operands, *[loop_w[n] for n in _LOOP_W], *hp_ops)

    def bwd_call(loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm, edge3,
                 mask3, s_mat, j_mat, m_fin, g_d, g_gd, g_ta, g_tr, g_hid,
                 tor14, whm_ext):
        ncells = ai.shape[-1] // BNB
        in_specs = (
            [lane(T), lane(T), lane(4), lane(3),
             res3(T, Bp), res3(4, Bp), res3(3, Bp)]
            + ([cmgroups] if g8 else [])
            + [celledge, cellmask,
               const((k, BNB)), const((BNB, Bp)),
               lane(1), lane(4), lane(N_TORSIONS), lane(3), lane(1), lane(T)]
            + [const(w_shapes[n]) for n in _LOOP_W]
            + ([lane(2 * N_TORSIONS), const(hp_w)] if headpack else [])
        )
        out_specs = (
            lane(T), lane(T), lane(4), lane(3),      # dai, dtor, dqi, dti
            res3(T, Bp), res3(4, Bp), res3(3, Bp),   # daj, dqj, dtj
            celledge,                                # dedge
        ) + tuple(const(w_shapes[n]) for n in _LOOP_W)
        # batch_grid: daj/dqj/dtj are per-chunk (last axis ncells*Bp);
        # dedge is one shared [NP, k, T] block accumulated across chunks
        nbw = ncells * Bp if batch_grid else Bp
        nek = k if batch_grid else ncells * k
        out_shape = (
            jax.ShapeDtypeStruct((T, ncells * BNB), F32),
            jax.ShapeDtypeStruct((T, ncells * BNB), F32),
            jax.ShapeDtypeStruct((4, ncells * BNB), F32),
            jax.ShapeDtypeStruct((3, ncells * BNB), F32),
            jax.ShapeDtypeStruct((NP, T, nbw), F32),
            jax.ShapeDtypeStruct((NP, 4, nbw), F32),
            jax.ShapeDtypeStruct((NP, 3, nbw), F32),
            jax.ShapeDtypeStruct((NP, nek, T), F32),
        ) + tuple(jax.ShapeDtypeStruct(w_shapes[n], F32) for n in _LOOP_W)
        operands = (
            (ai, tor, qi, ti, aj3, qj3, tj3)
            + ((qjg_cm,) if g8 else ())
            + (edge3, mask3, s_mat, j_mat,
               m_fin, g_gd, g_ta, g_tr, g_d, g_hid)
        )
        hp_ops = (tor14, whm_ext) if headpack else ()
        return pl.pallas_call(
            (_make_loop_bwd_g8 if g8 else _make_loop_bwd)(
                k, bf16, unroll, batch_grid, headpack),
            grid=(ncells,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*operands, *[loop_w[n] for n in _LOOP_W], *hp_ops)

    @jax.custom_vjp
    def loop(loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm, edge3, mask3,
             s_mat, j_mat, tor14, whm_ext):
        return fwd_call(loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm,
                        edge3, mask3, s_mat, tor14, whm_ext)

    def loop_fwd(loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm, edge3,
                 mask3, s_mat, j_mat, tor14, whm_ext):
        outs = fwd_call(loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm,
                        edge3, mask3, s_mat, tor14, whm_ext)
        m = outs[0]
        res = (loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm, edge3,
               mask3, s_mat, j_mat, m, tor14, whm_ext)
        return outs, res

    def loop_bwd(res, cts):
        (loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm, edge3, mask3,
         s_mat, j_mat, m, tor14, whm_ext) = res
        # cotangents for (m, D, GD, TA, TR, HID, CNT); m/CNT carry none
        # by construction of the finalize (ratios are shift-invariant and
        # CNT only gates a boolean)
        _, g_d, g_gd, g_ta, g_tr, g_hid, _ = cts
        outs = bwd_call(loop_w, ai, tor, qi, ti, aj3, qj3, tj3, qjg_cm,
                        edge3, mask3, s_mat, j_mat, m, g_d, g_gd, g_ta,
                        g_tr, g_hid, tor14, whm_ext)
        dai, dtor, dqi, dti, daj, dqj, dtj, dedge = outs[:8]
        dw = dict(zip(_LOOP_W, outs[8:]))
        # the g8 kernels read q_all through BOTH qj3 and qjg_cm; the
        # hand-written backward merges the full gradient into the dqj
        # output (routed via qj3), so qjg_cm's cotangent is zero.
        # tor14/whm_ext (headpack) also carry ZERO cotangent: the kernel's
        # dependence on them is mathematically identical to its dependence
        # through tor (= tors @ wtt) and the original loop weights, where
        # the full gradient is already declared — dtor accumulates
        # d(pre_heads rot/tor rows) and dw the per-weight outer products,
        # and the OUTER autodiff (tor_node = tors@wtt, whm_ext concat)
        # routes them onto the parameters exactly once.
        return (dw, dai, dtor, dqi, dti, daj, dqj, dtj,
                jnp.zeros_like(qjg_cm), dedge,
                jnp.zeros_like(mask3), jnp.zeros_like(s_mat),
                jnp.zeros_like(j_mat), jnp.zeros_like(tor14),
                jnp.zeros_like(whm_ext))

    loop.defvjp(loop_fwd, loop_bwd)
    return loop


def egnn_forward_pallas_lane_vjp(
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
    unroll: int = 4,
    g8: bool = False,
    chunk: int | None = None,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Differentiable drop-in for ``egnn_forward``: Pallas neighbour loop
    (fwd + hand-written bwd) between autodiffed XLA pre/post stages.

    ``g8``: geom8 group kernels — 8 neighbours per iteration, quaternion
    algebra component-major (ops/egnn_pallas_lane_g8.py). Group unroll is
    forced to 1 (the group IS the unroll).

    Large batches run the BATCH-GRID path when the per-chunk geometry is
    a single residue cell (k == N): the pallas grid tiles over batch
    chunks of ``chunk`` entries (chunk-major lane layouts), so Mosaic
    pipelines the chunks inside ONE kernel launch and the weight
    gradients sum in-kernel. The BACKWARD kernel keeps ~20 [T, k*B]
    temporaries live per cell, which is what bounds the chunk size
    (k=16 x B=1024 lanes would need ~330 MB of VMEM). Geometries with
    multiple residue cells fall back to ``lax.map`` over chunk-sized
    calls (per-chunk dispatch; autodiff sums the weight grads)."""
    B, N = peptide_mask.shape
    # 128 keeps the XLA fusion AROUND the pallas calls inside the 16 MB
    # scoped-vmem limit at f32 (256-batch chunks = 4096-lane carries
    # measured 19.15M scoped); the kernels themselves are VMEM-capped
    # separately via CompilerParams. g8 tiles are 8x wider, so it chunks
    # at 64 (BNB8 <= 8192 keeps the group backward under ~50 MB VMEM).
    if chunk is None:
        chunk = int(os.environ.get("PMHC_VJP_CHUNK", "0")) or None
    CHUNK = chunk if chunk is not None else (64 if g8 else 128)
    if g8:
        unroll = int(os.environ.get("PMHC_G8_UNROLL", "1"))
    # HEADPACK: one extended-contraction matmul produces the
    # per-group pre_heads in the loop kernels' recompute (see
    # egnn_pallas_lane_g8.pack_headmm_ext; measured +9.9% on the
    # forward-only kernel). PMHC_G8_HEADPACK=0 restores the
    # separate-stage recompute (the ablation budget tooling needs it).
    headpack = (not ABLATE_STAGES
                and bool(int(os.environ.get("PMHC_G8_HEADPACK", "1"))))
    batch_grid = False
    if B > CHUNK:
        # batch-grid needs a single residue cell per chunk AND a lane-
        # legal per-chunk width: the [*, C, nch*Bp] neighbour residents
        # are lane-blocked at Bp, which Mosaic requires divisible by 128
        # when the block doesn't span the whole axis (interpret mode has
        # no such constraint). g8's default chunk (64) therefore rises
        # to 128 for the grid path — measured FASTER than lax.map at 64
        # (76.4k vs 54.5k ex/s, B=1024 bf16).
        kc, Bpc, _, nc = _cell_geometry(CHUNK, N, lane_block)
        batch_grid = nc == 1 and (interpret or Bpc % 128 == 0)
        if g8 and chunk is None and not batch_grid and not interpret and bf16:
            # bf16 only: the 128-wide g8 backward grid cell fits VMEM at
            # 2-byte lanes; at f32 it needs ~165 MB (measured) > 128 MB,
            # so f32 keeps CHUNK=64 and the lax.map fallback.
            kc, Bpc, _, nc = _cell_geometry(128, N, lane_block)
            if nc == 1 and Bpc % 128 == 0 and B > 128:
                CHUNK, batch_grid = 128, True
        if os.environ.get("PMHC_VJP_NO_BG"):  # A/B: force legacy lax.map
            batch_grid = False
    if B > CHUNK and not batch_grid:
        pad = (-B) % CHUNK
        def padb(x):
            return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)) if pad else x

        stack = lambda x: padb(x).reshape((B + pad) // CHUNK, CHUNK, *x.shape[1:])
        chunked = (
            stack(peptide_frames.quats), stack(peptide_frames.trans),
            stack(peptide_torsions), stack(peptide_features),
            stack(peptide_mask), stack(pocket_features),
            stack(pocket_frames.quats), stack(pocket_frames.trans),
            stack(pocket_mask),
        )

        def one(chunk_slices):
            fq, ft, tors, feats, pm, pkf, pkq, pkt, pkm = chunk_slices
            fr, tr, hh = egnn_forward_pallas_lane_vjp(
                params, RigidArray(fq, ft), tors, feats, edge_pre, pm,
                pkf, RigidArray(pkq, pkt), pkm, lane_block=lane_block,
                interpret=interpret, bf16=bf16, unroll=unroll, g8=g8,
                chunk=chunk,
            )
            return fr.quats, fr.trans, tr, hh

        oq, ot, otr, ohh = lax.map(one, chunked)
        merge = lambda x: x.reshape(-1, *x.shape[2:])[:B]
        return (RigidArray(merge(oq), merge(ot)), merge(otr), merge(ohh))
    P = pocket_mask.shape[-1]
    NP = N + P
    H = peptide_features.shape[-1]
    T = params["message"]["lin1"]["b"].shape[0]
    M = params["message"]["lin2"]["b"].shape[0]

    # shared lane-layout helpers (egnn_pallas_lane.py) — the layouts MUST
    # stay in lockstep with the kernels, so there is one implementation
    from pmhc_tpu.ops.egnn_pallas_lane import (
        lane_j_mat, lane_msg_mask, lane_msg_mask_bg, lane_s_mat,
        lane_to_node, lane_to_node_bg, nbr_to_lane, nbr_to_lane_bg,
        node_to_lane, node_to_lane_bg,
    )

    if batch_grid:
        # per-chunk geometry, grid over nch batch chunks (chunk-major)
        k, Bp, BNB, _ = _cell_geometry(CHUNK, N, lane_block)
        nch = -(-B // CHUNK)
        node_t = lambda x: node_to_lane_bg(x, Bp, nch)
        node_back = lambda x: lane_to_node_bg(x, B, Bp, nch)
        nbr_t = lambda x: nbr_to_lane_bg(x, Bp, nch)
        mask3 = lane_msg_mask_bg(peptide_mask, pocket_mask, Bp, nch)
    else:
        k, Bp, BNB, ncells = _cell_geometry(B, N, lane_block)
        node_t = lambda x: node_to_lane(x, Bp)
        node_back = lambda x: lane_to_node(x, B, Bp)
        nbr_t = lambda x: nbr_to_lane(x, Bp)
        mask3 = lane_msg_mask(peptide_mask, pocket_mask, Bp)

    h_all = jnp.concatenate((peptide_features, pocket_features), axis=-2)
    q_all = jnp.concatenate((peptide_frames.quats, pocket_frames.quats), axis=-2)
    t_all = jnp.concatenate((peptide_frames.trans, pocket_frames.trans), axis=-2)

    w1m = jnp.asarray(params["message"]["lin1"]["w"], F32)
    b1m = jnp.asarray(params["message"]["lin1"]["b"], F32)
    w1t = jnp.asarray(params["torsion"]["lin1"]["w"], F32)

    # XLA pre-projections (autodiffed). Precision must match the in-kernel
    # _mm family for the mode: on real TPUs an UNQUALIFIED f32 matmul
    # (Precision.DEFAULT) lowers to a single bf16 MXU pass, which broke
    # f32 grad parity at scaled dims (~4e-1 relative 2^-8 roundoff; found
    # by tools/probe_scaled_parity.py on chip — CPU interpret tests can't
    # see it because CPU ignores precision and always computes full f32).
    prec_pre = (None if bf16 is True
                else lax.Precision.HIGH if bf16 == "high"
                else lax.Precision.HIGHEST)
    a_i = jnp.matmul(peptide_features, w1m[:H],
                     precision=prec_pre) + b1m           # [B, N, T]
    a_j = jnp.einsum("bph,ht->bpt", h_all, w1m[H:2 * H],
                     precision=lax.Precision.HIGHEST)
    tors_flat = peptide_torsions.reshape(B, N, N_TORSIONS * 2)
    tor_node = jnp.matmul(tors_flat, w1t[M:],
                          precision=prec_pre)            # [B, N, T]
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, P), (0, 0)))
    edge3 = jnp.transpose(edge_full, (1, 0, 2))          # [NP, N, T]

    s_mat = lane_s_mat(k, Bp)
    j_mat = lane_j_mat(k, Bp)

    from pmhc_tpu.ops.egnn_pallas_lane import pack_head_lin2

    w1a = jnp.asarray(params["attention"]["lin1"]["w"], F32)
    w1r = jnp.asarray(params["rotation"]["lin1"]["w"], F32)
    col = lambda w: jnp.asarray(w, F32).T
    bias = lambda b: jnp.asarray(b, F32).reshape(-1, 1)
    w2all, b2all = pack_head_lin2(params)
    # [att; rot; tor; transl] head lin1 rows over msg, fused, THEN the
    # message lin2 folded in (whm = wheads @ wm2, bhm = wheads @ bm2 —
    # msg is consumed only linearly; see pack_lane_weights). Every step
    # is differentiable jnp, so autodiff routes d(whm) back onto the
    # five underlying parameter tensors via the product rule.
    mmH = lambda a, b: jnp.matmul(a, b, precision=lax.Precision.HIGHEST)
    wheads = jnp.concatenate(
        (col(w1a[:M]), col(w1r[:M]), col(w1t[:M]),
         col(params["translation"]["lin1"]["w"])), axis=0)
    wm2c = col(params["message"]["lin2"]["w"])
    bm2c = bias(params["message"]["lin2"]["b"])
    bhm = mmH(wheads, bm2c)                      # [4T, 1]
    loop_w = {
        "whm": mmH(wheads, wm2c),
        "wad": w1a[M].reshape(-1, 1),
        "waq": w1a[M + 1].reshape(-1, 1),
        "ba1": bias(params["attention"]["lin1"]["b"]) + bhm[0:T],
        # fused head lin2 block (pack_head_lin2 is concat/pad-built, so
        # autodiff routes dW2ALL back onto the four (w, b) pairs)
        "w2all": w2all,
        "b2all": b2all,
        "bl1": bias(params["translation"]["lin1"]["b"]) + bhm[3 * T:4 * T],
        "wrq": col(w1r[M:]),
        "br1": bias(params["rotation"]["lin1"]["b"]) + bhm[T:2 * T],
        "bt1": bias(params["torsion"]["lin1"]["b"]) + bhm[2 * T:3 * T],
    }

    if g8:
        from pmhc_tpu.ops.egnn_pallas_lane_g8 import nbr_to_cm8

        if batch_grid:
            from pmhc_tpu.ops.egnn_pallas_lane import _chunk_stack

            qjg_cm = jax.vmap(lambda xc: nbr_to_cm8(xc, Bp))(
                _chunk_stack(q_all, Bp, nch))       # [nch, NG, 32, Bp]
            qjg_cm = jnp.transpose(qjg_cm, (1, 2, 0, 3)).reshape(
                NP // 8, 32, nch * Bp)
        else:
            qjg_cm = nbr_to_cm8(q_all, Bp)
    else:
        # dummy with a static shape so the custom_vjp signature is stable
        qjg_cm = jnp.zeros(
            (NP // 8, 32, (nch * Bp) if batch_grid else Bp), F32)

    if headpack:
        # the extended head matrix (pack_headmm_ext layout) built from
        # the SAME differentiable loop_w entries + wtt; it carries zero
        # cotangent through the loop (see loop_bwd), so autodiff never
        # double-counts — gradients flow via loop_w / tor_node only
        z = lambda r, c: jnp.zeros((r, c), F32)
        whm_ext = jnp.concatenate((
            loop_w["whm"],
            jnp.concatenate((z(T, 4), loop_w["wrq"], z(2 * T, 4)), axis=0),
            jnp.concatenate((loop_w["wad"], z(3 * T, 1)), axis=0),
            jnp.concatenate((loop_w["waq"], z(3 * T, 1)), axis=0),
            jnp.concatenate((loop_w["ba1"], loop_w["br1"], loop_w["bt1"],
                             jnp.broadcast_to(loop_w["bl1"], (T, 1))),
                            axis=0),
            jnp.concatenate((z(2 * T, 2 * N_TORSIONS), col(w1t[M:]),
                             z(T, 2 * N_TORSIONS)), axis=0),
        ), axis=1)
        tor14 = node_t(tors_flat)
    else:
        whm_ext = jnp.zeros((4 * T, T + 21), F32)
        tor14 = jnp.zeros(
            (2 * N_TORSIONS,) + (node_t(a_i).shape[-1],), F32)

    # keep the weight-prep matmuls (whm = wheads @ wm2, bhm) OUT of the
    # XLA fusion around the pallas call: at f32 HIGHEST their multi-pass
    # expansion pushed the call's operand fusion over the 16 MB
    # scoped-vmem limit (measured 19.71M at batch 64 — compile error)
    loop_w, whm_ext = lax.optimization_barrier((loop_w, whm_ext))
    loop = _loop_fn(k, Bp, NP, T, M, bf16, unroll, interpret, g8,
                    batch_grid, headpack)
    m, D, GD, TA, TR, HID, CNT = loop(
        loop_w, node_t(a_i), node_t(tor_node),
        node_t(peptide_frames.quats), node_t(peptide_frames.trans),
        nbr_t(a_j), nbr_t(q_all), nbr_t(t_all), qjg_cm, edge3, mask3,
        s_mat, j_mat, tor14, whm_ext,
    )
    # same scoped-vmem guard on the output side: keep the finalize's
    # msg_sum matmul (new consumer of HID) out of the fusion around the
    # pallas call (the g8 f32 chunked path OOM'd without this)
    m, D, GD, TA, TR, HID, CNT = lax.optimization_barrier(
        (m, D, GD, TA, TR, HID, CNT))

    # XLA finalize (autodiffed); back in [B, N, C] layout
    D_b = node_back(D)            # [B, N, 1]
    inv_d = 1.0 / D_b
    # the loop accumulates Σ relu(pre); the (linear) message lin2 applies
    # ONCE here: Σmsg = Σhid @ wm2 + NP·bm2 (plain all-neighbour sum —
    # reference model.py:151 quirk). Autodiff through this line supplies
    # the loop's HID cotangent and wm2/bm2's gradients.
    prec_fin = (None if bf16 is True
                else lax.Precision.HIGH if bf16 == "high"
                else lax.Precision.HIGHEST)
    msg_sum = jnp.matmul(
        node_back(HID), jnp.asarray(params["message"]["lin2"]["w"], F32),
        precision=prec_fin,
    ) + float(NP) * jnp.asarray(params["message"]["lin2"]["b"], F32)
    gd = node_back(GD) * inv_d
    has_nb = node_back(CNT)[..., 0] > 0.0
    identity_q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=gd.dtype)
    gd = jnp.where(has_nb[..., None], gd, identity_q)
    gd = torch_normalize(gd)
    upd_q = quat_multiply(gd, peptide_frames.quats)

    fp = params["feature"]
    from pmhc_tpu.models import nn as _nn

    prec = (None if bf16 is True
            else lax.Precision.HIGH if bf16 == "high"
            else lax.Precision.HIGHEST)
    feat_pre = (
        _nn.linear_block(fp["lin1"], peptide_features, 0, H, prec)
        + _nn.linear_block(fp["lin1"], msg_sum, H, M, prec)
        + fp["lin1"]["b"]
    )
    node_out = _nn.mlp_hidden(fp, feat_pre, precision=prec)

    delta_a = node_back(TA) * inv_d
    delta_t = jnp.stack((jnp.sin(delta_a), jnp.cos(delta_a)), axis=-1)
    upd_torsions = multiply_sin_cos(delta_t, peptide_torsions)

    upd_x = peptide_frames.trans + node_back(TR) * inv_d
    return RigidArray(torch_normalize(upd_q), upd_x), upd_torsions, node_out
