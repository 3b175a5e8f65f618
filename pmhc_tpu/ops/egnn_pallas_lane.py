"""Lane-packed fused EGNN layer — the round-2 Pallas redesign.

Round 1's fused kernel (``egnn_pallas.py``) kept the FEATURE axis on the
lane dimension; every feature width in this model is <= 64, so each vector
register ran at <= half occupancy ([R, 1] tensors at 1/128), and the batch
grid serialized into many small launches. Measured result: XLA won 2.3-3.8x
at every configuration (docs/status.md "Measured design decisions").

This kernel flips the layout exactly as that analysis prescribed:

- **(residue, batch) pairs live on LANES**, n-major: lane = n * B + b.
  Every activation is stored transposed ``[C, N*B]`` — fully packed
  whenever N*B is a multiple of 128 (16384 lanes at the reference batch
  64). Per-edge scalars (attention logits, translation weights) are
  ``[1, lanes]`` — 128/128 lanes instead of 1/128.
- **Features live on SUBLANES** (T = M = 64 -> 8 f32 vregs), and every
  MLP matmul becomes ``W^T [out, in] @ X [in, lanes]`` — the big operand
  is lane-dense on the MXU.
- **The neighbour axis is a sequential loop with an online softmax**
  (flash-style running max / denominator / numerators): the [BN, NP, M]
  message tensor never exists, even in VMEM — per step only [C, BNB]
  tiles are live.
- **Neighbour-side tensors are expanded IN KERNEL, not streamed.** The
  n-major ordering makes the query-residue expansion a lane TILE: a cell
  covers k consecutive n values x all B batches, so a_j/q_j/t_j blocks
  ([*, B], resident — 25 MB at batch 1024) expand with ``pltpu.repeat``
  and the n-dependent edge term expands with a tiny one-hot matmul
  ``edge[T, k] @ S[k, k*B]``. Nothing O(R)-sized ever touches HBM (the
  first version of this kernel streamed a precomputed [NP, T, BN]
  pre-activation — 402 MB/layer at batch 1024, see git history).

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

# Fused head-lin2 layout: the four per-neighbour head lin2 matmuls
# (attention [1,T], rotation [4,T], torsion [7,T], translation [1,T])
# run as ONE block-diagonal matmul W2ALL [32, 4T] over the relu'd
# [4T, lanes] head pre-activations (the same trick as the fused lin1
# "wheads" block, one level down). Each head's rows sit at an 8-aligned
# offset so the kernel's output row-slices are sublane-tile aligned:
#   rows  0:1  attention logit   (cols 0:T)
#   rows  8:12 rotation sigmoid  (cols T:2T)
#   rows 16:23 torsion delta     (cols 2T:3T)
#   rows 24:25 translation mtr   (cols 3T:4T)
# Off-diagonal blocks are exact zeros, so the fused product equals the
# four separate matmuls (adding 0.0 terms is exact in every MXU mode).
HEAD_SECT = 8
HEAD_OUT = {"att": (0, 1), "rot": (8, 4), "tor": (16, 7), "transl": (24, 1)}


def pack_head_lin2(params) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack the four head lin2 (w, b) pairs into (W2ALL [32, 4T],
    B2ALL [32, 1]). Built from concats of the param tensors and zeros,
    so autodiff routes a dW2ALL cotangent back onto the four underlying
    parameter blocks (the structural-zero blocks' grads are dropped)."""
    col = lambda w: jnp.asarray(w, F32).T
    bias = lambda b: jnp.asarray(b, F32).reshape(-1, 1)
    heads = (
        ("att", col(params["attention"]["lin2"]["w"]),
         bias(params["attention"]["lin2"]["b"])),
        ("rot", col(params["rotation"]["lin2"]["w"]),
         bias(params["rotation"]["lin2"]["b"])),
        ("tor", col(params["torsion"]["lin2"]["w"]),
         bias(params["torsion"]["lin2"]["b"])),
        ("transl", col(params["translation"]["lin2"]["w"]),
         bias(params["translation"]["lin2"]["b"])),
    )
    T = heads[0][1].shape[-1]
    wrows, brows = [], []
    for i, (name, w2, b2) in enumerate(heads):
        _, rows = HEAD_OUT[name]
        w_row = jnp.concatenate(
            (jnp.zeros((rows, i * T), F32), w2,
             jnp.zeros((rows, (3 - i) * T), F32)), axis=1)
        wrows.append(jnp.concatenate(
            (w_row, jnp.zeros((HEAD_SECT - rows, 4 * T), F32)), axis=0))
        brows.append(jnp.concatenate(
            (b2, jnp.zeros((HEAD_SECT - rows, 1), F32)), axis=0))
    return jnp.concatenate(wrows, axis=0), jnp.concatenate(brows, axis=0)


def mm_maker(bf16):
    """The kernel matmul family for one precision mode.

    ``bf16`` is False (f32, precision=HIGHEST — ~6 MXU passes, the
    parity-exact default), True (bf16 MXU inputs + f32 accumulation, the
    --bf16 mode), or "high" (the --fast-f32 mode). Mosaic only lowers
    DEFAULT/HIGHEST dot precisions, so "high" EMULATES the 3-pass f32
    of lax.Precision.HIGH in-kernel: both operands split into bf16
    hi/lo halves (hi = bf16(a), lo = bf16(a - f32(hi)), ~16 mantissa
    bits combined) and the product computed as hi@hi + hi@lo + lo@hi —
    three one-pass MXU dots with f32 accumulation, ~1.5e-5 relative
    error (the dropped lo@lo term is O(2^-16) relative), vs HIGHEST's
    ~6 passes. Returns (_mm, _mm0, _mmL): contract dim1 x dim0 /
    dim0 x dim0 / dim1 x dim1 (lanes)."""
    if bf16 == "high":
        BF16 = jnp.bfloat16

        def _split(a):
            hi = a.astype(BF16)
            return hi, (a - hi.astype(F32)).astype(BF16)

        def _make(dims):
            def f(a, b):
                ah, al = _split(a)
                bh, bl = _split(b)
                # bf16 operands: DEFAULT is the (only) exact single pass
                d = lambda x, y: lax.dot_general(
                    x, y, (dims, ((), ())), preferred_element_type=F32,
                    precision=lax.Precision.DEFAULT)
                return d(ah, bh) + d(ah, bl) + d(al, bh)
            return f

        _mm = _make(((1,), (0,)))
        _mm0 = _make(((0,), (0,)))
        _mmL = _make(((1,), (1,)))
    elif bf16 is True:
        def pair(a, b):
            return a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)

        # bf16 operands: DEFAULT is the (only) exact single MXU pass
        def _mm(a, b):
            return lax.dot_general(
                *pair(a, b), (((1,), (0,)), ((), ())),
                preferred_element_type=F32,
                precision=lax.Precision.DEFAULT)

        def _mm0(a, b):
            return lax.dot_general(
                *pair(a, b), (((0,), (0,)), ((), ())),
                preferred_element_type=F32,
                precision=lax.Precision.DEFAULT)

        def _mmL(a, b):
            return lax.dot_general(
                *pair(a, b), (((1,), (1,)), ((), ())),
                preferred_element_type=F32,
                precision=lax.Precision.DEFAULT)
    else:
        prec = lax.Precision.HIGHEST

        def _mm(a, b):
            return lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), preferred_element_type=F32,
                precision=prec)

        def _mm0(a, b):
            return lax.dot_general(
                a, b, (((0,), (0,)), ((), ())), preferred_element_type=F32,
                precision=prec)

        def _mmL(a, b):
            return lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=F32,
                precision=prec)
    return _mm, _mm0, _mmL


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


def _make_kernel(k: int, bf16=False, unroll: int = 4,
                 headpack: bool = False):
    """Kernel for cells of k consecutive query residues x all batches.

    ``bf16``: True runs the MLP matmuls with bf16 MXU inputs and f32
    accumulation (the same trade as the XLA path's --bf16 mode: one MXU
    pass instead of the ~6 of precision=HIGHEST); the string "high"
    selects the in-kernel 3-pass f32 emulation (bf16 hi/lo split dots,
    ~1.5e-5 relative error — the --fast-f32 mode; see mm_maker).
    Geometry (quaternion algebra, distances, softmax, sin/cos
    composition) stays f32 in every mode, with one exception: when
    HEADPACK is on (the default) the head PRE-activations' rank-1
    geometry columns (-d2, qdot^2, local_q rows) and the head biases
    enter the fused head matmul as matmul operands, so in bf16 mode
    they round to bf16 there (previously exact f32 VPU adds). The
    downstream geometry composition itself is still f32; sampled-
    quality equivalence for bf16 is backed by the round-3 26-run
    study (docs/parity.md) plus the headpack-on bf16 goldens."""

    _mm, _mm0, _ = mm_maker(bf16)

    def _kernel(
        # per-node blocks (lane dim = cell's k*Bp lanes, n-major)
        h_ref,        # [H, BNB]
        qi_ref,       # [4, BNB]
        ti_ref,       # [3, BNB]
        tors_ref,     # [14, BNB] (sin0 cos0 sin1 cos1 ...)
        sin_ref,      # [7, BNB]
        cos_ref,      # [7, BNB]
        # resident neighbour-side tensors (constant index maps)
        aj_ref,       # [NP, T, Bp]  a_j = h_all @ Wm[H:2H]
        qj_ref,       # [NP, 4, Bp]
        tj_ref,       # [NP, 3, Bp]
        edge_ref,     # [NP, k, T]   this cell's n rows of the edge term
        mask_ref,     # [NP, 1, BNB] this cell's message-mask rows
        s_ref,        # [k, BNB]     one-hot n expansion: S[j, n*Bp+b]=(n==j)
        # weights (transposed, constant across grid)
        wmi_ref,      # [T, H]   message W1 rows for h_i
        bm1_ref,      # [T, 1]
        whm_ref,      # [4T, T]  fused head lin1 over relu(pre): wheads@wm2
        wad_ref, waq_ref, ba1_ref,  # [T, 1], [T, 1], [T, 1] (bhm folded)
        w2all_ref, b2all_ref,       # [32, 4T], [32, 1] fused head lin2
        wfh_ref, wfm2_ref, bf1_ref,  # [T, H], [T_f, T] (wfm@wm2), [T, 1]
        wf2_ref, bf2_ref,          # [O, T], [O, 1]
        bl1_ref,                    # [T, 1]
        wrq_ref, br1_ref,           # [T, 4], [T, 1]
        wtt_ref, bt1_ref,           # [T, 14], [T, 1]
        # outputs
        out_q_ref,    # [4, BNB]
        out_t_ref,    # [3, BNB]
        out_sin_ref,  # [7, BNB]
        out_cos_ref,  # [7, BNB]
        out_feat_ref,  # [O, BNB]
    ):
        NP = aj_ref.shape[0]
        Th = wfm2_ref.shape[-1]  # message hidden width (relu(pre) rows)
        BNB = h_ref.shape[-1]

        h = h_ref[:]
        q_i = qi_ref[:]
        t_i = ti_ref[:]
        s_mat = s_ref[:]

        # per-node terms, computed once per cell
        a_i = _mm(wmi_ref[:], h) + bm1_ref[:]    # [T, BNB]
        if headpack:
            # HEADPACK (see egnn_pallas_lane_g8.pack_headmm_ext): whm_ref
            # holds the extended [4T, Th+21] matrix; the raw torsion rows
            # and a ones row join the per-neighbour ext operand
            tors_rows = tors_ref[:]              # [14, BNB]
            ones_row = jnp.ones((1, BNB), F32)
            tor_node = None
        else:
            tor_node = _mm(wtt_ref[:], tors_ref[:])  # [T, BNB]

        def expand(block):
            """[C, Bp] neighbour block -> [C, BNB]: the same block for
            every query residue in the cell (lane tile)."""
            return pltpu.repeat(block, k, axis=1) if k > 1 else block

        def one_neighbour(np_i, carry):
            m_run, acc_d, acc_gd, acc_ta, acc_tr, acc_hid, acc_cnt = carry

            # the n-dependent edge term expands with a one-hot matmul:
            # edge block [k, T] x S [k, BNB], contracting the k rows
            # (dim0 x dim0 — the MXU-native lhsT orientation). S is exact
            # 0/1, so bf16 mode runs it as one MXU pass like the MLPs.
            edge_exp = _mm0(edge_ref[np_i], s_mat)  # [T, BNB]
            pre = a_i + expand(aj_ref[np_i]) + edge_exp
            hid = jnp.maximum(pre, 0.0)            # [Th, BNB]

            q_j = expand(qj_ref[np_i])             # [4, BNB]
            t_j = expand(tj_ref[np_i])             # [3, BNB]
            mask = mask_ref[np_i]                  # [1, BNB]

            d2 = jnp.sum(jnp.square(t_i - t_j), axis=0, keepdims=True)  # [1, BNB]
            qdot = jnp.sum(q_i * q_j, axis=0, keepdims=True)
            qdot2 = jnp.square(qdot)

            T = whm_ref.shape[0] // 4

            # rotation geometry (feeds the rot section's extra term)
            conj_qj = jnp.concatenate((q_j[0:1], -q_j[1:]), axis=0)
            # zero-guard like the vjp/g8 twins: padded lanes (Bp > B) carry
            # all-zero quats and would produce 0/0 NaNs that persist in the
            # lane-layout scan carry and trip jax_debug_nans
            inv_qj = conj_qj / jnp.maximum(
                jnp.sum(q_j * q_j, axis=0, keepdims=True), 1e-30
            )
            local_q = _qmul_rows(inv_qj, _qmul_rows(q_i, q_j))  # [4, BNB]

            if headpack:
                # ONE extended-contraction matmul produces pre_heads
                # (pack_headmm_ext layout; the rot K=4 matmul, attention
                # rank-1 terms, biases and torsion term ride the same
                # MXU pass — contraction 85 <= 128)
                ext = jnp.concatenate(
                    (hid, local_q, -d2, qdot2, ones_row, tors_rows),
                    axis=0,
                )
                pre_heads = _mm(whm_ref[:], ext)  # [4T, BNB]
            else:
                # message lin2 folded into the head lin1 (whm =
                # wheads @ wm2): one matmul from relu(pre) to the heads
                heads = _mm(whm_ref[:], hid)  # [4T, BNB]
                # the four heads' pre-activations as ONE [4T, BNB]
                # tensor, one relu, one fused block-diag lin2 (W2ALL)
                pre_heads = heads + jnp.concatenate(
                    (
                        wad_ref[:] * (-d2) + waq_ref[:] * qdot2
                        + ba1_ref[:],
                        _mm(wrq_ref[:], local_q) + br1_ref[:],
                        tor_node + bt1_ref[:],
                        jnp.broadcast_to(bl1_ref[:], (T, BNB)),
                    ),
                    axis=0,
                )
            out_all = _mm(w2all_ref[:], jnp.maximum(pre_heads, 0.0)) \
                + b2all_ref[:]                          # [32, BNB]
            logits = out_all[0:1] - (1.0 - mask) * INFINITY  # [1, BNB]
            # sigmoid output used UNNORMALIZED (reference quirk, model.py:291-292)
            local_delta = jax.nn.sigmoid(out_all[8:12])      # [4, BNB]
            gdelta = _qmul_rows(q_j, _qmul_rows(local_delta, inv_qj))
            mdelta = out_all[16:23]                          # [7, BNB]
            mtr = out_all[24:25]                             # [1, BNB]
            mr = mtr * (t_i - t_j)                           # [3, BNB]

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
                # plain sum over ALL neighbours (masked incl.); msg's lin2
                # is linear, so Σmsg = wm2 @ Σhid + NP·bm2 — folded into
                # wfm2/bf1' at pack time
                acc_hid + hid,
                acc_cnt + mask,
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
        # manual partial unroll: each neighbour's op chain (pre -> msg ->
        # heads) is data-dependent, but different neighbours are
        # independent except for the cheap accumulator folds — inlining
        # `unroll` neighbours per loop step lets Mosaic interleave their
        # chains and hide the small-matmul MXU latency (Pallas's
        # fori_loop only lowers unroll=1 or full)
        u = unroll if NP % unroll == 0 else 1

        def body(step, carry):
            for j in range(u):
                carry = one_neighbour(step * u + j, carry)
            return carry

        _, acc_d, acc_gd, acc_ta, acc_tr, acc_hid, acc_cnt = lax.fori_loop(
            0, NP // u, body, init
        )

        inv_d = 1.0 / acc_d  # [1, BNB]

        # feature update (message PLAIN sum, reference model.py:151):
        # wfm @ Σmsg = (wfm@wm2) @ Σhid + NP·wfm@bm2 = wfm2 @ acc_hid + bf1'
        feat_pre = _mm(wfh_ref[:], h) + _mm(wfm2_ref[:], acc_hid) + bf1_ref[:]
        out_feat_ref[:] = _mm(wf2_ref[:], jnp.maximum(feat_pre, 0.0)) + bf2_ref[:]

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

    return _kernel


def lane_geometry(B: int, N: int, lane_block: int = 1024) -> Tuple[int, int]:
    """Cell geometry (k, Bp): k consecutive query residues x the full
    (padded) batch per grid cell. k is 8 or 16 (Mosaic sublane-dim blocks
    must be multiples of 8 — the edge-term BlockSpec slices k rows); Bp
    pads the batch so k*Bp lane blocks stay 128-aligned."""
    if N % 16 == 0 and 16 * B <= max(lane_block, 2048):
        k = 16
    elif N % 8 == 0:
        k = 8
    else:
        raise ValueError(f"peptide maxlen {N} must be a multiple of 8")
    sub = 128 // min(k, 128)
    Bp = -(-B // sub) * sub  # pad batch so k*Bp is a multiple of 128
    return k, Bp


def pack_lane_weights(params, H: int, NP: int) -> list:
    """Transpose/reshape one layer's params into the kernel's weight list
    (the order matches ``_make_kernel``'s weight refs).

    Message-MLP LINEAR FUSION: ``msg = wm2 @ relu(pre) + bm2`` is consumed
    only LINEARLY — by the fused head lin1 block (``heads = wheads @ msg``)
    and by the plain all-neighbour sum feeding the feature MLP
    (``wfm @ Σmsg``; reference model.py:151 — no activation on msg). So the
    per-neighbour message lin2 matmul folds into the weights at pack time:

        whm  = wheads @ wm2   [4T, T]   heads = whm @ relu(pre)
        wfm2 = wfm @ wm2      [T_f, T]  feature term = wfm2 @ Σrelu(pre)
        bhm  = wheads @ bm2   [4T, 1]   folded into the 4 head lin1 biases
        bf1' = bf1 + NP·(wfm @ bm2)     (Σ over all NP neighbour slots,
                                         masked included — the reference's
                                         plain-sum quirk makes this exact)

    One MXU matmul per neighbour disappears from the loop (measured 8% of
    the forward kernel, tools/bench_fwd_stages.py round-3 budget). The
    products reassociate float rounding (~1e-6 rel at these dims) — inside
    every golden/parity tolerance. ``NP`` = N + P (the static padded
    neighbour count the loop iterates)."""
    p = params
    w1m = jnp.asarray(p["message"]["lin1"]["w"], F32)  # [2H+E, T]
    M = p["message"]["lin2"]["b"].shape[0]
    col = lambda w: jnp.asarray(w, F32).T  # [in, out] -> [out, in]
    bias = lambda b: jnp.asarray(b, F32).reshape(-1, 1)
    w1a = jnp.asarray(p["attention"]["lin1"]["w"], F32)  # [M+2, T]
    w1f = jnp.asarray(p["feature"]["lin1"]["w"], F32)    # [H+M, T]
    w1r = jnp.asarray(p["rotation"]["lin1"]["w"], F32)   # [M+4, T]
    w1t = jnp.asarray(p["torsion"]["lin1"]["w"], F32)    # [M+14, T]
    w2all, b2all = pack_head_lin2(p)
    T = w1m.shape[-1]
    mmH = lambda a, b: jnp.matmul(a, b, precision=lax.Precision.HIGHEST)
    # fused [att; rot; tor; transl] head lin1 rows over msg
    wheads = jnp.concatenate((col(w1a[:M]), col(w1r[:M]), col(w1t[:M]),
                              col(p["translation"]["lin1"]["w"])), axis=0)
    wm2c = col(p["message"]["lin2"]["w"])                 # [M, T]
    bm2c = bias(p["message"]["lin2"]["b"])                # [M, 1]
    whm = mmH(wheads, wm2c)                               # [4T, T]
    bhm = mmH(wheads, bm2c)                               # [4T, 1]
    wfm = col(w1f[H:])                                    # [T_f, M]
    wfm2 = mmH(wfm, wm2c)                                 # [T_f, T]
    bf1p = bias(p["feature"]["lin1"]["b"]) + float(NP) * mmH(wfm, bm2c)
    return [
        col(w1m[:H]),                                     # wmi [T, H]
        bias(p["message"]["lin1"]["b"]),
        whm,                          # fused head lin1 over relu(pre)
        w1a[M].reshape(-1, 1), w1a[M + 1].reshape(-1, 1),
        bias(p["attention"]["lin1"]["b"]) + bhm[0:T],
        w2all, b2all,                 # fused head lin2 block [32, 4T]
        col(w1f[:H]), wfm2, bf1p,
        col(p["feature"]["lin2"]["w"]), bias(p["feature"]["lin2"]["b"]),
        bias(p["translation"]["lin1"]["b"]) + bhm[3 * T:4 * T],
        col(w1r[M:]),
        bias(p["rotation"]["lin1"]["b"]) + bhm[T:2 * T],
        col(w1t[M:]),
        bias(p["torsion"]["lin1"]["b"]) + bhm[2 * T:3 * T],
    ]


def egnn_lane_core(
    weights: list,
    h: jnp.ndarray,        # [H, N*Bp] lane layout (n-major lanes)
    qi: jnp.ndarray,       # [4, N*Bp]
    ti: jnp.ndarray,       # [3, N*Bp]
    tors14: jnp.ndarray,   # [14, N*Bp] interleaved (sin0 cos0 sin1 ...)
    sin: jnp.ndarray,      # [7, N*Bp]
    cos: jnp.ndarray,      # [7, N*Bp]
    aj3: jnp.ndarray,      # [NP, T, Bp] resident neighbour a_j
    qj3: jnp.ndarray,      # [NP, 4, Bp]
    tj3: jnp.ndarray,      # [NP, 3, Bp]
    edge3: jnp.ndarray,    # [NP, N, T]
    mask_t: jnp.ndarray,   # [NP, 1, N*Bp]
    s_mat: jnp.ndarray,    # [k, k*Bp]
    *,
    k: int,
    Bp: int,
    O: int,
    interpret: bool = False,
    bf16: bool = False,
    unroll: int = 4,
    headpack: bool | None = None,
):
    """The fused-layer pallas_call on ALREADY lane-transposed operands.

    Returns lane-layout outputs (q, t, sin, cos, feat) — the building
    block the lane-layout sampler scans over without ever leaving the
    lane layout (pmhc_tpu/diffusion/sampler_lane.py)."""
    if headpack is None:
        import os

        headpack = bool(int(os.environ.get("PMHC_G8_HEADPACK", "1")))
    if headpack:
        from pmhc_tpu.ops.egnn_pallas_lane_g8 import pack_headmm_ext

        weights = list(weights)
        weights[2] = pack_headmm_ext(weights)  # whm slot -> whm_ext
    NP = aj3.shape[0]
    T = weights[0].shape[0]
    H = h.shape[0]
    BNB = k * Bp
    N = h.shape[-1] // Bp
    grid = (N // k,)

    lane = lambda c: pl.BlockSpec((c, BNB), lambda i: (0, i), memory_space=pltpu.VMEM)
    res = lambda c, w: pl.BlockSpec(
        (NP, c, w), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    cell3 = lambda c, w: pl.BlockSpec(
        (NP, c, w), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    in_specs = [
        lane(H), lane(4), lane(3), lane(2 * N_TORSIONS),
        lane(N_TORSIONS), lane(N_TORSIONS),
        res(T, Bp), res(4, Bp), res(3, Bp),
        # edge3 [NP, N, T]: this cell's k query-residue ROWS (middle dim)
        pl.BlockSpec((NP, k, T), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        cell3(1, BNB),  # mask rows for this cell
        const((k, BNB)),
    ] + [const(w.shape) for w in weights]
    out_specs = (lane(4), lane(3), lane(N_TORSIONS), lane(N_TORSIONS), lane(O))
    out_shape = tuple(
        jax.ShapeDtypeStruct((c, N * Bp), F32)
        for c in (4, 3, N_TORSIONS, N_TORSIONS, O)
    )

    return pl.pallas_call(
        _make_kernel(k, bf16, unroll, headpack),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(h, qi, ti, tors14, sin, cos, aj3, qj3, tj3, edge3, mask_t, s_mat,
      *weights)


def node_to_lane(x: jnp.ndarray, Bp: int) -> jnp.ndarray:
    """[B, N, C] -> [C, N*Bp] (lane = n * Bp + b, n-major)."""
    B, N = x.shape[0], x.shape[1]
    x = x.reshape(B, N, -1)
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
    return jnp.transpose(x, (2, 1, 0)).reshape(-1, N * Bp)


def lane_to_node(x: jnp.ndarray, B: int, Bp: int) -> jnp.ndarray:
    """[C, N*Bp] -> [B, N, C]."""
    return jnp.transpose(x.reshape(-1, x.shape[-1] // Bp, Bp), (2, 1, 0))[:B]


def nbr_to_lane(x: jnp.ndarray, Bp: int) -> jnp.ndarray:
    """[B, NP, C] -> [NP, C, Bp] (resident neighbour layout)."""
    B = x.shape[0]
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)))
    return jnp.transpose(x, (1, 2, 0))


def lane_msg_mask(peptide_mask, pocket_mask, Bp: int) -> jnp.ndarray:
    """Message mask in kernel layout [NP, 1, N*Bp]: peptide->peptide
    excludes self (reference model.py:113-120), peptide->pocket dense."""
    B, N = peptide_mask.shape
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
    NP = msg_mask.shape[-1]
    if Bp != B:
        msg_mask = jnp.pad(msg_mask, ((0, Bp - B), (0, 0), (0, 0)))
    return jnp.transpose(msg_mask, (2, 1, 0)).reshape(NP, 1, N * Bp)


def lane_s_mat(k: int, Bp: int) -> jnp.ndarray:
    """One-hot n-expansion matrix: S[j, n*Bp + b] = (n == j)."""
    return (
        jax.lax.broadcasted_iota(jnp.int32, (k, k * Bp), 1) // Bp
        == jax.lax.broadcasted_iota(jnp.int32, (k, k * Bp), 0)
    ).astype(F32)


def lane_j_mat(k: int, Bp: int) -> jnp.ndarray:
    """Lane-collapse matrix (the transpose of ``lane_s_mat``'s
    expansion): J[n*Bp + b, b'] = (b == b')."""
    BNB = k * Bp
    return (
        jax.lax.broadcasted_iota(jnp.int32, (BNB, Bp), 0) % Bp
        == jax.lax.broadcasted_iota(jnp.int32, (BNB, Bp), 1)
    ).astype(F32)


def lane_edge3(edge_pre: jnp.ndarray, P: int) -> jnp.ndarray:
    """Edge term (zero toward the pocket): [N, N, T] -> [NP, N, T]
    (query residues on the SUBLANE dim so per-cell k-row blocks are
    legal)."""
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, P), (0, 0)))
    return jnp.transpose(edge_full, (1, 0, 2))


# ---------------------------------------------------------------------------
# Chunk-major (batch-grid) layouts: large batches tile the kernel GRID
# over batch chunks of Cb entries instead of lax.map-ing CHUNK-sized
# pallas calls. Requires the per-chunk geometry to be a single residue
# cell (k == N). Lane order: chunk-major, lane = bc*(N*Cb) + n*Cb + b.
# ---------------------------------------------------------------------------


def _chunk_stack(x: jnp.ndarray, Cb: int, nch: int) -> jnp.ndarray:
    """[B, ...] -> [nch, Cb, ...] (zero-padded final chunk)."""
    pad = nch * Cb - x.shape[0]
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x.reshape(nch, Cb, *x.shape[1:])


def node_to_lane_bg(x: jnp.ndarray, Cb: int, nch: int) -> jnp.ndarray:
    """[B, N, C] -> [C, nch*N*Cb], per-chunk ``node_to_lane`` layouts
    concatenated along lanes (chunk-major)."""
    y = _chunk_stack(x.reshape(*x.shape[:2], -1), Cb, nch)  # [nch, Cb, N, C]
    N = y.shape[2]
    return jnp.transpose(y, (3, 0, 2, 1)).reshape(-1, nch * N * Cb)


def lane_to_node_bg(x: jnp.ndarray, B: int, Cb: int, nch: int) -> jnp.ndarray:
    """[C, nch*N*Cb] -> [B, N, C] (inverse of ``node_to_lane_bg``)."""
    C = x.shape[0]
    y = x.reshape(C, nch, -1, Cb)
    return jnp.transpose(y, (1, 3, 2, 0)).reshape(nch * Cb, -1, C)[:B]


def nbr_to_lane_bg(x: jnp.ndarray, Cb: int, nch: int) -> jnp.ndarray:
    """[B, NP, C] -> [NP, C, nch*Cb] resident layout, chunk-major on the
    last axis (block bc = lanes [bc*Cb, (bc+1)*Cb))."""
    y = _chunk_stack(x, Cb, nch)                    # [nch, Cb, NP, C]
    NP, C = y.shape[2], y.shape[3]
    return jnp.transpose(y, (2, 3, 0, 1)).reshape(NP, C, nch * Cb)


def lane_msg_mask_bg(peptide_mask, pocket_mask, Cb: int, nch: int):
    """``lane_msg_mask`` in the chunk-major layout [NP, 1, nch*N*Cb]."""
    B, N = peptide_mask.shape
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
    NP = msg_mask.shape[-1]
    y = _chunk_stack(msg_mask, Cb, nch)             # [nch, Cb, N, NP]
    return jnp.transpose(y, (3, 0, 2, 1)).reshape(NP, 1, nch * N * Cb)


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
    bf16: bool = False,
    unroll: int = 4,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for ``egnn_forward`` (lane-packed).

    ``bf16``: MLP matmuls run with bf16 MXU inputs + f32 accumulation
    (geometry stays f32) — the kernel twin of the XLA path's --bf16."""
    B, N = peptide_mask.shape
    P = pocket_mask.shape[-1]
    H = peptide_features.shape[-1]
    M = params["message"]["lin2"]["b"].shape[0]
    O = params["feature"]["lin2"]["b"].shape[0]

    k, Bp = lane_geometry(B, N, lane_block)
    mask_t = lane_msg_mask(peptide_mask, pocket_mask, Bp)

    # resident neighbour-side tensors, [NP, C, Bp] (batch on lanes)
    h_all = jnp.concatenate((peptide_features, pocket_features), axis=-2)
    q_all = jnp.concatenate((peptide_frames.quats, pocket_frames.quats), axis=-2)
    t_all = jnp.concatenate((peptide_frames.trans, pocket_frames.trans), axis=-2)

    w1m = jnp.asarray(params["message"]["lin1"]["w"], F32)  # [2H+E, T]
    # a_j = h_all @ W1[H:2H] -> [B, NP, T] -> [NP, T, Bp]
    a_j = jnp.einsum(
        "bph,ht->bpt", h_all, w1m[H:2 * H], precision=lax.Precision.HIGHEST,
    )
    weights = pack_lane_weights(params, H, N + P)
    tors_flat = peptide_torsions.reshape(B, N, N_TORSIONS * 2)

    out_q, out_t, out_sin, out_cos, out_feat = egnn_lane_core(
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
        lane_edge3(edge_pre, P),
        mask_t,
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


# ---------------------------------------------------------------------------
# Trainable wrapper: Pallas forward, XLA-autodiff backward (same remat
# pattern as egnn_pallas.py — the two forwards agree to f32 tolerance, so
# the gradients are consistent).
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.lru_cache(maxsize=None)
def _trainable(lane_block: int, interpret: bool, bf16: bool):
    from pmhc_tpu.models.egnn import egnn_forward as _xla_forward

    @jax.custom_vjp
    def fused(params, frames, torsions, feats, edge_pre, mask, pk_feats,
              pk_frames, pk_mask):
        return egnn_forward_pallas_lane(
            params, frames, torsions, feats, edge_pre, mask, pk_feats,
            pk_frames, pk_mask, lane_block=lane_block, interpret=interpret,
            bf16=bf16,
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
    bf16: bool = False,
):
    """Differentiable fused layer: Pallas forward, XLA-remat backward."""
    return _trainable(lane_block, interpret, bf16)(
        params, frames, torsions, feats, edge_pre, mask, pk_feats,
        pk_frames, pk_mask,
    )
