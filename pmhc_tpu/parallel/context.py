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

``egnn_forward_ring`` is the streaming variant for when it does: the big
neighbour-side tensors stay RESIDENT on their device; the (small) query
slices travel the ring with ``lax.ppermute`` carrying their online-softmax
state — running max, denominator, and the three softmax numerators
(rotation / torsion / translation) plus the plain message sum — rescaled
flash-style at every hop. After ``axis_size`` hops each query slice has
visited every neighbour block and is back home; outputs come out sharded
on the query (peptide) axis. Per-device live memory is O(resident
neighbour block + one query slice), and every hop's ppermute rides ICI
concurrently with the next block's compute.

Both variants run INSIDE shard_map and equal the dense layer
``pmhc_tpu.models.egnn.egnn_forward`` to float32 tolerance
(tests/unit/test_context_parallel.py, 8-virtual-device CPU mesh).
"""

from __future__ import annotations

from typing import Tuple

import jax
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


def _block_terms(params, q_i, t_i, h_i, flat_torsions, q_j, t_j, h_j,
                 edge_blk, mask, precision):
    """Per-(query-slice, neighbour-block) tensors shared by both CP
    variants: masked attention logits plus the three per-edge value
    tensors the softmax weights (global rotation deltas, torsion deltas,
    translation terms) and the raw message block.

    Shapes: q_i/t_i/h_i/flat_torsions are the query slice [B, Nq, *];
    q_j/t_j/h_j the neighbour block [B, NPs, *]; edge_blk [Nq, NPs, T];
    mask [B, Nq, NPs]. Returns (logits, message, global_delta, m_delta_a,
    mr) with a leading [B, Nq, NPs] layout.
    """
    H = h_i.shape[-1]
    M = params["translation"]["lin1"]["w"].shape[0]

    mp = params["message"]
    a_i = nn.linear_block(mp["lin1"], h_i, 0, H, precision)
    a_j = nn.linear_block(mp["lin1"], h_j, H, H, precision)
    pre = a_i[:, :, None, :] + a_j[:, None, :, :] + edge_blk[None] + mp["lin1"]["b"]
    message = nn.mlp_hidden(mp, pre, precision=precision)

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
    logits = logits - (1.0 - mask) * INFINITY  # [B, Nq, NPs]

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

    tp = params["torsion"]
    tor_pre = (
        nn.linear_block(tp["lin1"], message, 0, M, precision)
        + nn.linear_block(tp["lin1"], flat_torsions, M, N_TORSIONS * 2, precision)[:, :, None, :]
        + tp["lin1"]["b"]
    )
    m_delta_a = nn.mlp_hidden(tp, tor_pre, precision=precision)

    lp = params["translation"]
    m = nn.mlp_apply(lp, message, precision=precision)  # [B, Nq, NPs, 1]
    mr = m * (t_i[:, :, None, :] - t_j[:, None, :, :])

    return logits, message, global_delta, m_delta_a, mr


def _finalize(params, h_i, torsions, q_i, t_i, msg_sum, gd, delta_a, tr,
              has_nb, precision):
    """Turn the softmax-weighted sums into the layer outputs (feature MLP,
    quaternion compose, torsion compose, translation add) — identical for
    both CP variants and the dense layer."""
    H = h_i.shape[-1]
    fp = params["feature"]
    M = msg_sum.shape[-1]
    feat_pre = (
        nn.linear_block(fp["lin1"], h_i, 0, H, precision)
        + nn.linear_block(fp["lin1"], msg_sum, H, M, precision)
        + fp["lin1"]["b"]
    )
    node_out = nn.mlp_hidden(fp, feat_pre, precision=precision)

    identity_q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=gd.dtype)
    gd = jnp.where(has_nb[..., None], gd, identity_q)
    gd = torch_normalize(gd)
    upd_q = quat_multiply(gd, q_i)

    delta_t = jnp.stack((jnp.sin(delta_a), jnp.cos(delta_a)), axis=-1)
    upd_torsions = multiply_sin_cos(delta_t, torsions)

    upd_x = t_i + tr
    return RigidArray(torch_normalize(upd_q), upd_x), upd_torsions, node_out


def egnn_layer_cp(
    params: nn.Params,
    peptide_frames: RigidArray,  # [B, N] (replicated over the cp axis)
    peptide_torsions: jnp.ndarray,  # [B, N, 7, 2]
    peptide_features: jnp.ndarray,  # [B, N, H]
    edge_pre: jnp.ndarray,  # [N, N, TRANSITION] (peptide-pair edge term)
    peptide_mask: jnp.ndarray,  # [B, N]
    pocket_features: jnp.ndarray,  # [B, P, H]
    pocket_frames: RigidArray,  # [B, P]
    pocket_mask: jnp.ndarray,  # [B, P]
    axis_name: str = "context",
    ring: bool = False,
    precision=nn.DEFAULT_PRECISION,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Drop-in CP twin of the dense layer ``egnn_forward`` — same signature
    (plus ``axis_name``/``ring``), same outputs, but the neighbour axis is
    computed SHARDED over ``axis_name``. Must run inside ``shard_map`` (or
    any context binding ``axis_name``); inputs arrive replicated across the
    cp axis and each device slices its own neighbour block locally, so no
    resharding collectives are needed on entry.

    ``ring=False``: two-pass distributed softmax (``egnn_forward_cp``) —
    queries replicated, one pmax + psums over the axis.
    ``ring=True``: ``egnn_forward_ring`` — queries sharded over the axis
    and hopping via ppermute with online-softmax state; outputs are
    all-gathered back to full N. Requires N % axis_size == 0.
    """
    B, N = peptide_mask.shape
    Pk = pocket_mask.shape[-1]
    NP = N + Pk
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if NP % n:
        raise ValueError(f"neighbour axis {NP} not divisible by cp={n}")

    mask = peptide_mask.astype(jnp.float32)
    pocket_m = pocket_mask.astype(jnp.float32)

    # dense-global neighbour tensors (identical on every cp member), then
    # a local dynamic slice — the "fully resident" CP layout
    h_all = jnp.concatenate((peptide_features, pocket_features), axis=-2)
    q_all = jnp.concatenate((peptide_frames.quats, pocket_frames.quats), axis=-2)
    t_all = jnp.concatenate((peptide_frames.trans, pocket_frames.trans), axis=-2)
    not_self = 1.0 - jnp.eye(N, dtype=jnp.float32)
    msg_mask = jnp.concatenate(
        (
            mask[:, :, None] * mask[:, None, :] * not_self,
            mask[:, :, None] * pocket_m[:, None, :],
        ),
        axis=-1,
    )  # [B, N, NP]
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, Pk), (0, 0)))  # [N, NP, T]

    NPs = NP // n
    start = idx * NPs
    sl = lambda x, ax: lax.dynamic_slice_in_dim(x, start, NPs, axis=ax)
    nbr_frames = RigidArray(sl(q_all, 1), sl(t_all, 1))
    nbr_h = sl(h_all, 1)
    e_shard = sl(edge_full, 1)
    m_shard = sl(msg_mask, 2)

    if not ring:
        return egnn_forward_cp(
            params, peptide_frames, peptide_torsions, peptide_features,
            e_shard, m_shard, nbr_h, nbr_frames, axis_name, precision,
        )

    if N % n:
        raise ValueError(f"query axis {N} not divisible by cp={n} (ring)")
    Ns = N // n
    qstart = idx * Ns
    qs = lambda x: lax.dynamic_slice_in_dim(x, qstart, Ns, axis=1)
    frames_s = RigidArray(qs(peptide_frames.quats), qs(peptide_frames.trans))
    out_f, out_t, out_h = egnn_forward_ring(
        params, frames_s, qs(peptide_torsions), qs(peptide_features),
        e_shard, m_shard, nbr_h, nbr_frames, axis_name, precision,
    )

    def gat(x):
        # gather-by-psum of disjoint blocks: numerically an all_gather,
        # but the result is typed INVARIANT over the cp axis (all_gather
        # output stays vma-varying), so downstream replicated outputs
        # type-check and the transpose (grads of replicated params)
        # inserts exactly the right psum
        full = jnp.zeros(x.shape[:1] + (N,) + x.shape[2:], x.dtype)
        full = lax.dynamic_update_slice_in_dim(full, x, qstart, axis=1)
        return lax.psum(full, axis_name)

    return RigidArray(gat(out_f.quats), gat(out_f.trans)), gat(out_t), gat(out_h)


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

    q_i, t_i = peptide_frames.quats, peptide_frames.trans
    mask = message_mask_shard.astype(jnp.float32)
    flat_torsions = peptide_torsions.reshape(B, N, N_TORSIONS * 2)

    logits, message, global_delta, m_delta_a, mr = _block_terms(
        params, q_i, t_i, peptide_features, flat_torsions,
        neighbour_frames.quats, neighbour_frames.trans, neighbour_features,
        edge_pre_shard, mask, precision,
    )

    # 2-pass distributed softmax over the sharded neighbour axis. The max
    # subtraction is numerical stabilization only (cancels exactly in the
    # softmax), so its gradient is zero — stop_gradient both makes that
    # explicit and sidesteps pmax's missing differentiation rule.
    g_max = lax.pmax(
        lax.stop_gradient(jnp.max(logits, axis=-1)), axis_name
    )  # [B, N]
    expw = jnp.exp(logits - g_max[..., None])  # [B, N, NPs]
    denom = lax.psum(jnp.sum(expw, axis=-1), axis_name)  # [B, N]

    def wsum(values):
        """psum of Sum_j expw * values_j, normalized -> softmax-weighted sum.
        values: [B, N, NPs, C]."""
        local = jnp.sum(expw[..., None] * values, axis=-2)
        return lax.psum(local, axis_name) / denom[..., None]

    # message summed over ALL neighbours, masked included (reference quirk)
    msg_sum = lax.psum(jnp.sum(message, axis=-2), axis_name)
    has_nb = lax.psum(jnp.sum(mask, axis=-1), axis_name) > 0.0

    return _finalize(
        params, peptide_features, peptide_torsions, q_i, t_i, msg_sum,
        wsum(global_delta), wsum(m_delta_a), wsum(mr), has_nb, precision,
    )


def egnn_forward_ring(
    params: nn.Params,
    peptide_frames_shard: RigidArray,  # [B, Ns] query slice (sharded on N)
    peptide_torsions_shard: jnp.ndarray,  # [B, Ns, 7, 2] (sharded on N)
    peptide_features_shard: jnp.ndarray,  # [B, Ns, H] (sharded on N)
    edge_pre_shard: jnp.ndarray,  # [N, NPs, T] (full N, resident NP cols)
    message_mask_shard: jnp.ndarray,  # [B, N, NPs] (full N, resident NP cols)
    neighbour_features: jnp.ndarray,  # [B, NPs, H] resident
    neighbour_frames: RigidArray,  # [B, NPs] resident
    axis_name: str,
    precision=nn.DEFAULT_PRECISION,
) -> Tuple[RigidArray, jnp.ndarray, jnp.ndarray]:
    """Ring context parallelism: the neighbour block never moves; the
    query slice hops the ring with its online-softmax state.

    At hop s, device d processes the query slice that ORIGINATED at device
    (d - s) mod n against its resident neighbour block, folds the block
    into the running (max, denominator, numerators) with the flash-style
    rescale, and ppermutes the slice + state to device d+1. After n hops
    every slice has seen every block and sits back on its home device, so
    outputs are sharded on the query axis. Memory: one [B, Ns, NPs, M]
    message block live per hop, never the [B, N, NP, M] dense tensor.
    """
    B, Ns = peptide_features_shard.shape[:2]
    n = lax.axis_size(axis_name)  # static
    me = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]

    q0, t0 = peptide_frames_shard.quats, peptide_frames_shard.trans
    tor0 = peptide_torsions_shard.reshape(B, Ns, N_TORSIONS * 2)
    M = params["translation"]["lin1"]["w"].shape[0]
    mask_full = message_mask_shard.astype(jnp.float32)

    q_j, t_j = neighbour_frames.quats, neighbour_frames.trans

    # the constant accumulator inits are device-invariant, but the loop
    # carry is axis-varying over EVERY mesh axis the inputs vary on (the
    # cp axis, plus e.g. 'data' when the batch is DP-sharded around this
    # layer); pcast marks every carry leaf varying on that union up front
    # so the fori_loop carry types are fixed-point
    ref_vma = set()
    for arr in (q0, t0, tor0, peptide_features_shard, q_j, t_j,
                neighbour_features, mask_full, edge_pre_shard):
        ref_vma |= set(jax.typeof(arr).vma)
    ref_vma |= {axis_name}

    def to_vma(x):
        missing = tuple(a for a in ref_vma if a not in jax.typeof(x).vma)
        return lax.pcast(x, missing, to="varying") if missing else x

    state = jax.tree_util.tree_map(
        to_vma,
        {
            # the travelling query slice (returns home after n hops)
            "q": q0, "t": t0, "h": peptide_features_shard, "tor": tor0,
            "m": jnp.full((B, Ns), -INFINITY, jnp.float32),
            "d": jnp.zeros((B, Ns), jnp.float32),
            "gd": jnp.zeros((B, Ns, 4), jnp.float32),
            "ta": jnp.zeros((B, Ns, N_TORSIONS), jnp.float32),
            "tr": jnp.zeros((B, Ns, 3), jnp.float32),
            "msg": jnp.zeros((B, Ns, M), jnp.float32),
            "cnt": jnp.zeros((B, Ns), jnp.float32),
        },
    )

    def hop(s, state):
        # global row offset of the visiting slice: it originated at device
        # (me - s) mod n, so its rows are that device's N-shard
        origin = jnp.mod(me - s, n)
        e_blk = lax.dynamic_slice_in_dim(edge_pre_shard, origin * Ns, Ns, axis=0)
        mask = lax.dynamic_slice_in_dim(mask_full, origin * Ns, Ns, axis=1)

        logits, message, global_delta, m_delta_a, mr = _block_terms(
            params, state["q"], state["t"], state["h"], state["tor"],
            q_j, t_j, neighbour_features, e_blk, mask, precision,
        )

        # flash-style online rescale
        new_m = jnp.maximum(state["m"], jnp.max(logits, axis=-1))
        r = jnp.exp(state["m"] - new_m)  # [B, Ns]
        lexp = jnp.exp(logits - new_m[..., None])  # [B, Ns, NPs]

        def fold(acc, values):
            return acc * r[..., None] + jnp.sum(lexp[..., None] * values, axis=-2)

        state = dict(
            state,
            m=new_m,
            d=state["d"] * r + jnp.sum(lexp, axis=-1),
            gd=fold(state["gd"], global_delta),
            ta=fold(state["ta"], m_delta_a),
            tr=fold(state["tr"], mr),
            msg=state["msg"] + jnp.sum(message, axis=-2),  # plain sum: no softmax
            cnt=state["cnt"] + jnp.sum(mask, axis=-1),
        )
        return jax.tree_util.tree_map(
            lambda x: lax.ppermute(x, axis_name, perm), state
        )

    state = lax.fori_loop(0, n, hop, state)

    inv_d = 1.0 / state["d"][..., None]
    return _finalize(
        params, state["h"],
        state["tor"].reshape(B, Ns, N_TORSIONS, 2),
        state["q"], state["t"], state["msg"],
        state["gd"] * inv_d, state["ta"] * inv_d,
        state["tr"] * inv_d, state["cnt"] > 0.0, precision,
    )
