"""Reverse-diffusion sampler that never leaves the kernel's lane layout.

The generic ``sampler.sample`` with ``backend="pallas_lane"`` re-enters
the fused kernel through its [B, N, C] public API every step, paying XLA
layout transposes around each of the 2T pallas_calls (~0.1 ms/step at
bf16, docs/status.md round-3 roadmap #1). Here the whole scan carry
(quats, translations, torsion sin/cos) lives in the kernel's native lane
layout ``[C, N*Bp]`` (lane = n*Bp + b, n-major):

- the static context — pocket neighbour tensors, edge terms, message
  masks, packed weights, the peptide part of the layer-1 neighbour
  pre-activation — is transposed ONCE before the scan;
- per step, the only layout work is the cheap sublane-dim reshape of the
  carried peptide state into the resident neighbour view
  ``[C, N*Bp] -> [N, C, Bp]`` and the layer-2 neighbour projection of
  the dynamic inner features;
- ``remove_noise`` and the per-step stochastic noise generation run
  directly on lane arrays (component axis LEADING) — exact ports of the
  [..., C]-trailing versions in ``noise.py`` / ``geometry/`` (reference
  ``diffusion/optimizer.py:140-193``, ``tools/angle.py:33-186``).

Semantics match ``sampler.sample`` (t runs T..1, model evaluated at t=T,
fresh per-step noise via fold_in keys — SURVEY.md §3.5.2). Stochastic
draws differ from the generic sampler only in shape order, so individual
trajectories diverge between samplers (like any two backends,
docs/status.md) while distributions agree; ``injected_noise`` bypasses
the RNG for exact trajectory parity in tests.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from pmhc_tpu.diffusion.schedule import DiffusionConfig, ScheduleTables
from pmhc_tpu.models import ScoreNetworkConfig
from pmhc_tpu.models.nn import DEFAULT_PRECISION
from pmhc_tpu.models.score import relpos_edge_pre
from pmhc_tpu.ops.egnn_pallas_lane import (
    egnn_lane_core,
    lane_edge3,
    lane_geometry,
    lane_msg_mask_bg,
    lane_s_mat,
    lane_to_node_bg,
    nbr_to_lane_bg,
    node_to_lane_bg,
    pack_lane_weights,
)
from pmhc_tpu.ops.egnn_pallas_lane_g8 import egnn_lane8_core

F32 = jnp.float32
PI = math.pi
_HIGHEST = lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Lane-layout geometry: component axis LEADING ([C, L] instead of [..., C]).
# Each is an exact port of the trailing-axis twin cited in its docstring.
# ---------------------------------------------------------------------------


def _normalize_rows(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch_normalize over axis 0 (geometry/quat.py::torch_normalize)."""
    norm = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))
    return x / jnp.maximum(norm, eps)


def _qmul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product on [4, L] (geometry/quat.py::quat_multiply)."""
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
    return jnp.stack(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=0,
    )


def _qinvert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse = conjugate / squared norm (geometry/quat.py::quat_invert)."""
    conj = jnp.concatenate((q[:1], -q[1:]), axis=0)
    return conj / jnp.sum(q * q, axis=0, keepdims=True)


def _partial_rot(q: jnp.ndarray, amount) -> jnp.ndarray:
    """Fractional rotation on [4, L] (geometry/quat.py::partial_rot,
    reference ``tools/angle.py:177-186``): output NOT re-normalized."""
    q = _normalize_rows(q)
    a2 = jnp.arccos(jnp.clip(q[:1], -1.0, 1.0))
    axis = _normalize_rows(q[1:])
    return jnp.concatenate(
        (jnp.cos(a2 * amount), jnp.sin(a2 * amount) * axis), axis=0
    )


def _sc_multiply(s1, c1, s2, c2):
    """Angle addition on separate sin/cos rows
    (geometry/sincos.py::multiply_sin_cos)."""
    return s1 * c2 + c1 * s2, c1 * c2 - s1 * s2


def _sc_inverse(s, c):
    """Negate angle, invert magnitude (geometry/sincos.py::inverse_sin_cos)."""
    sqr_norm = s * s + c * c
    return -s / sqr_norm, c / sqr_norm


def _sc_partial(s, c, amount):
    """Scale the angle by ``amount`` (geometry/sincos.py::partial_sin_cos)."""
    norm = jnp.maximum(jnp.sqrt(s * s + c * c), 1e-12)
    a = jnp.arccos(jnp.clip(c / norm, -1.0, 1.0))
    a = jnp.where(s / norm < 0.0, -a, a)
    return jnp.sin(a * amount), jnp.cos(a * amount)


def _shoemake(x: jnp.ndarray) -> jnp.ndarray:
    """Uniform unit quats from Shoemake triples [3, L] -> [4, L]
    (geometry/quat.py::shoemake_quat, reference ``angle.py:69-98``)."""
    x = jnp.clip(x, 0.0, 1.0)
    theta1 = 2.0 * PI * x[1:2]
    theta2 = 2.0 * PI * x[2:3]
    r1 = jnp.sqrt(1.0 - x[0:1])
    r2 = jnp.sqrt(x[0:1])
    return jnp.concatenate(
        (
            r2 * jnp.cos(theta2),
            r1 * jnp.sin(theta1),
            r1 * jnp.cos(theta1),
            r2 * jnp.sin(theta2),
        ),
        axis=0,
    )


def _gen_noise_lane(key: jax.Array, L: int, config: DiffusionConfig):
    """Lane-layout twin of ``noise.gen_noise`` (optimizer.py:93-108):
    returns (quats [4,L], trans [3,L], tor_sin [7,L], tor_cos [7,L])."""
    kp, kq, kt = jax.random.split(key, 3)
    trans = jax.random.normal(kp, (3, L), F32) * config.position_noise_scale
    quats = _shoemake(jax.random.uniform(kq, (3, L), F32))
    a = jax.random.uniform(kt, (7, L), F32) * 2.0 * PI
    return quats, trans, jnp.sin(a), jnp.cos(a)


def _remove_noise_lane(state, pred, rand, t, tables: ScheduleTables,
                       scalars=None):
    """Lane-layout twin of ``noise.remove_noise`` (optimizer.py:140-193);
    state/pred/rand are (q [4,L], t [3,L], sin [7,L], cos [7,L]).
    ``scalars`` (the 6-tuple of ``StridedTables.scalars``) overrides the
    s = t-1 table gathers for strided (few-step) sampling."""
    q_z, t_z, s_z, c_z = state
    q_p, t_p, s_p, c_p = pred
    q_r, t_r, s_r, c_r = rand

    if scalars is None:
        beta_t = tables.beta[t]
        sigma_t = tables.sigma[t]
        beta_s = tables.beta[t - 1]
        alpha_ts = tables.alpha_ts[t]
        sqr_sigma_ts = tables.sqr_sigma_ts[t]
        sigma_t2s = tables.sigma_t2s[t]
    else:
        beta_t, sigma_t, beta_s, alpha_ts, sqr_sigma_ts, sigma_t2s = scalars

    # positions: posterior mean + stochastic term (optimizer.py:164-166)
    t_out = (
        t_z / alpha_ts - (t_p * sqr_sigma_ts) / (alpha_ts * sigma_t)
        + sigma_t2s * t_r
    )

    # rotations (optimizer.py:173-175)
    q_out = _qmul(
        _partial_rot(q_r, beta_s),
        _qmul(_qinvert(_partial_rot(q_p, beta_t)), q_z),
    )

    # torsions (optimizer.py:182-188)
    s_pp, c_pp = _sc_partial(s_p, c_p, beta_t)
    s_pi, c_pi = _sc_inverse(s_pp, c_pp)
    s_mid, c_mid = _sc_multiply(s_pi, c_pi, s_z, c_z)
    s_rp, c_rp = _sc_partial(s_r, c_r, beta_s)
    s_out, c_out = _sc_multiply(s_rp, c_rp, s_mid, c_mid)

    return q_out, t_out, s_out, c_out


# ---------------------------------------------------------------------------
# The sampler
# ---------------------------------------------------------------------------


def sample_lane(
    params,
    batch: Dict[str, Any],
    key: jax.Array,
    config: DiffusionConfig,
    model_config: ScoreNetworkConfig,
    tables: ScheduleTables | None = None,
    precision=DEFAULT_PRECISION,
    injected_noise: Dict[str, Any] | None = None,
    interpret: bool | None = None,
    unroll: int = 4,
    g8: bool = False,
    g8_unroll: int = 1,
    num_steps: int | None = None,
) -> Dict[str, Any]:
    """Full reverse diffusion with the lane-packed fused kernel, scan
    carry kept in lane layout end-to-end.

    Same contract as ``sampler.sample`` (``batch`` in [B, N] layout in
    and out); ``precision=None`` selects the kernel's bf16 MXU mode (the
    CLI --bf16 convention). ``injected_noise`` is a Noise pytree with a
    leading [T] axis in standard layout, transposed per step (tests).
    ``g8``: run the geom8 group kernel (ops/egnn_pallas_lane_g8.py)
    instead of the per-neighbour lane kernel — faster at bf16.
    ``num_steps``: reverse jumps (default T); fewer runs the strided
    few-step sampler (``StridedTables``, the CLI's ``--sample-steps``) —
    with ``injected_noise`` its leading axis is then [K]."""
    if tables is None:
        tables = ScheduleTables(config)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # kernel matmul mode: None -> bf16, HIGH -> 3-pass f32 (--fast-f32),
    # else parity-exact f32-HIGHEST
    bf16 = (True if precision is None
            else "high" if precision == lax.Precision.HIGH
            else False)
    # the XLA-stage matmuls (static neighbour projections + the per-step
    # aj2 projection) follow the same mode: DEFAULT (1-pass bf16) in
    # bf16 mode, 3-pass in --fast-f32, else HIGHEST
    xla_prec = (lax.Precision.DEFAULT if bf16 is True
                else lax.Precision.HIGH if bf16 == "high"
                else _HIGHEST)
    T_steps = config.noise_step_count

    mask = batch["mask"]
    B, N = mask.shape
    P = batch["pocket_mask"].shape[-1]
    H1 = model_config.node_feature_size          # 23
    H2 = model_config.inner_size                 # 64
    inv_T = 1.0 / model_config.noise_step_count

    # g8 at B > 256: batch-grid — the kernel grid tiles 2048-lane batch
    # chunks (k == N query rows x Cb entries) instead of one huge cell
    # whose [4T, 8*k*Bp] group tiles would exhaust VMEM; all lane state
    # lives in the chunk-major *_bg layouts (identical to the plain
    # layouts when nch == 1). Mosaic requires the per-chunk lane width
    # (2048/N) divisible by 128 for the partial-axis resident blocks
    # (interpret exempt; same constraint as the VJP batch-grid)
    Cb = 2048 // N if N <= 2048 else 0
    batch_grid = (g8 and B > 256 and N * Cb == 2048
                  and (interpret or Cb % 128 == 0))
    if batch_grid:
        k, Bp = N, Cb
        nch = -(-B // Bp)
    else:
        k, Bp = lane_geometry(B, N, model_config.lane_block)
        nch = 1
    L = nch * N * Bp
    n2l = lambda x: node_to_lane_bg(x, Bp, nch)
    l2n = lambda x: lane_to_node_bg(x, B, Bp, nch)
    r2l = lambda x: nbr_to_lane_bg(x, Bp, nch)

    # ---- static context, transposed once ------------------------------
    w1 = pack_lane_weights(params["gnn1"], H1, N + P)
    w2 = pack_lane_weights(params["gnn2"], H2, N + P)
    edge3_1 = lane_edge3(relpos_edge_pre(params["gnn1"], N), P)
    edge3_2 = lane_edge3(relpos_edge_pre(params["gnn2"], N), P)
    mask_t = lane_msg_mask_bg(mask, batch["pocket_mask"], Bp, nch)
    s_mat = lane_s_mat(k, Bp)

    feats22 = jnp.asarray(batch["features"], F32)         # [B, N, 22]
    feat_lane = n2l(feats22)                               # [22, L]
    pocket_h = jnp.concatenate(
        (
            jnp.asarray(batch["pocket_features"], F32),
            jnp.zeros((B, P, 1), F32),
        ),
        axis=-1,
    )                                                      # [B, P, 23]
    pocket_inner = jnp.pad(pocket_h, ((0, 0), (0, 0), (0, H2 - H1)))

    def nbr_proj(h_nbr, layer_params, H):
        """Static neighbour pre-activation h @ W1[H:2H] -> [*, T, Bp]."""
        wj = jnp.asarray(layer_params["message"]["lin1"]["w"], F32)[H:2 * H]
        return r2l(
            jnp.einsum("bph,ht->bpt", h_nbr, wj, precision=xla_prec)
        )

    # layer 1 peptide neighbour term: static 22-dim part + time row
    w1m = jnp.asarray(params["gnn1"]["message"]["lin1"]["w"], F32)
    wj1 = w1m[H1:2 * H1]                                   # [23, T]
    aj1_pep_static = r2l(
        jnp.einsum("bnh,ht->bnt", feats22, wj1[:22], precision=xla_prec)
    )                                                      # [N, T, nch*Bp]
    wj1_time = wj1[22].reshape(1, -1, 1)                   # [1, T, 1]
    aj1_pocket = nbr_proj(pocket_h, params["gnn1"], H1)    # [P, T, Bp]
    aj2_pocket = nbr_proj(pocket_inner, params["gnn2"], H2)

    q_pk = r2l(batch["pocket_frames"].quats)          # [P, 4, nch*Bp]
    t_pk = r2l(batch["pocket_frames"].trans)          # [P, 3, nch*Bp]

    w2m = jnp.asarray(params["gnn2"]["message"]["lin1"]["w"], F32)
    wj2_t = w2m[H2:2 * H2].T                               # [T, 64]
    TR = wj2_t.shape[0]

    def carry_nbr(x):
        """Carried lane state [C, nch*N*Bp] -> resident neighbour
        [N, C, nch*Bp] (chunk-major; a sublane-dim reshuffle at
        nch == 1 — no lane movement)."""
        C = x.shape[0]
        y = x.reshape(C, nch, N, Bp)
        return jnp.transpose(y, (2, 0, 1, 3)).reshape(N, C, nch * Bp)

    def interleave(s, c):
        """sin [7, L] + cos [7, L] -> tors14 [14, L] (s0 c0 s1 c1 ...)."""
        return jnp.stack((s, c), axis=1).reshape(14, -1)

    tf_row = jnp.ones((1, L), F32)

    def nbr_cm_groups(qj):
        """Neighbour resident [NP, 4, W] -> component-major groups
        [NP/8, 32, W] (rows w0..w7 x0..x7 y0..y7 z0..z7; W = nch*Bp)."""
        NPl, _, W = qj.shape
        t_ = qj.reshape(NPl // 8, 8, 4, W)
        return jnp.transpose(t_, (0, 2, 1, 3)).reshape(NPl // 8, 32, W)

    def layer_core(wl, hl, q, t_lane, tors14, s_lane, c_lane,
                   ajl, qj, tj, edge3l, O):
        if g8:
            return egnn_lane8_core(
                wl, hl, q, t_lane, tors14, s_lane, c_lane,
                ajl, qj, tj, nbr_cm_groups(qj), edge3l, mask_t, s_mat,
                k=k, Bp=Bp, O=O, interpret=interpret, bf16=bf16,
                unroll=g8_unroll, batch_grid=batch_grid,
            )
        return egnn_lane_core(
            wl, hl, q, t_lane, tors14, s_lane, c_lane,
            ajl, qj, tj, edge3l, mask_t, s_mat,
            k=k, Bp=Bp, O=O, interpret=interpret, bf16=bf16, unroll=unroll,
        )

    def forward(q, t_lane, s_lane, c_lane, t):
        """Two fused layers on lane state -> predicted noise (lane)."""
        tf = jnp.asarray(t, F32) * inv_T
        h1 = jnp.concatenate((feat_lane, tf * tf_row), axis=0)  # [23, L]
        tors14 = interleave(s_lane, c_lane)

        aj1 = jnp.concatenate(
            (aj1_pep_static + tf * wj1_time, aj1_pocket), axis=0
        )
        qj = jnp.concatenate((carry_nbr(q), q_pk), axis=0)
        tj = jnp.concatenate((carry_nbr(t_lane), t_pk), axis=0)

        q1, t1, s1, c1, inner = layer_core(
            w1, h1, q, t_lane, tors14, s_lane, c_lane,
            aj1, qj, tj, edge3_1, H2,
        )

        h2 = jnp.maximum(inner, 0.0)                        # [64, L]
        # dynamic layer-2 neighbour projection: [T, L] -> [N, T, nch*Bp]
        aj2_pep = jnp.transpose(
            lax.dot_general(
                wj2_t, h2, (((1,), (0,)), ((), ())),
                preferred_element_type=F32, precision=xla_prec,
            ).reshape(TR, nch, N, Bp),
            (2, 0, 1, 3),
        ).reshape(N, TR, nch * Bp)
        aj2 = jnp.concatenate((aj2_pep, aj2_pocket), axis=0)
        qj2 = jnp.concatenate((carry_nbr(q1), q_pk), axis=0)
        tj2 = jnp.concatenate((carry_nbr(t1), t_pk), axis=0)
        tors14_1 = interleave(s1, c1)

        q2, t2, s2, c2, _ = layer_core(
            w2, h2, q1, t1, tors14_1, s1, c1,
            aj2, qj2, tj2, edge3_2, 1,
        )
        return q2, t2, s2, c2

    def step(carry, xs):
        t, scalars, inj = xs
        pred = forward(*carry, t)
        if inj is None:
            rand = _gen_noise_lane(jax.random.fold_in(key, t), L, config)
        else:
            rand = (
                n2l(inj["frames"].quats),
                n2l(inj["frames"].trans),
                n2l(inj["torsions"][..., 0]),
                n2l(inj["torsions"][..., 1]),
            )
        return _remove_noise_lane(carry, pred, rand, t, tables, scalars), None

    torsions0 = jnp.asarray(batch["torsions"], F32)
    init = (
        n2l(batch["frames"].quats),
        n2l(batch["frames"].trans),
        n2l(torsions0[..., 0]),
        n2l(torsions0[..., 1]),
    )

    if num_steps is not None and num_steps != T_steps:
        from pmhc_tpu.diffusion.schedule import StridedTables, strided_timesteps

        st = StridedTables(config, strided_timesteps(T_steps, num_steps))
        ts, sc = st.ts, st.scalars(jnp.arange(st.num_jumps))
    else:
        ts, sc = jnp.arange(T_steps, 0, -1), None
    if injected_noise is None:
        step_fn = lambda carry, xs: step(carry, (xs[0], xs[1], None))
        xs = (ts, sc)
    else:
        step_fn = step
        xs = (ts, sc, injected_noise)
    (q, t_lane, s_lane, c_lane), _ = lax.scan(step_fn, init, xs)

    from pmhc_tpu.geometry import RigidArray

    result = dict(batch)
    result["frames"] = RigidArray(l2n(q), l2n(t_lane))
    result["torsions"] = jnp.stack(
        (l2n(s_lane), l2n(c_lane)), axis=-1
    )
    return result
