"""Differentiable lane-packed layer (Pallas fwd + hand-written Pallas bwd,
pmhc_tpu/ops/egnn_pallas_lane_vjp.py): interpret-mode value AND gradient
parity against the dense XLA layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.models.egnn import egnn_forward
from pmhc_tpu.models.score import relpos_edge_pre
from pmhc_tpu.ops.egnn_pallas_lane_vjp import egnn_forward_pallas_lane_vjp
from pmhc_tpu.train.trainer import prepare_batch

CONFIG = ScoreNetworkConfig()


def _layer_inputs(batch_size=4, seed=9):
    batch = prepare_batch(synthetic_batch(batch_size=batch_size, seed=seed))
    params = init_score_network(jax.random.key(0), CONFIG)["gnn1"]
    B, N = batch["mask"].shape
    Pk = batch["pocket_mask"].shape[-1]
    h = jnp.concatenate(
        (batch["features"], jnp.full((B, N, 1), 0.5, jnp.float32)), axis=-1
    )
    pocket_h = jnp.concatenate(
        (batch["pocket_features"], jnp.zeros((B, Pk, 1), jnp.float32)), axis=-1
    )
    edge_pre = relpos_edge_pre(params, CONFIG.max_len)
    return params, (
        batch["frames"], batch["torsions"], h, edge_pre,
        batch["mask"].astype(jnp.float32), pocket_h, batch["pocket_frames"],
        batch["pocket_mask"].astype(jnp.float32),
    )


@pytest.mark.parametrize("batch_size", [4, 9])
@pytest.mark.parametrize("g8", [False, True])
def test_vjp_layer_forward_matches_dense(batch_size, g8):
    params, args = _layer_inputs(batch_size=batch_size)
    dense_f, dense_t, dense_h = egnn_forward(params, *args)
    lane_f, lane_t, lane_h = egnn_forward_pallas_lane_vjp(
        params, *args, interpret=True, g8=g8
    )
    np.testing.assert_allclose(
        np.asarray(lane_f.quats), np.asarray(dense_f.quats), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(lane_f.trans), np.asarray(dense_f.trans), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane_t), np.asarray(dense_t), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane_h), np.asarray(dense_h), atol=2e-4)


@pytest.mark.parametrize("g8", [False, True])
def test_vjp_layer_grads_match_dense(g8):
    """Gradients through the hand-written Pallas backward equal the dense
    layer's — w.r.t. PARAMS and every differentiable input (frames,
    torsions, node features, edge term, pocket features/frames)."""
    params, args = _layer_inputs(batch_size=4)
    (frames, torsions, h, edge_pre, mask, pocket_h, pk_frames, pk_mask) = args

    def loss(fn):
        def f(p, fr_q, fr_t, tors, hh, edge, pk_h, pk_q, pk_t):
            frames_ = type(frames)(fr_q, fr_t)
            pk_frames_ = type(frames)(pk_q, pk_t)
            fr, tr, out_h = fn(p, frames_, tors, hh, edge, mask, pk_h,
                               pk_frames_, pk_mask)
            return (jnp.sum(fr.trans ** 2) + jnp.sum(fr.quats * 0.7)
                    + jnp.sum(tr ** 2) + jnp.sum(out_h * 0.3))
        return f

    argnums = tuple(range(9))
    diff_args = (params, frames.quats, frames.trans, torsions, h, edge_pre,
                 pocket_h, pk_frames.quats, pk_frames.trans)
    g_dense = jax.grad(loss(egnn_forward), argnums=argnums)(*diff_args)
    g_lane = jax.grad(
        loss(lambda *a: egnn_forward_pallas_lane_vjp(
            *a, interpret=True, g8=g8)),
        argnums=argnums,
    )(*diff_args)

    names = ("params", "frames.quats", "frames.trans", "torsions", "h",
             "edge_pre", "pocket_h", "pk_frames.quats", "pk_frames.trans")
    for name, a_tree, b_tree in zip(names, g_dense, g_lane):
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(a_tree)[0],
            jax.tree_util.tree_leaves(b_tree),
        ):
            a, b = np.asarray(a), np.asarray(b)
            # floor 3e-5: attention.lin2.b's true gradient is ANALYTIC
            # ZERO (a constant logit shift cancels through the softmax
            # ratios GD/D, TA/D, TR/D), so both sides produce only
            # cancellation noise of O(1e-5) whose pattern depends on the
            # kernel's reduction order
            np.testing.assert_allclose(
                b, a, atol=max(2e-4 * float(np.abs(a).max()), 3e-5),
                err_msg=f"{name}{jax.tree_util.keystr(path)}",
            )


@pytest.mark.parametrize("lane_backend", ["pallas_lane", "g8"])
def test_train_step_pallas_lane_matches_xla(lane_backend):
    """One full train step (fwd + loss + bwd + SGD) with the lane
    backends — gradients through BOTH layers' Pallas backwards — tracks
    the XLA backend."""
    import optax

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.diffusion import DiffusionConfig
    from pmhc_tpu.train.trainer import make_train_step

    opt = optax.sgd(1e-4)
    dc = DiffusionConfig()
    batch = prepare_batch(synthetic_batch(batch_size=4, seed=2))

    def run(backend):
        params = init_score_network(
            jax.random.key(5), ScoreNetworkConfig(backend=backend))
        step = make_train_step(ScoreNetworkConfig(backend=backend), dc, opt)
        p, o, k, sums = step(params, opt.init(params), batch,
                             jax.random.key(9))
        return p, sums

    p_xla, s_xla = run("xla")
    p_lane, s_lane = run(lane_backend)
    for name in s_xla:
        np.testing.assert_allclose(
            float(s_lane[name]), float(s_xla[name]), rtol=5e-4, err_msg=name)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(p_xla)[0],
        jax.tree_util.tree_leaves(p_lane),
    ):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, atol=max(2e-4 * float(np.abs(a).max()), 2e-5),
            err_msg=jax.tree_util.keystr(path))


def test_vjp_layer_chunked_large_batch():
    """Batches above the chunk size run the BATCH-GRID path (grid cells
    = batch chunks, incl. a zero-padded final chunk): forward matches
    dense and weight grads sum correctly across the grid."""
    params, args = _layer_inputs(batch_size=300)
    dense_f, dense_t, dense_h = egnn_forward(params, *args)
    lane_f, lane_t, lane_h = egnn_forward_pallas_lane_vjp(
        params, *args, interpret=True)
    np.testing.assert_allclose(
        np.asarray(lane_f.trans), np.asarray(dense_f.trans), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane_h), np.asarray(dense_h), atol=2e-4)

    def loss(fn):
        def f(p):
            fr, tr, hh = fn(p, *args)
            return jnp.mean(fr.trans ** 2) + jnp.mean(tr) + jnp.mean(hh)
        return f

    g_dense = jax.grad(loss(egnn_forward))(params)
    g_lane = jax.grad(loss(
        lambda p, *a: egnn_forward_pallas_lane_vjp(p, *a, interpret=True)
    ))(params)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_dense)[0],
        jax.tree_util.tree_leaves(g_lane),
    ):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, atol=max(3e-4 * float(np.abs(a).max()), 1e-7),
            err_msg=jax.tree_util.keystr(path))


@pytest.mark.parametrize("g8", [False, True])
def test_vjp_layer_batch_grid_grads_match_unchunked(g8):
    """Batch-grid path with a small explicit chunk (B=40, chunk=16 ->
    3 grid cells incl. padding) against the UNCHUNKED lane path (same
    kernels — the right oracle for the chunking logic: any structural
    bug in the in-kernel dedge/dw accumulation across batch chunks or
    the chunk-exclusive daj/dqj/dtj blocks shows as a large relative
    error, while f32 summation-order noise stays ~1e-6 absolute)."""
    params, args = _layer_inputs(batch_size=40)
    (frames, torsions, h, edge_pre, mask, pocket_h, pk_frames, pk_mask) = args

    def loss(fn):
        def f(p, fr_q, fr_t, tors, hh, edge, pk_h, pk_q, pk_t):
            frames_ = type(frames)(fr_q, fr_t)
            pk_frames_ = type(frames)(pk_q, pk_t)
            fr, tr, out_h = fn(p, frames_, tors, hh, edge, mask, pk_h,
                               pk_frames_, pk_mask)
            return (jnp.sum(fr.trans ** 2) + jnp.sum(fr.quats * 0.7)
                    + jnp.sum(tr ** 2) + jnp.sum(out_h * 0.3))
        return f

    argnums = tuple(range(9))
    diff_args = (params, frames.quats, frames.trans, torsions, h, edge_pre,
                 pocket_h, pk_frames.quats, pk_frames.trans)
    g_ref = jax.grad(
        loss(lambda *a: egnn_forward_pallas_lane_vjp(
            *a, interpret=True, g8=g8)),
        argnums=argnums,
    )(*diff_args)
    g_bg = jax.grad(
        loss(lambda *a: egnn_forward_pallas_lane_vjp(
            *a, interpret=True, g8=g8, chunk=16)),
        argnums=argnums,
    )(*diff_args)

    names = ("params", "frames.quats", "frames.trans", "torsions", "h",
             "edge_pre", "pocket_h", "pk_frames.quats", "pk_frames.trans")
    for name, a_tree, b_tree in zip(names, g_ref, g_bg):
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(a_tree)[0],
            jax.tree_util.tree_leaves(b_tree),
        ):
            a, b = np.asarray(a), np.asarray(b)
            # floor 3e-5: attention.lin2.b's true gradient is ANALYTIC
            # ZERO (a constant logit shift cancels through the softmax
            # ratios GD/D, TA/D, TR/D), so both sides produce only
            # cancellation noise of O(1e-5) whose pattern depends on the
            # kernel's reduction order
            np.testing.assert_allclose(
                b, a, atol=max(2e-4 * float(np.abs(a).max()), 3e-5),
                err_msg=f"{name}{jax.tree_util.keystr(path)}",
            )


def test_vjp_layer_lax_map_fallback():
    """An explicit chunk whose per-chunk geometry has >1 residue cell
    (chunk=192 -> k=8, ncells=2) forces the legacy lax.map path; values
    still match dense."""
    params, args = _layer_inputs(batch_size=200)
    dense_f, _, dense_h = egnn_forward(params, *args)
    lane_f, _, lane_h = egnn_forward_pallas_lane_vjp(
        params, *args, interpret=True, chunk=192)
    np.testing.assert_allclose(
        np.asarray(lane_f.trans), np.asarray(dense_f.trans), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane_h), np.asarray(dense_h), atol=2e-4)


@pytest.mark.parametrize("g8", [False, True])
def test_vjp_layer_grads_high_mode_close_to_dense(g8):
    """bf16="high" (in-kernel 3-pass f32 emulation, the --fast-f32
    kernel path): the hand-written backward's grads stay within split-
    dot rounding (~1.5e-5 relative per dot, amplified through the two
    chained MLP levels) of the exact dense f32 grads."""
    params, args = _layer_inputs(batch_size=4)
    (frames, torsions, h, edge_pre, mask, pocket_h, pk_frames, pk_mask) = args

    def loss(fn):
        def f(p, fr_q, fr_t, tors, hh, edge, pk_h, pk_q, pk_t):
            frames_ = type(frames)(fr_q, fr_t)
            pk_frames_ = type(frames)(pk_q, pk_t)
            fr, tr, out_h = fn(p, frames_, tors, hh, edge, mask, pk_h,
                               pk_frames_, pk_mask)
            return (jnp.sum(fr.trans ** 2) + jnp.sum(fr.quats * 0.7)
                    + jnp.sum(tr ** 2) + jnp.sum(out_h * 0.3))
        return f

    argnums = tuple(range(9))
    diff_args = (params, frames.quats, frames.trans, torsions, h, edge_pre,
                 pocket_h, pk_frames.quats, pk_frames.trans)
    g_dense = jax.grad(loss(egnn_forward), argnums=argnums)(*diff_args)
    g_lane = jax.grad(
        loss(lambda *a: egnn_forward_pallas_lane_vjp(
            *a, interpret=True, g8=g8, bf16="high")),
        argnums=argnums,
    )(*diff_args)

    names = ("params", "frames.quats", "frames.trans", "torsions", "h",
             "edge_pre", "pocket_h", "pk_frames.quats", "pk_frames.trans")
    for name, a_tree, b_tree in zip(names, g_dense, g_lane):
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(a_tree)[0],
            jax.tree_util.tree_leaves(b_tree),
        ):
            a, b = np.asarray(a), np.asarray(b)
            np.testing.assert_allclose(
                b, a, atol=max(2e-3 * float(np.abs(a).max()), 2e-4),
                err_msg=f"{name}{jax.tree_util.keystr(path)}",
            )


@pytest.mark.parametrize("g8", [False, True])
def test_vjp_layer_grads_headpack_off_match_dense(monkeypatch, g8):
    """Gradient parity for the non-headpack custom-VJP loop kernels
    (PMHC_G8_HEADPACK=0, both loop variants) — the stage-ablation
    fallback path must not rot (VERDICT r4 next #4 / ADVICE r4)."""
    monkeypatch.setenv("PMHC_G8_HEADPACK", "0")
    params, args = _layer_inputs(batch_size=4)
    (frames, torsions, h, edge_pre, mask, pocket_h, pk_frames, pk_mask) = args

    def loss(fn):
        def f(p, fr_q, fr_t, tors, hh, edge, pk_h, pk_q, pk_t):
            frames_ = type(frames)(fr_q, fr_t)
            pk_frames_ = type(frames)(pk_q, pk_t)
            fr, tr, out_h = fn(p, frames_, tors, hh, edge, mask, pk_h,
                               pk_frames_, pk_mask)
            return (jnp.sum(fr.trans ** 2) + jnp.sum(fr.quats * 0.7)
                    + jnp.sum(tr ** 2) + jnp.sum(out_h * 0.3))
        return f

    argnums = tuple(range(9))
    diff_args = (params, frames.quats, frames.trans, torsions, h, edge_pre,
                 pocket_h, pk_frames.quats, pk_frames.trans)
    g_dense = jax.grad(loss(egnn_forward), argnums=argnums)(*diff_args)
    g_lane = jax.grad(
        loss(lambda *a: egnn_forward_pallas_lane_vjp(
            *a, interpret=True, g8=g8)),
        argnums=argnums)(*diff_args)
    for gd, gl in zip(g_dense, g_lane):
        for a, b in zip(jax.tree_util.tree_leaves(gd),
                        jax.tree_util.tree_leaves(gl)):
            a, b = np.asarray(a), np.asarray(b)
            # same tolerance rationale as the headpack-on grad test
            # above (floor for the analytic-zero attention.lin2.b)
            np.testing.assert_allclose(
                b, a, atol=max(2e-4 * float(np.abs(a).max()), 3e-5))
