"""Lane-packed fused EGNN kernel (pmhc_tpu/ops/egnn_pallas_lane.py):
interpret-mode parity with the dense XLA layer, including through the full
score network and the trainable custom-VJP wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.models.egnn import egnn_forward
from pmhc_tpu.models.score import relpos_edge_pre
from pmhc_tpu.ops.egnn_pallas_lane import (
    egnn_forward_pallas_lane,
    egnn_forward_pallas_lane_trainable,
)
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


@pytest.mark.parametrize("batch_size,lane_block", [(4, 128), (9, 128), (8, 1024)])
def test_lane_kernel_matches_dense(batch_size, lane_block):
    """Interpret-mode forward equals the XLA layer — including a batch
    whose BN is not a multiple of the lane block (padding path)."""
    params, args = _layer_inputs(batch_size=batch_size)
    dense_f, dense_t, dense_h = egnn_forward(params, *args)
    lane_f, lane_t, lane_h = egnn_forward_pallas_lane(
        params, *args, lane_block=lane_block, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(lane_f.quats), np.asarray(dense_f.quats), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(lane_f.trans), np.asarray(dense_f.trans), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane_t), np.asarray(dense_t), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane_h), np.asarray(dense_h), atol=2e-4)


def test_lane_kernel_fully_masked_row():
    """A sample with an empty peptide mask gets the identity rotation
    (the has-neighbours fallback), matching the dense layer."""
    params, args = _layer_inputs(batch_size=4)
    (frames, torsions, h, edge_pre, mask, pocket_h, pk_frames, pk_mask) = args
    mask = mask.at[1].set(0.0)
    pk_mask = pk_mask.at[1].set(0.0)
    args = (frames, torsions, h, edge_pre, mask, pocket_h, pk_frames, pk_mask)
    dense_f, dense_t, dense_h = egnn_forward(params, *args)
    lane_f, lane_t, lane_h = egnn_forward_pallas_lane(
        params, *args, lane_block=128, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(lane_f.quats), np.asarray(dense_f.quats), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(lane_f.trans), np.asarray(dense_f.trans), atol=2e-4)


def test_lane_backend_through_score_network():
    """backend='pallas_lane' through the full 2-layer score network
    matches the XLA backend (interpret mode on CPU)."""
    from pmhc_tpu.models import score_network_forward

    batch = prepare_batch(synthetic_batch(batch_size=4, seed=3))
    params = init_score_network(jax.random.key(0), CONFIG)
    t = jnp.asarray(500, jnp.int32)
    dense = score_network_forward(params, batch, t, CONFIG)
    lane = score_network_forward(
        params, batch, t, ScoreNetworkConfig(backend="pallas_lane")
    )
    np.testing.assert_allclose(
        np.asarray(lane["frames"].quats), np.asarray(dense["frames"].quats),
        atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(lane["frames"].trans), np.asarray(dense["frames"].trans),
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane["torsions"]), np.asarray(dense["torsions"]), atol=2e-4)


def test_lane_trainable_grads_match_dense():
    """The custom-VJP wrapper's gradients equal the dense layer's (the
    backward rematerializes through XLA)."""
    params, args = _layer_inputs(batch_size=4)

    def loss(fn):
        def f(p):
            fr, tr, hh = fn(p, *args)
            return jnp.sum(fr.trans ** 2) + jnp.sum(tr) + jnp.sum(hh)
        return f

    g_dense = jax.grad(loss(egnn_forward))(params)
    g_lane = jax.grad(loss(
        lambda p, *a: egnn_forward_pallas_lane_trainable(
            p, *a, lane_block=128, interpret=True)
    ))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_dense),
                    jax.tree_util.tree_leaves(g_lane)):
        a, b = np.asarray(a), np.asarray(b)
        # the backward is an exact XLA remat; residual diffs come from the
        # cotangents (loss evaluated on the pallas forward, ~1e-5), so
        # near-zero-gradient leaves need an absolute floor at that scale
        np.testing.assert_allclose(
            b, a, atol=max(1e-4 * float(np.abs(a).max()), 1e-5))


def test_lane_kernel_bf16_close_to_f32():
    """bf16 MXU mode tracks the f32 kernel at bf16-rounding scale. The
    attention softmax amplifies logit rounding RELATIVELY (the same
    documented effect as the XLA path's --bf16: trajectories differ,
    distributions/quality don't), so tolerances are sanity-level, and the
    quats must stay unit-norm (geometry is f32)."""
    params, args = _layer_inputs(batch_size=4)
    f32_f, f32_t, f32_h = egnn_forward_pallas_lane(
        params, *args, lane_block=128, interpret=True)
    b_f, b_t, b_h = egnn_forward_pallas_lane(
        params, *args, lane_block=128, interpret=True, bf16=True)
    np.testing.assert_allclose(
        np.asarray(b_f.quats), np.asarray(f32_f.quats), atol=5e-2)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(b_f.quats), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(b_f.trans), np.asarray(f32_f.trans), atol=0.5)
    np.testing.assert_allclose(np.asarray(b_t), np.asarray(f32_t), atol=0.1)
    np.testing.assert_allclose(np.asarray(b_h), np.asarray(f32_h), atol=0.5)


def test_lane_kernel_high_tracks_f32_tightly():
    """The "high" mode (in-kernel 3-pass f32 emulation via bf16 hi/lo
    split dots — the --fast-f32 kernel path) must track the HIGHEST-
    precision kernel ~2.5 orders tighter than plain bf16 (~1.5e-5
    relative per dot vs ~4e-3): same structure as the bf16 sanity test
    but at near-f32 tolerances."""
    params, args = _layer_inputs(batch_size=4)
    f32_f, f32_t, f32_h = egnn_forward_pallas_lane(
        params, *args, lane_block=128, interpret=True)
    h_f, h_t, h_h = egnn_forward_pallas_lane(
        params, *args, lane_block=128, interpret=True, bf16="high")
    np.testing.assert_allclose(
        np.asarray(h_f.quats), np.asarray(f32_f.quats), atol=3e-4)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(h_f.quats), axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(h_f.trans), np.asarray(f32_f.trans), atol=3e-3)
    np.testing.assert_allclose(np.asarray(h_t), np.asarray(f32_t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(h_h), np.asarray(f32_h), atol=3e-3)


def test_lane_kernel_headpack_off_matches_dense(monkeypatch):
    """The non-headpack lane forward kernel (PMHC_G8_HEADPACK=0 —
    the env var gates ALL lane-family kernels, not just g8) keeps
    dense parity (VERDICT r4 next #4 / ADVICE r4)."""
    monkeypatch.setenv("PMHC_G8_HEADPACK", "0")
    params, args = _layer_inputs(batch_size=4)
    dense_f, dense_t, dense_h = egnn_forward(params, *args)
    lane_f, lane_t, lane_h = egnn_forward_pallas_lane(
        params, *args, lane_block=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(lane_f.quats), np.asarray(dense_f.quats), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(lane_f.trans), np.asarray(dense_f.trans), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane_t), np.asarray(dense_t), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane_h), np.asarray(dense_h), atol=2e-4)
