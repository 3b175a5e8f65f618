"""The Pallas kernels are dim-GENERIC, not specialized to the reference's
model size: every layout/loop parameter derives from the param shapes.
Pin that with interpret-mode parity at a scaled model (M = I = 128 —
2x the reference's hidden dims, ``model.py:362-368``), so the kernels
keep serving scaled-up score networks, where MXU efficiency is higher."""

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
from pmhc_tpu.ops.egnn_pallas_lane_g8 import egnn_forward_pallas_lane_g8
from pmhc_tpu.train.trainer import prepare_batch

CONFIG = ScoreNetworkConfig(inner_size=128, message_size=128)


@pytest.fixture(scope="module")
def layer_inputs():
    batch = prepare_batch(synthetic_batch(batch_size=4, seed=9))
    params = init_score_network(jax.random.key(0), CONFIG)["gnn1"]
    B, N = batch["mask"].shape
    Pk = batch["pocket_mask"].shape[-1]
    h = jnp.concatenate(
        (batch["features"], jnp.full((B, N, 1), 0.5, jnp.float32)), axis=-1)
    pocket_h = jnp.concatenate(
        (batch["pocket_features"], jnp.zeros((B, Pk, 1), jnp.float32)),
        axis=-1)
    edge_pre = relpos_edge_pre(params, CONFIG.max_len)
    return params, (
        batch["frames"], batch["torsions"], h, edge_pre,
        batch["mask"].astype(jnp.float32), pocket_h, batch["pocket_frames"],
        batch["pocket_mask"].astype(jnp.float32),
    )


def _assert_close(lane, dense):
    lane_f, lane_t, lane_h = lane
    dense_f, dense_t, dense_h = dense
    np.testing.assert_allclose(
        np.asarray(lane_f.quats), np.asarray(dense_f.quats), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(lane_f.trans), np.asarray(dense_f.trans), atol=2e-4)
    np.testing.assert_allclose(np.asarray(lane_t), np.asarray(dense_t),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(lane_h), np.asarray(dense_h),
                               atol=2e-4)


def test_lane_forward_at_scaled_dims(layer_inputs):
    params, args = layer_inputs
    _assert_close(
        egnn_forward_pallas_lane(params, *args, lane_block=128,
                                 interpret=True),
        egnn_forward(params, *args))


def test_g8_forward_at_scaled_dims(layer_inputs):
    params, args = layer_inputs
    _assert_close(
        egnn_forward_pallas_lane_g8(params, *args, interpret=True),
        egnn_forward(params, *args))


def test_vjp_grads_at_scaled_dims(layer_inputs):
    params, args = layer_inputs

    def scalar(fwd):
        def loss(p):
            f, t, h = fwd(p)
            return (jnp.sum(f.trans ** 2) * 1e-3 + jnp.sum(h ** 2) * 1e-4
                    + jnp.sum(t ** 2) * 1e-3)
        return loss

    g_lane = jax.grad(scalar(lambda p: egnn_forward_pallas_lane_trainable(
        p, *args, interpret=True)))(params)
    g_dense = jax.grad(scalar(lambda p: egnn_forward(p, *args)))(params)
    errs = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        g_lane, g_dense)
    assert max(jax.tree.leaves(errs)) < 5e-5
