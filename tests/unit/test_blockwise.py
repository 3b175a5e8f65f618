"""Blockwise (online-softmax) EGNN forward equals the dense layer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.models.egnn import egnn_forward
from pmhc_tpu.models.egnn_blockwise import egnn_forward_blockwise
from pmhc_tpu.models.score import relpos_edge_pre
from pmhc_tpu.train.trainer import prepare_batch

CONFIG = ScoreNetworkConfig()


@pytest.mark.parametrize("neighbour_block", [16, 32, 96])
def test_blockwise_matches_dense(neighbour_block):
    batch = prepare_batch(synthetic_batch(batch_size=3, seed=17))
    params = init_score_network(jax.random.key(2), CONFIG)["gnn1"]
    B, N = batch["mask"].shape
    P = batch["pocket_mask"].shape[-1]
    h = jnp.concatenate(
        (batch["features"], jnp.full((B, N, 1), 0.3, jnp.float32)), axis=-1
    )
    pocket_h = jnp.concatenate(
        (batch["pocket_features"], jnp.zeros((B, P, 1), jnp.float32)), axis=-1
    )
    args = (
        params, batch["frames"], batch["torsions"], h,
        relpos_edge_pre(params, CONFIG.max_len),
        batch["mask"].astype(jnp.float32), pocket_h,
        batch["pocket_frames"], batch["pocket_mask"].astype(jnp.float32),
    )

    dense_frames, dense_tors, dense_feat = egnn_forward(*args)
    blk_frames, blk_tors, blk_feat = jax.jit(
        lambda *a: egnn_forward_blockwise(*a, neighbour_block=neighbour_block)
    )(*args)

    np.testing.assert_allclose(
        np.asarray(blk_frames.quats), np.asarray(dense_frames.quats), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(blk_frames.trans), np.asarray(dense_frames.trans), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(blk_tors), np.asarray(dense_tors), atol=2e-4)
    np.testing.assert_allclose(np.asarray(blk_feat), np.asarray(dense_feat), atol=2e-4)
