"""Pallas fused EGNN kernel parity vs the XLA-path egnn_forward
(interpret mode — runs the kernel logic on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.models.egnn import egnn_forward
from pmhc_tpu.models.score import relpos_edge_pre
from pmhc_tpu.ops import egnn_forward_pallas
from pmhc_tpu.train.trainer import prepare_batch

CONFIG = ScoreNetworkConfig()


def _layer_inputs(batch_size=5):
    batch = prepare_batch(synthetic_batch(batch_size=batch_size, seed=3))
    params = init_score_network(jax.random.key(0), CONFIG)["gnn1"]
    B, N = batch["mask"].shape
    P = batch["pocket_mask"].shape[-1]
    h = jnp.concatenate(
        (batch["features"], jnp.full((B, N, 1), 0.25, jnp.float32)), axis=-1
    )
    pocket_h = jnp.concatenate(
        (batch["pocket_features"], jnp.zeros((B, P, 1), jnp.float32)), axis=-1
    )
    edge_pre = relpos_edge_pre(params, CONFIG.max_len)
    args = (
        params,
        batch["frames"],
        batch["torsions"],
        h,
        edge_pre,
        batch["mask"].astype(jnp.float32),
        pocket_h,
        batch["pocket_frames"],
        batch["pocket_mask"].astype(jnp.float32),
    )
    return args


def test_pallas_layer_matches_xla():
    args = _layer_inputs()
    ref_frames, ref_tors, ref_feat = egnn_forward(*args)
    out_frames, out_tors, out_feat = egnn_forward_pallas(
        *args, batch_block=2, interpret=True  # batch 5: exercises padding
    )
    np.testing.assert_allclose(
        np.asarray(out_frames.quats), np.asarray(ref_frames.quats), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_frames.trans), np.asarray(ref_frames.trans), atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(out_tors), np.asarray(ref_tors), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_feat), np.asarray(ref_feat), atol=1e-4)


def test_pallas_trainable_grads_match_xla():
    """custom_vjp wrapper: Pallas forward + XLA-remat backward produces
    gradients consistent with differentiating the XLA path directly."""
    from pmhc_tpu.ops import egnn_forward_pallas_trainable

    args = _layer_inputs(batch_size=2)
    params = args[0]

    def loss_xla(p):
        frames, tors, feat = egnn_forward(p, *args[1:])
        return (
            jnp.sum(jnp.square(frames.trans))
            + jnp.sum(jnp.square(frames.quats))
            + jnp.sum(jnp.square(tors))
            + jnp.sum(jnp.square(feat))
        )

    def loss_pl(p):
        frames, tors, feat = egnn_forward_pallas_trainable(
            p, *args[1:], batch_block=2, interpret=True
        )
        return (
            jnp.sum(jnp.square(frames.trans))
            + jnp.sum(jnp.square(frames.quats))
            + jnp.sum(jnp.square(tors))
            + jnp.sum(jnp.square(feat))
        )

    g_xla = jax.grad(loss_xla)(params)
    g_pl = jax.grad(loss_pl)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla), jax.tree_util.tree_leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3)
