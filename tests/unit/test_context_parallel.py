"""Context-parallel EGNN: neighbour axis sharded over 8 devices equals the
dense single-device layer (the SP/CP design of docs/scaling.md, live)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.geometry import RigidArray
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.models.egnn import egnn_forward
from pmhc_tpu.models.score import relpos_edge_pre
from pmhc_tpu.parallel.context import egnn_forward_cp, egnn_forward_ring
from pmhc_tpu.train.trainer import prepare_batch

CONFIG = ScoreNetworkConfig()


def test_neighbour_sharded_layer_matches_dense():
    batch = prepare_batch(synthetic_batch(batch_size=4, seed=9))
    params = init_score_network(jax.random.key(0), CONFIG)["gnn1"]
    B, N = batch["mask"].shape
    Pk = batch["pocket_mask"].shape[-1]
    NP = N + Pk

    h = jnp.concatenate(
        (batch["features"], jnp.full((B, N, 1), 0.5, jnp.float32)), axis=-1
    )
    pocket_h = jnp.concatenate(
        (batch["pocket_features"], jnp.zeros((B, Pk, 1), jnp.float32)), axis=-1
    )
    mask = batch["mask"].astype(jnp.float32)
    pocket_mask = batch["pocket_mask"].astype(jnp.float32)
    edge_pre = relpos_edge_pre(params, CONFIG.max_len)

    # dense reference
    dense_frames, dense_tors, dense_feat = egnn_forward(
        params, batch["frames"], batch["torsions"], h, edge_pre, mask,
        pocket_h, batch["pocket_frames"], pocket_mask,
    )

    # global neighbour-axis tensors (peptide | pocket), then shard over 8
    h_all = jnp.concatenate((h, pocket_h), axis=-2)  # [B, NP, H]
    q_all = jnp.concatenate(
        (batch["frames"].quats, batch["pocket_frames"].quats), axis=-2
    )
    t_all = jnp.concatenate(
        (batch["frames"].trans, batch["pocket_frames"].trans), axis=-2
    )
    not_self = 1.0 - jnp.eye(N, dtype=jnp.float32)
    msg_mask = jnp.concatenate(
        (
            mask[:, :, None] * mask[:, None, :] * not_self,
            mask[:, :, None] * pocket_mask[:, None, :],
        ),
        axis=-1,
    )  # [B, N, NP]
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, Pk), (0, 0)))  # [N, NP, T]

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("cp",))
    assert NP % 8 == 0

    @jax.jit
    def sharded(params, frames, torsions, h, edge_full, msg_mask, h_all, q_all, t_all):
        fn = shard_map(
            lambda p, fq, ft, tors, hh, e, mm, ha, qa, ta: egnn_forward_cp(
                p, RigidArray(fq, ft), tors, hh, e, mm, ha,
                RigidArray(qa, ta), "cp",
            ),
            mesh=mesh,
            in_specs=(
                P(),  # params
                P(), P(),  # peptide quats/trans
                P(),  # torsions
                P(),  # h
                P(None, "cp", None),  # edge_full [N, NP, T]
                P(None, None, "cp"),  # msg_mask [B, N, NP]
                P(None, "cp", None),  # h_all [B, NP, H]
                P(None, "cp", None),  # q_all
                P(None, "cp", None),  # t_all
            ),
            out_specs=(P(), P(), P()),
        )
        return fn(
            params, frames.quats, frames.trans, torsions, h, edge_full,
            msg_mask, h_all, q_all, t_all,
        )

    cp_frames, cp_tors, cp_feat = sharded(
        params, batch["frames"], batch["torsions"], h, edge_full, msg_mask,
        h_all, q_all, t_all,
    )

    np.testing.assert_allclose(
        np.asarray(cp_frames.quats), np.asarray(dense_frames.quats), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(cp_frames.trans), np.asarray(dense_frames.trans), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cp_tors), np.asarray(dense_tors), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(cp_feat), np.asarray(dense_feat), atol=2e-4
    )


def test_ring_sharded_layer_matches_dense():
    """Ring CP: queries sharded on N and hopping the ring with their
    online-softmax state; neighbour blocks resident, sharded on NP."""
    batch = prepare_batch(synthetic_batch(batch_size=4, seed=9))
    params = init_score_network(jax.random.key(0), CONFIG)["gnn1"]
    B, N = batch["mask"].shape
    Pk = batch["pocket_mask"].shape[-1]
    NP = N + Pk

    h = jnp.concatenate(
        (batch["features"], jnp.full((B, N, 1), 0.5, jnp.float32)), axis=-1
    )
    pocket_h = jnp.concatenate(
        (batch["pocket_features"], jnp.zeros((B, Pk, 1), jnp.float32)), axis=-1
    )
    mask = batch["mask"].astype(jnp.float32)
    pocket_mask = batch["pocket_mask"].astype(jnp.float32)
    edge_pre = relpos_edge_pre(params, CONFIG.max_len)

    dense_frames, dense_tors, dense_feat = egnn_forward(
        params, batch["frames"], batch["torsions"], h, edge_pre, mask,
        pocket_h, batch["pocket_frames"], pocket_mask,
    )

    h_all = jnp.concatenate((h, pocket_h), axis=-2)
    q_all = jnp.concatenate(
        (batch["frames"].quats, batch["pocket_frames"].quats), axis=-2
    )
    t_all = jnp.concatenate(
        (batch["frames"].trans, batch["pocket_frames"].trans), axis=-2
    )
    not_self = 1.0 - jnp.eye(N, dtype=jnp.float32)
    msg_mask = jnp.concatenate(
        (
            mask[:, :, None] * mask[:, None, :] * not_self,
            mask[:, :, None] * pocket_mask[:, None, :],
        ),
        axis=-1,
    )
    edge_full = jnp.pad(edge_pre, ((0, 0), (0, Pk), (0, 0)))

    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("cp",))
    assert N % 8 == 0 and NP % 8 == 0

    @jax.jit
    def sharded(params, frames, torsions, h, edge_full, msg_mask, h_all, q_all, t_all):
        fn = shard_map(
            lambda p, fq, ft, tors, hh, e, mm, ha, qa, ta: egnn_forward_ring(
                p, RigidArray(fq, ft), tors, hh, e, mm, ha,
                RigidArray(qa, ta), "cp",
            ),
            mesh=mesh,
            in_specs=(
                P(),  # params
                P(None, "cp"), P(None, "cp"),  # peptide quats/trans: N sharded
                P(None, "cp"),  # torsions [B, N, 7, 2]
                P(None, "cp"),  # h [B, N, H]
                P(None, "cp", None),  # edge_full [N, NP, T]: NP resident
                P(None, None, "cp"),  # msg_mask [B, N, NP]: NP resident
                P(None, "cp", None),  # h_all [B, NP, H]
                P(None, "cp", None),  # q_all
                P(None, "cp", None),  # t_all
            ),
            out_specs=(P(None, "cp"), P(None, "cp"), P(None, "cp")),
        )
        return fn(
            params, frames.quats, frames.trans, torsions, h, edge_full,
            msg_mask, h_all, q_all, t_all,
        )

    ring_frames, ring_tors, ring_feat = sharded(
        params, batch["frames"], batch["torsions"], h, edge_full, msg_mask,
        h_all, q_all, t_all,
    )

    np.testing.assert_allclose(
        np.asarray(ring_frames.quats), np.asarray(dense_frames.quats), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(ring_frames.trans), np.asarray(dense_frames.trans), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ring_tors), np.asarray(dense_tors), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ring_feat), np.asarray(dense_feat), atol=2e-4
    )

    # the ring is DIFFERENTIABLE: the static-bound fori_loop lowers to a
    # scan and JAX reverse-differentiates through the ppermute ring, so
    # context-parallel TRAINING needs no custom VJP. Parameter gradients
    # of a mixed scalar loss match the dense layer's per-leaf to 1e-3
    # relative (absolute floor for numerically-zero grads).
    def dense_loss(p):
        f, t, n = egnn_forward(
            p, batch["frames"], batch["torsions"], h, edge_pre, mask,
            pocket_h, batch["pocket_frames"], pocket_mask,
        )
        return jnp.sum(f.trans ** 2) + jnp.sum(t) + jnp.sum(n)

    def ring_loss(p):
        f, t, n = sharded(
            p, batch["frames"], batch["torsions"], h, edge_full, msg_mask,
            h_all, q_all, t_all,
        )
        return jnp.sum(f.trans ** 2) + jnp.sum(t) + jnp.sum(n)

    g_dense = jax.jit(jax.grad(dense_loss))(params)
    g_ring = jax.jit(jax.grad(ring_loss))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_dense), jax.tree_util.tree_leaves(g_ring)
    ):
        a, b = np.asarray(a), np.asarray(b)
        tol = max(1e-3 * float(np.abs(a).max()), 5e-6)
        np.testing.assert_allclose(b, a, atol=tol)
