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


# ---------------------------------------------------------------------------
# End-to-end CP wiring (round 2): backend="cp"/"ring" through
# score_network_forward, the shard_map'd Trainer path, and the CP sampler.
# ---------------------------------------------------------------------------

import pytest

from pmhc_tpu.diffusion import DiffusionConfig, gen_noise, sample, sample_sharded
from pmhc_tpu.models import score_network_forward
from pmhc_tpu.parallel import make_mesh
from pmhc_tpu.train import Trainer, TrainConfig


@pytest.mark.parametrize("backend", ["cp", "ring"])
def test_score_forward_cp_backend_matches_dense(backend):
    """Full 2-layer score network with the neighbour axis sharded over a
    DP(2) x CP(4) mesh equals the dense forward."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    batch = prepare_batch(synthetic_batch(batch_size=8, seed=3))
    params = init_score_network(jax.random.key(0), CONFIG)
    t = jnp.asarray(500, jnp.int32)
    dense = score_network_forward(params, batch, t, CONFIG)

    mesh = make_mesh(n_data=2, n_context=4)
    cfg = ScoreNetworkConfig(backend=backend)

    def fwd(params, batch, t):
        out = score_network_forward(params, batch, t, cfg)
        return out["frames"].quats, out["frames"].trans, out["torsions"]

    batch_specs = jax.tree_util.tree_map(lambda _: P("data"), batch)
    sharded = jax.jit(shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), batch_specs, P()),
        out_specs=(P("data"), P("data"), P("data")),
    ))
    q, tr, tor = sharded(params, batch, t)
    np.testing.assert_allclose(
        np.asarray(q), np.asarray(dense["frames"].quats), atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(tr), np.asarray(dense["frames"].trans), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(tor), np.asarray(dense["torsions"]), atol=2e-4)


@pytest.mark.parametrize("backend", ["cp", "ring"])
def test_cp_train_step_matches_single_device(backend):
    """Three SGD steps on the DP(2) x CP(4) shard_map train step track the
    single-device step on the same global batches: the CP step draws
    timestep/noise at GLOBAL batch shape and slices per shard, so the math
    is identical to f32 tolerance. (SGD, not Adam: params stay LINEAR in
    the gradients, so f32 summation-order noise on near-zero-gradient
    components cannot be sign-amplified into lr-sized update diffs the way
    Adam's g/sqrt(g^2) first step amplifies it.)"""
    import optax

    from pmhc_tpu.models import init_score_network
    from pmhc_tpu.train.trainer import make_train_step

    batches = [prepare_batch(synthetic_batch(batch_size=8, seed=s))
               for s in range(3)]
    # small stable lr: sgd(0.1) makes this model diverge within 3 steps,
    # and the blow-up amplifies f32 summation noise past any tolerance
    opt = optax.sgd(1e-4)
    dc = DiffusionConfig()

    def fresh():
        # the steps donate params/opt_state/key buffers; each run needs
        # its own copies
        params = init_score_network(jax.random.key(3), CONFIG)
        return params, opt.init(params), jax.random.key(11)

    ref_step = make_train_step(CONFIG, dc, opt)
    p, o, k = fresh()
    ref_sums = None
    for b in batches:
        p, o, k, ref_sums = ref_step(p, o, b, k)
    ref_params = p

    mesh = make_mesh(n_data=2, n_context=4)
    cfg = ScoreNetworkConfig(backend=backend)
    cp_step = make_train_step(cfg, dc, opt, mesh=mesh, context_parallel=True)
    p, o, k = fresh()
    for b in batches:
        p, o, k, sums = cp_step(p, o, b, k)

    # loss sums of the final step agree (global psum == dense sum)
    for name in ref_sums:
        np.testing.assert_allclose(
            float(sums[name]), float(ref_sums[name]), rtol=2e-4, atol=1e-5,
            err_msg=name,
        )
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(ref_params)[0],
        jax.tree_util.tree_leaves(p),
    ):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(
            b, a, atol=max(1e-5 * float(np.abs(a).max()), 1e-6),
            err_msg=jax.tree_util.keystr(path),
        )


def test_trainer_cp_adam_first_step_metrics_match():
    """Trainer-level CP path (Adam): the FIRST step's loss sums equal the
    single-device trainer's (identical params, t, noise); later steps are
    only smoke-checked — Adam's sign-like first-step update amplifies f32
    noise on zero-gradient components, so long-horizon param equality is
    not a meaningful invariant."""
    batches = [synthetic_batch(batch_size=8, seed=s) for s in range(3)]

    ref = Trainer(CONFIG, DiffusionConfig(), TrainConfig(seed=7))
    ref_sums = ref.train_batch(batches[0])

    mesh = make_mesh(n_data=2, n_context=4)
    cp = Trainer(
        ScoreNetworkConfig(backend="cp"), DiffusionConfig(),
        TrainConfig(seed=7), mesh=mesh, context_parallel=True,
    )
    sums = cp.train_batch(batches[0])
    for name in ref_sums:
        np.testing.assert_allclose(
            float(sums[name]), float(ref_sums[name]), rtol=2e-4, atol=1e-5,
            err_msg=name,
        )
    for b in batches[1:]:
        sums = cp.train_batch(b)
    assert bool(jnp.isfinite(sums["total loss"]))


def test_trainer_cp_scan_matches_step():
    """The K-step scan variant of the CP trainer equals K sequential CP
    steps (same RNG advancement)."""
    batches = [synthetic_batch(batch_size=8, seed=s) for s in range(2)]
    mesh = make_mesh(n_data=2, n_context=4)
    cfg = ScoreNetworkConfig(backend="cp")

    a = Trainer(cfg, DiffusionConfig(), TrainConfig(seed=1), mesh=mesh,
                context_parallel=True)
    for b in batches:
        a.train_batch(b)

    b_tr = Trainer(cfg, DiffusionConfig(), TrainConfig(seed=1), mesh=mesh,
                   context_parallel=True)
    b_tr.train_batches(batches)

    for x, y in zip(jax.tree_util.tree_leaves(a.params),
                    jax.tree_util.tree_leaves(b_tr.params)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("backend", ["cp", "ring"])
def test_sample_sharded_matches_dense(backend):
    """The CP sampler (whole scan inside shard_map) is bit-compatible with
    the dense sampler on the same global batch and key."""
    dc = DiffusionConfig(noise_step_count=8)
    batch = prepare_batch(synthetic_batch(batch_size=8, seed=5))
    noise = gen_noise(jax.random.key(1), batch["frames"].shape, dc)
    batch["frames"] = noise["frames"]
    batch["torsions"] = noise["torsions"]
    params = init_score_network(jax.random.key(0), CONFIG)
    key = jax.random.key(2)

    dense_cfg = ScoreNetworkConfig(noise_step_count=dc.noise_step_count)
    dense = jax.jit(
        lambda p, b, k: sample(p, b, k, dc, dense_cfg)
    )(params, batch, key)

    mesh = make_mesh(n_data=2, n_context=4)
    cp_cfg = ScoreNetworkConfig(
        noise_step_count=dc.noise_step_count, backend=backend)
    out = sample_sharded(params, batch, key, dc, cp_cfg, mesh)

    np.testing.assert_allclose(
        np.asarray(out["frames"].trans), np.asarray(dense["frames"].trans),
        atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["frames"].quats), np.asarray(dense["frames"].quats),
        atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out["torsions"]), np.asarray(dense["torsions"]), atol=2e-4)


def test_sample_sharded_strided_matches_dense():
    """--sample-steps through the CP sampler: bit-compatible with the
    dense strided sampler on the same global batch and key."""
    dc = DiffusionConfig(noise_step_count=8)
    batch = prepare_batch(synthetic_batch(batch_size=8, seed=5))
    noise = gen_noise(jax.random.key(1), batch["frames"].shape, dc)
    batch["frames"] = noise["frames"]
    batch["torsions"] = noise["torsions"]
    params = init_score_network(jax.random.key(0), CONFIG)
    key = jax.random.key(2)

    dense_cfg = ScoreNetworkConfig(noise_step_count=dc.noise_step_count)
    dense = jax.jit(
        lambda p, b, k: sample(p, b, k, dc, dense_cfg, num_steps=3)
    )(params, batch, key)

    mesh = make_mesh(n_data=2, n_context=4)
    cp_cfg = ScoreNetworkConfig(
        noise_step_count=dc.noise_step_count, backend="cp")
    out = sample_sharded(params, batch, key, dc, cp_cfg, mesh, num_steps=3)

    np.testing.assert_allclose(
        np.asarray(out["frames"].trans), np.asarray(dense["frames"].trans),
        atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out["frames"].quats), np.asarray(dense["frames"].quats),
        atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(out["torsions"]), np.asarray(dense["torsions"]), atol=2e-4)
