"""Trainer tests: loss decreases, DP sharding equals single device,
checkpoint round-trip (SURVEY.md §4 tiers 3-4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.diffusion import DiffusionConfig
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.parallel import make_mesh
from pmhc_tpu.train import MetricsRecord, Trainer, TrainConfig
from pmhc_tpu.train.trainer import prepare_batch

MODEL_CONFIG = ScoreNetworkConfig()
# short schedule for test speed; math is identical at any T
DIFF_CONFIG = DiffusionConfig(noise_step_count=10)


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(batch_size=8, seed=0)


def test_train_step_runs_and_metrics_accumulate(batch):
    trainer = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=1))
    metrics = MetricsRecord()
    for _ in range(3):
        trainer.train_batch(batch, metrics)
    means = metrics.mean()
    assert set(means) == {
        "total loss", "positions loss", "rotations loss", "torsions loss", "rmsd",
    }
    assert all(np.isfinite(v) for v in means.values())
    assert not metrics.has_nan()


def test_grad_clip_norm_bounds_update(batch):
    """Opt-in clipping (TrainConfig.grad_clip_norm) bounds the Adam
    moment build-up: with an aggressive clip the first-step update is
    identical in DIRECTION but the clipped gradients must differ from
    the unclipped ones wherever the global norm exceeds the bound."""
    unclipped = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=3))
    clipped = Trainer(
        MODEL_CONFIG, DIFF_CONFIG,
        TrainConfig(seed=3, grad_clip_norm=1e-3),
    )
    lu = float(unclipped.train_batch(batch)["total loss"])
    lc = float(clipped.train_batch(batch)["total loss"])
    # same params/key/batch -> identical forward loss
    assert lu == pytest.approx(lc, rel=1e-6)
    # the clipped Adam second moments are tiny vs unclipped (clip fired)
    import jax.tree_util as jtu

    def maxleaf(tree):
        return max(float(jnp.max(jnp.abs(x))) for x in jtu.tree_leaves(tree))

    # locate the adam ScaleByAdamState in each chain (clipped wraps it)
    def adam_nu(opt_state):
        for s in jtu.tree_leaves(opt_state, is_leaf=lambda x: hasattr(x, "nu")):
            if hasattr(s, "nu"):
                return s.nu
        raise AssertionError("no adam state found")

    assert maxleaf(adam_nu(clipped.opt_state)) < maxleaf(
        adam_nu(unclipped.opt_state)) * 1e-2


def test_ema_params_track_with_decay(batch):
    """TrainConfig.ema_decay maintains ema = d*ema + (1-d)*params inside
    the optimizer state (train/ema.py); verified against a manual
    recomputation over 3 steps."""
    import jax.tree_util as jtu

    trainer = Trainer(
        MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=5, ema_decay=0.5))
    host = lambda tree: jtu.tree_map(np.asarray, tree)  # params buffers
    manual = host(trainer.params)  # are donated into the next step
    history = []
    for _ in range(3):
        trainer.train_batch(batch)
        history.append(host(trainer.params))
    for p in history:
        manual = jtu.tree_map(lambda e, q: 0.5 * e + 0.5 * q, manual, p)
    got = trainer.ema_params
    assert got is not None
    for a, b in zip(jtu.tree_leaves(got), jtu.tree_leaves(manual)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # ema differs from the raw params (it lags)
    diffs = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jtu.tree_leaves(got), jtu.tree_leaves(trainer.params))
    ]
    assert max(diffs) > 1e-5

    # no-ema trainer exposes None
    assert Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=5)).ema_params is None


def test_loss_decreases_on_fixed_batch(batch):
    trainer = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=2, learning_rate=3e-3))
    first = float(trainer.train_batch(batch)["total loss"])
    last = first
    for _ in range(30):
        last = float(trainer.train_batch(batch)["total loss"])
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_dp_sharded_gradients_match_single_device(batch):
    """The core multi-device correctness property: gradients of the global
    batch-mean loss under GSPMD sharding over the 8-device CPU mesh equal
    the single-device gradients (identical injected noise)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pmhc_tpu.diffusion import ScheduleTables, add_noise, diffusion_loss, gen_noise
    from pmhc_tpu.models import init_score_network, score_network_forward

    mesh = make_mesh()
    assert mesh.devices.size == 8

    params = init_score_network(jax.random.key(10), MODEL_CONFIG)
    tables = ScheduleTables(DIFF_CONFIG)
    model_batch = prepare_batch(batch)
    epsilon = gen_noise(jax.random.key(11), model_batch["frames"].shape, DIFF_CONFIG)

    def loss(p, b, eps):
        zt = add_noise(b, eps, 5, tables)
        pred = score_network_forward(p, zt, 5, MODEL_CONFIG)
        losses = diffusion_loss(eps, pred, b["mask"], b["torsions_mask"])
        return jnp.mean(losses["total loss"])

    grad_single = jax.jit(jax.grad(loss))(params, model_batch, epsilon)

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    shard = lambda tree: jax.tree_util.tree_map(lambda _: data, tree)
    grad_sharded = jax.jit(
        jax.grad(loss),
        in_shardings=(repl, shard(model_batch), shard(epsilon)),
        out_shardings=repl,
    )(params, model_batch, epsilon)

    for a, b in zip(
        jax.tree_util.tree_leaves(grad_single), jax.tree_util.tree_leaves(grad_sharded)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_sharded_training_tracks_single_device(batch):
    """Full Adam steps under sharding stay close to single-device (exact
    equality is not expected: all-reduce order perturbs near-zero grads,
    which Adam's scale-free update amplifies)."""
    mesh = make_mesh()
    t_single = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=3))
    t_sharded = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=3), mesh=mesh)

    for _ in range(2):
        s_single = t_single.train_batch(batch)
        s_sharded = t_sharded.train_batch(batch)

    np.testing.assert_allclose(
        float(s_single["total loss"]), float(s_sharded["total loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(t_single.params),
        jax.tree_util.tree_leaves(t_sharded.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_tp_sharded_training_tracks_single_device(batch):
    """Tensor parallelism (MLP transition dim sharded on 'model', params
    committed to the Megatron column/row layout of tp_param_shardings)
    plus data parallelism on a 2x4 mesh equals single-device training to
    the same tolerance as the DP-only test."""
    mesh = make_mesh(n_data=2, n_model=4)
    t_single = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=3))
    t_tp = Trainer(
        MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=3), mesh=mesh,
        tensor_parallel=True,
    )

    # the layout actually shards: lin1.w on its output (transition) dim,
    # and the jit-propagated Adam moments carry the same layout
    w_spec = t_tp.params["gnn1"]["message"]["lin1"]["w"].sharding.spec
    assert "model" in tuple(w_spec), w_spec
    mu_leaves = [
        x for x in jax.tree_util.tree_leaves(t_tp.opt_state)
        if getattr(x, "ndim", 0) == 2 and x.shape[-1] == 64
    ]
    assert any("model" in tuple(x.sharding.spec) for x in mu_leaves)

    for _ in range(2):
        s_single = t_single.train_batch(batch)
        s_tp = t_tp.train_batch(batch)

    np.testing.assert_allclose(
        float(s_single["total loss"]), float(s_tp["total loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(t_single.params),
        jax.tree_util.tree_leaves(t_tp.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_per_sample_t_variant(batch):
    cfg = DiffusionConfig(noise_step_count=10, t_per_batch=False)
    trainer = Trainer(MODEL_CONFIG, cfg, TrainConfig(seed=4))
    sums = trainer.train_batch(batch)
    assert np.isfinite(float(sums["total loss"]))


def test_checkpoint_roundtrip(tmp_path, batch):
    from pmhc_tpu.train.checkpoints import CheckpointManager

    trainer = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=5))
    trainer.train_batch(batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(1, trainer.params, trainer.opt_state, trainer.key)
    mgr.wait()

    fresh_params = init_score_network(jax.random.key(99), MODEL_CONFIG)
    fresh_opt = trainer.optimizer.init(fresh_params)
    params, opt_state, key, step = mgr.restore(fresh_params, fresh_opt)
    assert step == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.params), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_under_tp(tmp_path, batch):
    """Orbax save from a TP-sharded trainer restores into a fresh
    TP-sharded trainer with values intact, shardings preserved (the
    restore target carries them), and training continues."""
    from pmhc_tpu.train.checkpoints import CheckpointManager

    mesh = make_mesh(n_data=2, n_model=4)
    t1 = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=5), mesh=mesh,
                 tensor_parallel=True)
    t1.train_batch(batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt_tp"))
    mgr.save(1, t1.params, t1.opt_state, t1.key)
    mgr.wait()

    t2 = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=99), mesh=mesh,
                 tensor_parallel=True)
    t2.params, t2.opt_state, t2.key, step = mgr.restore(t2.params, t2.opt_state)
    assert step == 1
    w = t2.params["gnn1"]["message"]["lin1"]["w"]
    assert "model" in tuple(w.sharding.spec), w.sharding.spec
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored state is trainable and tracks the original trainer
    s1 = t1.train_batch(batch)
    s2 = t2.train_batch(batch)
    np.testing.assert_allclose(
        float(s1["total loss"]), float(s2["total loss"]), rtol=1e-5
    )


def test_torch_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from pmhc_tpu.models.import_torch import export_torch_checkpoint, import_torch_checkpoint

    params = init_score_network(jax.random.key(0), MODEL_CONFIG)
    path = str(tmp_path / "model.pth")
    export_torch_checkpoint(params, path)
    back = import_torch_checkpoint(path)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_under_cp(tmp_path, batch):
    """Orbax save/restore through the CP (shard_map) trainer path: the
    opt_state the CP CLI would save restores into a fresh CP trainer and
    training continues (VERDICT r2 weak #5)."""
    from pmhc_tpu.train.checkpoints import CheckpointManager

    from pmhc_tpu.parallel import batch_sharding

    cp_model = ScoreNetworkConfig(backend="cp")
    mesh = make_mesh(n_data=2, n_context=4)
    # like the CLI: batches are device_put against the mesh sharding, so
    # they compose with mesh-committed (Orbax-restored) params
    cp_batch = jax.device_put(
        {k: v for k, v in batch.items() if k != "name"}, batch_sharding(mesh)
    )
    t1 = Trainer(cp_model, DIFF_CONFIG, TrainConfig(seed=5), mesh=mesh,
                 context_parallel=True)
    t1.train_batch(cp_batch)

    mgr = CheckpointManager(str(tmp_path / "ckpt_cp"))
    mgr.save(1, t1.params, t1.opt_state, t1.key)
    mgr.wait()

    t2 = Trainer(cp_model, DIFF_CONFIG, TrainConfig(seed=99), mesh=mesh,
                 context_parallel=True)
    t2.params, t2.opt_state, t2.key, step = mgr.restore(t2.params, t2.opt_state)
    assert step == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(t1.params), jax.tree_util.tree_leaves(t2.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state trains onward
    sums = t2.train_batch(cp_batch)
    assert np.isfinite(float(sums["total loss"]))


def test_dp_tp_cp_training_tracks_single_device(batch):
    """DP x TP x CP as ONE GSPMD jit on a 2x2x2 mesh: the xla-backend
    forward with neighbour-axis sharding constraints
    (models/egnn.py::neighbour_shardings) composed with the Megatron TP
    layout equals single-device training to the DP/TP tolerances."""
    mesh = make_mesh(n_data=2, n_model=2, n_context=2)
    t_single = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=3))
    t_3ax = Trainer(
        MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=3), mesh=mesh,
        tensor_parallel=True, context_parallel=True,
    )
    w_spec = t_3ax.params["gnn1"]["message"]["lin1"]["w"].sharding.spec
    assert "model" in tuple(w_spec), w_spec

    for _ in range(2):
        s_single = t_single.train_batch(batch)
        s_3ax = t_3ax.train_batch(batch)

    np.testing.assert_allclose(
        float(s_single["total loss"]), float(s_3ax["total loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(t_single.params),
        jax.tree_util.tree_leaves(t_3ax.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_grad_accum_defers_update(batch):
    """TrainConfig.grad_accum=K (optax.MultiSteps): parameters must be
    bit-unchanged for the first K-1 micro-batches, then update on the
    K-th; the EMA extraction and metric accumulation flow through the
    wrapped optimizer state unchanged."""
    trainer = Trainer(
        MODEL_CONFIG, DIFF_CONFIG,
        TrainConfig(seed=11, grad_accum=2, ema_decay=0.9),
    )
    p0 = jax.tree_util.tree_map(np.asarray, trainer.params)
    metrics = MetricsRecord()
    trainer.train_batch(batch, metrics)  # micro-step 1: accumulate only
    for a, b in zip(
        jax.tree_util.tree_leaves(p0),
        jax.tree_util.tree_leaves(trainer.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    trainer.train_batch(batch, metrics)  # micro-step 2: apply the update
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(p0),
            jax.tree_util.tree_leaves(trainer.params),
        )
    )
    assert moved
    # EMA rides inside the MultiSteps-wrapped state
    assert trainer.ema_params is not None
    assert all(np.isfinite(v) for v in metrics.mean().values())


def test_grad_accum_matches_manual_mean_gradient(batch):
    """The K-th micro-step's update equals applying the inner optimizer
    to the MEAN of the K accumulated gradients: replay the two
    micro-steps' (key, grad) sequence by hand through a fresh Adam."""
    import optax

    cfg = TrainConfig(seed=17, grad_accum=2)
    trainer = Trainer(MODEL_CONFIG, DIFF_CONFIG, cfg)
    p0 = trainer.params
    model_batch = prepare_batch(batch)

    # manual replay: same key evolution as two step_fn calls, grads
    # averaged, one Adam update
    from pmhc_tpu.diffusion.loss import diffusion_loss
    from pmhc_tpu.diffusion.noise import add_noise, gen_noise
    from pmhc_tpu.diffusion.schedule import ScheduleTables
    from pmhc_tpu.models import score_network_forward

    tables = ScheduleTables(DIFF_CONFIG)
    T = DIFF_CONFIG.noise_step_count

    def one_grad(params, key):
        key, key_t, key_eps = jax.random.split(key, 3)
        t = jax.random.randint(key_t, (), 0, T)
        eps = gen_noise(key_eps, model_batch["frames"].shape, DIFF_CONFIG)

        def loss_fn(p):
            zt = add_noise(model_batch, eps, t, tables)
            pred = score_network_forward(p, zt, t, MODEL_CONFIG)
            losses = diffusion_loss(
                eps, pred, model_batch["mask"], model_batch["torsions_mask"],
                DIFF_CONFIG.position_loss_weight,
                DIFF_CONFIG.rotation_loss_weight,
                DIFF_CONFIG.torsion_loss_weight)
            return jnp.mean(losses["total loss"])

        return jax.grad(loss_fn)(params), key

    g1, key = one_grad(p0, trainer.key)
    g2, _ = one_grad(p0, key)  # params unchanged during accumulation
    # optax.MultiSteps accumulates a RUNNING mean (acc += (g-acc)/(n+1))
    mean_grad = jax.tree_util.tree_map(lambda a, b: a + (b - a) / 2, g1, g2)
    adam = optax.adam(cfg.learning_rate)
    updates, _ = adam.update(mean_grad, adam.init(p0), p0)
    expected = optax.apply_updates(p0, updates)

    trainer.train_batch(batch)
    # strong check, at the gradient level: after micro-step 1 the
    # MultiSteps accumulator holds exactly the first batch's gradient
    acc = trainer.opt_state.acc_grads
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(acc)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
    trainer.train_batch(batch)
    # post-Adam params: the first-step update is sign-like
    # (lr * g/(|g|+eps)), so f32 jit-vs-replay gradient noise on
    # near-zero elements can flip an element by up to ~lr — bound by
    # lr/2 elementwise and require near-exactness in aggregate
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(
            jax.tree_util.tree_leaves(expected),
            jax.tree_util.tree_leaves(trainer.params),
        )
    ])
    assert diffs.max() < cfg.learning_rate / 2
    assert np.quantile(diffs, 0.9) < 1e-6


def test_eval_batch_deterministic_and_pure(batch):
    """eval_batch: same key -> bit-identical sums; no trainer state is
    mutated; the measurement moves once the parameters move."""
    trainer = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=7))
    key = jax.random.key(5)
    k0 = np.asarray(jax.random.key_data(trainer.key))
    metrics = MetricsRecord()
    s1 = trainer.eval_batch(batch, key, metrics)
    s2 = trainer.eval_batch(batch, key)
    for name in s1:
        assert float(s1[name]) == float(s2[name])
        assert np.isfinite(float(s1[name]))
    np.testing.assert_array_equal(
        k0, np.asarray(jax.random.key_data(trainer.key)))
    assert len(metrics) == batch["mask"].shape[0]
    for _ in range(3):
        trainer.train_batch(batch)
    s3 = trainer.eval_batch(batch, key)
    assert float(s3["total loss"]) != float(s1["total loss"])


def test_eval_batch_under_cp_uses_xla_backend(batch):
    """The cp backend binds a mesh axis inside shard_map; eval_batch
    must transparently evaluate on the xla backend and still produce
    finite, deterministic sums."""
    mesh = make_mesh(n_data=4, n_context=2)
    cp_model = ScoreNetworkConfig(backend="cp")
    trainer = Trainer(cp_model, DIFF_CONFIG, TrainConfig(seed=7), mesh=mesh,
                      context_parallel=True)
    key = jax.random.key(9)
    s1 = trainer.eval_batch(batch, key)
    s2 = trainer.eval_batch(batch, key)
    assert float(s1["total loss"]) == float(s2["total loss"])
    assert np.isfinite(float(s1["total loss"]))
