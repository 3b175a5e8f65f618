"""Sampler tests: the lax.scan trajectory equals an eager Python loop over
the same pure functions, and the jitted sampler produces finite output."""

import jax
import jax.numpy as jnp
import numpy as np

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.diffusion import DiffusionConfig, ScheduleTables, gen_noise, remove_noise, sample
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network, score_network_forward
from pmhc_tpu.train.trainer import prepare_batch

MODEL_CONFIG = ScoreNetworkConfig()
CONFIG = DiffusionConfig(noise_step_count=6)


def _noised_batch(key, batch_size=2):
    batch = prepare_batch(synthetic_batch(batch_size=batch_size, seed=1))
    noise = gen_noise(key, batch["frames"].shape, CONFIG)
    batch["frames"] = noise["frames"]
    batch["torsions"] = noise["torsions"]
    return batch


def _eager_sample(params, batch, key, tables):
    """Reference-shaped Python loop (optimizer.py:236-249) over the same
    pure functions the scan uses."""
    state = {"frames": batch["frames"], "torsions": batch["torsions"]}
    static = {k: v for k, v in batch.items() if k not in ("frames", "torsions")}
    t = CONFIG.noise_step_count
    while t > 0:
        model_batch = dict(static, **state)
        pred = score_network_forward(params, model_batch, t, MODEL_CONFIG)
        rand = gen_noise(jax.random.fold_in(key, t), batch["frames"].shape, CONFIG)
        state = remove_noise(state, pred, rand, jnp.asarray(t), t - 1, tables)
        t -= 1
    return state


def test_scan_sampler_matches_eager_loop():
    params = init_score_network(jax.random.key(0), MODEL_CONFIG)
    key = jax.random.key(42)
    batch = _noised_batch(jax.random.key(7))
    tables = ScheduleTables(CONFIG)

    scanned = sample(params, batch, key, CONFIG, MODEL_CONFIG, tables)
    eager = _eager_sample(params, batch, key, tables)

    # tolerances allow for fusion/reassociation differences between the
    # scan-compiled and eager programs (amplified by acos near +/-1)
    np.testing.assert_allclose(
        np.asarray(scanned["frames"].quats), np.asarray(eager["frames"].quats), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(scanned["frames"].trans), np.asarray(eager["frames"].trans), atol=3e-4
    )
    np.testing.assert_allclose(
        np.asarray(scanned["torsions"]), np.asarray(eager["torsions"]), atol=5e-5
    )


def test_sampler_jits_and_is_finite():
    params = init_score_network(jax.random.key(1), MODEL_CONFIG)
    batch = _noised_batch(jax.random.key(8))

    jit_sample = jax.jit(
        lambda p, b, k: sample(p, b, k, CONFIG, MODEL_CONFIG)
    )
    out = jit_sample(params, batch, jax.random.key(3))
    assert np.isfinite(np.asarray(out["frames"].quats)).all()
    assert np.isfinite(np.asarray(out["frames"].trans)).all()
    assert np.isfinite(np.asarray(out["torsions"])).all()
    # output quats should be ~unit after the final model normalization
    norms = np.linalg.norm(np.asarray(out["frames"].quats), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def test_strided_tables_full_grid_matches_schedule_tables():
    """StridedTables on the dense grid [T, T-1, ..., 0] reproduces
    ScheduleTables' s = t-1 pairings bitwise (same f64 host math)."""
    from pmhc_tpu.diffusion import StridedTables, strided_timesteps

    cfg = DiffusionConfig(noise_step_count=50)
    tables = ScheduleTables(cfg)
    ts = strided_timesteps(50, 50)
    np.testing.assert_array_equal(ts, np.arange(50, -1, -1))
    st = StridedTables(cfg, ts)

    t = np.arange(50, 0, -1)
    np.testing.assert_array_equal(np.asarray(st.ts), t)
    np.testing.assert_array_equal(np.asarray(st.beta_t), np.asarray(tables.beta)[t])
    np.testing.assert_array_equal(np.asarray(st.sigma_t), np.asarray(tables.sigma)[t])
    np.testing.assert_array_equal(np.asarray(st.beta_s), np.asarray(tables.beta)[t - 1])
    np.testing.assert_array_equal(np.asarray(st.alpha_ts), np.asarray(tables.alpha_ts)[t])
    np.testing.assert_array_equal(
        np.asarray(st.sqr_sigma_ts), np.asarray(tables.sqr_sigma_ts)[t])
    np.testing.assert_array_equal(
        np.asarray(st.sigma_t2s), np.asarray(tables.sigma_t2s)[t])


def test_strided_sampler_matches_eager_strided_loop():
    """sample(num_steps=K) equals a Python loop over the strided grid
    using remove_noise_scalars — validates the scan wiring."""
    from pmhc_tpu.diffusion import StridedTables, strided_timesteps
    from pmhc_tpu.diffusion.noise import remove_noise_scalars

    params = init_score_network(jax.random.key(0), MODEL_CONFIG)
    key = jax.random.key(42)
    batch = _noised_batch(jax.random.key(7))

    K = 3
    scanned = sample(params, batch, key, CONFIG, MODEL_CONFIG, num_steps=K)

    st = StridedTables(CONFIG, strided_timesteps(CONFIG.noise_step_count, K))
    state = {"frames": batch["frames"], "torsions": batch["torsions"]}
    static = {k: v for k, v in batch.items() if k not in ("frames", "torsions")}
    for k in range(st.num_jumps):
        t = int(st.ts[k])
        model_batch = dict(static, **state)
        pred = score_network_forward(params, model_batch, t, MODEL_CONFIG)
        rand = gen_noise(jax.random.fold_in(key, t), batch["frames"].shape, CONFIG)
        state = remove_noise_scalars(state, pred, rand, *st.scalars(k))

    np.testing.assert_allclose(
        np.asarray(scanned["frames"].quats), np.asarray(state["frames"].quats),
        atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(scanned["frames"].trans), np.asarray(state["frames"].trans),
        atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(scanned["torsions"]), np.asarray(state["torsions"]), atol=5e-5)


def test_strided_sampler_is_finite_and_unit():
    params = init_score_network(jax.random.key(1), MODEL_CONFIG)
    batch = _noised_batch(jax.random.key(8))

    out = jax.jit(
        lambda p, b, k: sample(p, b, k, CONFIG, MODEL_CONFIG, num_steps=2)
    )(params, batch, jax.random.key(3))
    assert np.isfinite(np.asarray(out["frames"].quats)).all()
    assert np.isfinite(np.asarray(out["frames"].trans)).all()
    assert np.isfinite(np.asarray(out["torsions"])).all()
    norms = np.linalg.norm(np.asarray(out["frames"].quats), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
