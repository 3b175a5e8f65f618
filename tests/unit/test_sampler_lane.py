"""Lane-layout sampler (pmhc_tpu/diffusion/sampler_lane.py): with
identical injected per-step noise, the full trajectory matches the
generic scan sampler running the same fused kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.diffusion import DiffusionConfig, ScheduleTables, gen_noise, sample
from pmhc_tpu.diffusion.sampler_lane import sample_lane
from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
from pmhc_tpu.train.trainer import prepare_batch

CONFIG = DiffusionConfig(noise_step_count=4)


def _noised_batch(key, batch_size=3):
    batch = prepare_batch(synthetic_batch(batch_size=batch_size, seed=5))
    noise = gen_noise(key, batch["frames"].shape, CONFIG)
    batch["frames"] = noise["frames"]
    batch["torsions"] = noise["torsions"]
    return batch


def _injected(key, shape):
    """Per-step noise with a leading [T] axis (index 0 used at t=T)."""
    keys = jax.random.split(key, CONFIG.noise_step_count)
    return jax.vmap(lambda k: gen_noise(k, shape, CONFIG))(keys)


import pytest


@pytest.mark.parametrize("g8", [False, True])
def test_lane_sampler_matches_generic_with_injected_noise(g8):
    model_config = ScoreNetworkConfig(
        noise_step_count=CONFIG.noise_step_count, backend="pallas_lane",
        lane_block=128,
    )
    params = init_score_network(jax.random.key(2), model_config)
    batch = _noised_batch(jax.random.key(11))
    tables = ScheduleTables(CONFIG)
    inj = _injected(jax.random.key(13), batch["frames"].shape)

    generic = sample(
        params, batch, jax.random.key(0), CONFIG, model_config, tables,
        injected_noise=inj,
    )
    lane = sample_lane(
        params, batch, jax.random.key(0), CONFIG, model_config, tables,
        injected_noise=inj, interpret=True, g8=g8,
    )

    np.testing.assert_allclose(
        np.asarray(lane["frames"].quats),
        np.asarray(generic["frames"].quats), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane["frames"].trans),
        np.asarray(generic["frames"].trans), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(lane["torsions"]),
        np.asarray(generic["torsions"]), atol=2e-4)


def test_lane_sampler_own_rng_is_finite_and_unit():
    model_config = ScoreNetworkConfig(
        noise_step_count=CONFIG.noise_step_count, backend="pallas_lane",
        lane_block=128,
    )
    params = init_score_network(jax.random.key(3), model_config)
    batch = _noised_batch(jax.random.key(17))

    out = sample_lane(
        params, batch, jax.random.key(9), CONFIG, model_config,
        interpret=True,
    )
    q = np.asarray(out["frames"].quats)
    assert np.isfinite(q).all()
    assert np.isfinite(np.asarray(out["frames"].trans)).all()
    assert np.isfinite(np.asarray(out["torsions"])).all()
    # the stochastic rotation step composes partial rotations of unit
    # quats, so outputs stay ~unit
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-3)


def test_lane_sampler_g8_batch_grid_matches_generic():
    """B > 256 sends the g8 sampler through the batch-grid path (the
    kernel grid tiles 2048-lane batch chunks; chunk-major *_bg lane
    layouts end-to-end). Same injected noise => same trajectory as the
    generic sampler."""
    model_config = ScoreNetworkConfig(
        noise_step_count=CONFIG.noise_step_count, backend="pallas_lane",
    )
    params = init_score_network(jax.random.key(2), model_config)
    batch = _noised_batch(jax.random.key(19), batch_size=300)  # ragged chunk
    tables = ScheduleTables(CONFIG)
    inj = _injected(jax.random.key(23), batch["frames"].shape)

    generic = sample(
        params, batch, jax.random.key(0), CONFIG, model_config, tables,
        injected_noise=inj,
    )
    lane = sample_lane(
        params, batch, jax.random.key(0), CONFIG, model_config, tables,
        injected_noise=inj, interpret=True, g8=True,
    )

    np.testing.assert_allclose(
        np.asarray(lane["frames"].quats),
        np.asarray(generic["frames"].quats), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane["frames"].trans),
        np.asarray(generic["frames"].trans), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(lane["torsions"]),
        np.asarray(generic["torsions"]), atol=2e-4)


@pytest.mark.parametrize("g8", [False, True])
def test_lane_sampler_strided_matches_generic(g8):
    """--sample-steps path: the lane sampler's strided scan matches the
    generic strided sampler with identical injected per-jump noise."""
    from pmhc_tpu.diffusion import strided_timesteps

    model_config = ScoreNetworkConfig(
        noise_step_count=CONFIG.noise_step_count, backend="pallas_lane",
        lane_block=128,
    )
    params = init_score_network(jax.random.key(2), model_config)
    batch = _noised_batch(jax.random.key(11))
    tables = ScheduleTables(CONFIG)

    K = 2
    n_jumps = len(strided_timesteps(CONFIG.noise_step_count, K)) - 1
    keys = jax.random.split(jax.random.key(13), n_jumps)
    inj = jax.vmap(lambda k: gen_noise(k, batch["frames"].shape, CONFIG))(keys)

    generic = sample(
        params, batch, jax.random.key(0), CONFIG, model_config, tables,
        injected_noise=inj, num_steps=K,
    )
    lane = sample_lane(
        params, batch, jax.random.key(0), CONFIG, model_config, tables,
        injected_noise=inj, interpret=True, g8=g8, num_steps=K,
    )

    np.testing.assert_allclose(
        np.asarray(lane["frames"].quats),
        np.asarray(generic["frames"].quats), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lane["frames"].trans),
        np.asarray(generic["frames"].trans), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(lane["torsions"]),
        np.asarray(generic["torsions"]), atol=2e-4)
