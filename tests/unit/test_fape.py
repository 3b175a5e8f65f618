"""FAPE properties: zero at identity, invariant to global rigid motion."""

import jax
import jax.numpy as jnp
import numpy as np

from pmhc_tpu.geometry import RigidArray, compute_fape, random_quat


def _structure(key, B=2, F=9, A=30):
    k1, k2, k3 = jax.random.split(key, 3)
    frames = RigidArray(random_quat(k1, (B, F)), jax.random.normal(k2, (B, F, 3)) * 5)
    points = jax.random.normal(k3, (B, A, 3)) * 5
    return frames, points


def test_fape_zero_for_identical():
    frames, points = _structure(jax.random.key(0))
    mask_f = jnp.ones(frames.shape)
    mask_p = jnp.ones(points.shape[:-1])
    fape = compute_fape(frames, frames, mask_f, points, points, mask_p)
    np.testing.assert_allclose(np.asarray(fape), 0.0, atol=1e-3)


def test_fape_invariant_to_global_motion():
    # a globally rotated+translated copy of a structure has FAPE 0 against
    # the original: the error is measured in frame-local coordinates
    frames, points = _structure(jax.random.key(1))
    k1, k2 = jax.random.split(jax.random.key(2))
    g = RigidArray(random_quat(k1, (1, 1)), jax.random.normal(k2, (1, 1, 3)) * 10)

    moved_frames = g.compose(frames)
    moved_points = RigidArray(g.quats, g.trans).apply(points)

    mask_f = jnp.ones(frames.shape)
    mask_p = jnp.ones(points.shape[:-1])
    fape = compute_fape(moved_frames, frames, mask_f, moved_points, points, mask_p)
    np.testing.assert_allclose(np.asarray(fape), 0.0, atol=1e-3)


def test_fape_clamp():
    frames, points = _structure(jax.random.key(3))
    mask_f = jnp.ones(frames.shape)
    mask_p = jnp.ones(points.shape[:-1])
    # huge deviation: clamped FAPE == clamp/length_scale
    fape = compute_fape(
        frames, frames, mask_f, points, points + 1e4, mask_p,
        length_scale=10.0, l1_clamp_distance=10.0,
    )
    np.testing.assert_allclose(np.asarray(fape), 1.0, atol=1e-4)