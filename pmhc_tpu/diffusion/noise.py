"""Forward (noising) and reverse (denoising) processes.

Pure-function twins of reference ``gen_noise`` / ``add_noise`` /
``remove_noise`` (``diffusion/optimizer.py:93-193``), quat-native: rotation
composition is a Hamilton product, so — unlike the reference, whose
``compose_r`` produces matrix-backed rotations that trigger a 4x4 eigh on
every subsequent quat read (SURVEY.md §3.5.4) — nothing here ever leaves
quaternion space.

RNG: explicit jax.random keys. ``gen_noise`` is key-driven and all
derived functions accept a pre-generated noise pytree, so parity tests can
inject the exact draws the torch reference saw (SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from pmhc_tpu.geometry import (
    RigidArray,
    inverse_sin_cos,
    multiply_sin_cos,
    partial_rot,
    partial_sin_cos,
    quat_invert,
    quat_multiply,
    random_quat,
    random_sin_cos,
)
from pmhc_tpu.diffusion.schedule import DiffusionConfig, ScheduleTables

Noise = Dict[str, Any]  # {"frames": RigidArray, "torsions": [..., 7, 2]}


def gen_noise(key: jax.Array, shape, config: DiffusionConfig) -> Noise:
    """Pure noise sample for batch shape ``shape`` (e.g. (B, N)).

    Mirrors ``optimizer.py:93-108``: translations ~ N(0, scale^2) with
    scale 5.0, rotations uniform on SO(3) via Shoemake, torsions uniform
    angles as (sin, cos).
    """
    kp, kq, kt = jax.random.split(key, 3)
    shape = tuple(shape)
    trans = (
        jax.random.normal(kp, shape + (3,), dtype=jnp.float32)
        * config.position_noise_scale
    )
    quats = random_quat(kq, shape)
    torsions = random_sin_cos(kt, shape + (7,))
    return {"frames": RigidArray(quats, trans), "torsions": torsions}


def add_noise(
    signal: Dict[str, Any],
    noise: Noise,
    t,
    tables: ScheduleTables,
) -> Dict[str, Any]:
    """Forward process x0 -> z_t (one jump, not cumulative).

    Mirrors ``optimizer.py:110-138``: torsions get a beta-fraction of the
    noise angle multiplied on; positions interpolate signal*alpha +
    noise*sigma; rotations get a beta-fraction of the noise rotation
    composed on the left.

    ``t`` may be a scalar (the reference's one-t-per-batch quirk) or a
    [B]-shaped array (per-sample timesteps, the documented deviation
    behind ``DiffusionConfig.t_per_batch=False``).
    """
    beta, alpha, sigma = tables.beta_alpha_sigma(t)

    sig_frames: RigidArray = signal["frames"]
    noise_frames: RigidArray = noise["frames"]

    def bcast(x, target_ndim):
        # scalar -> scalar; [B] -> [B, 1, ..., 1] aligned to leading axis
        if x.ndim == 0:
            return x
        return x.reshape(x.shape + (1,) * (target_ndim - 1))

    torsions = multiply_sin_cos(
        partial_sin_cos(noise["torsions"], bcast(beta, 4)), signal["torsions"]
    )
    pos = sig_frames.trans * bcast(alpha, 3) + noise_frames.trans * bcast(sigma, 3)
    rot = quat_multiply(
        partial_rot(noise_frames.quats, bcast(beta, 3)), sig_frames.quats
    )

    result = dict(signal)
    result["frames"] = RigidArray(rot, pos)
    result["torsions"] = torsions
    return result


def remove_noise(
    noised: Dict[str, Any],
    predicted: Noise,
    random_noise: Noise,
    t,
    s,
    tables: ScheduleTables,
) -> Dict[str, Any]:
    """One reverse step z_t -> z_s with fresh stochastic noise.

    Mirrors ``optimizer.py:140-193``; the derived scalars
    (alpha_ts, sigma_ts^2, sigma_t->s) come from the precomputed f64->f32
    tables (t is traced inside the sampler scan). ``s`` must equal t-1,
    which is the only way the reference ever calls it (``optimizer.py:243``);
    for arbitrary (t, s) jumps use ``remove_noise_scalars`` with
    ``StridedTables`` (the ``--sample-steps`` few-step sampler).
    """
    del s  # tables are precomputed for the s = t-1 pairing
    return remove_noise_scalars(
        noised, predicted, random_noise,
        tables.beta[t], tables.sigma[t], tables.beta[t - 1],
        tables.alpha_ts[t], tables.sqr_sigma_ts[t], tables.sigma_t2s[t],
    )


def remove_noise_scalars(
    noised: Dict[str, Any],
    predicted: Noise,
    random_noise: Noise,
    beta_t,
    sigma_t,
    beta_s,
    alpha_ts,
    sqr_sigma_ts,
    sigma_t2s,
) -> Dict[str, Any]:
    """``remove_noise`` with the six per-jump scalars passed explicitly —
    the general (t, s) form of ``optimizer.py:140-193`` (alpha_ts =
    alpha_t/alpha_s etc., ``optimizer.py:153-157``), used by the strided
    (few-step) sampler via ``StridedTables.scalars(k)``."""
    noised_frames: RigidArray = noised["frames"]
    pred_frames: RigidArray = predicted["frames"]
    rand_frames: RigidArray = random_noise["frames"]

    # positions: posterior mean + stochastic term (optimizer.py:164-166)
    denoised_pos = (
        noised_frames.trans / alpha_ts
        - (pred_frames.trans * sqr_sigma_ts) / (alpha_ts * sigma_t)
        + sigma_t2s * rand_frames.trans
    )

    # rotations: invert the predicted partial rotation, re-add a partial
    # random rotation at level s (optimizer.py:173-175). quat_invert (not
    # conjugate) matches Rotation.invert() even in the degenerate case
    # where partial_rot emits a non-unit quat (exact-zero rotation axis).
    pred_partial = partial_rot(pred_frames.quats, beta_t)
    denoised_rot = quat_multiply(
        partial_rot(rand_frames.quats, beta_s),
        quat_multiply(quat_invert(pred_partial), noised_frames.quats),
    )

    # torsions: same inversion pattern in sin/cos space (optimizer.py:182-188)
    denoised_torsion = multiply_sin_cos(
        partial_sin_cos(random_noise["torsions"], beta_s),
        multiply_sin_cos(
            inverse_sin_cos(partial_sin_cos(predicted["torsions"], beta_t)),
            noised["torsions"],
        ),
    )

    result = dict(noised)
    result["frames"] = RigidArray(denoised_rot, denoised_pos)
    result["torsions"] = denoised_torsion
    return result
