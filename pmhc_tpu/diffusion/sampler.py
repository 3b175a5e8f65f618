"""Reverse-diffusion sampler as a single ``lax.scan``.

The reference samples with a host-side Python ``while`` loop issuing one
model dispatch per step — 1000 sequential forwards with host round-trips
(``diffusion/optimizer.py:226-252``, SURVEY.md §3.2 "Hot loop"). Here the
whole trajectory compiles into one XLA program: the scan carries
(frames, torsions, rng key), static batch context is closed over, and
per-step schedule scalars are table gathers.

Faithful details:
- t runs T, T-1, ..., 1 and the model IS evaluated at t = T even though
  training only saw t in [0, T-1] (SURVEY.md §3.5.2) — preserved;
- each step draws fresh stochastic noise (``optimizer.py:151``), here via
  per-step fold_in keys.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from pmhc_tpu.diffusion.noise import gen_noise, remove_noise
from pmhc_tpu.diffusion.schedule import DiffusionConfig, ScheduleTables
from pmhc_tpu.models import ScoreNetworkConfig, score_network_forward
from pmhc_tpu.models.nn import DEFAULT_PRECISION


def sample(
    params,
    batch: Dict[str, Any],
    key: jax.Array,
    config: DiffusionConfig,
    model_config: ScoreNetworkConfig,
    tables: ScheduleTables | None = None,
    precision=DEFAULT_PRECISION,
    injected_noise: Dict[str, Any] | None = None,
) -> Dict[str, Any]:
    """Run the full reverse diffusion from the noised state in ``batch``.

    ``batch["frames"]``/``batch["torsions"]`` hold the initial (pure noise)
    state; everything else (features, masks, pocket) is static context.
    Returns the batch dict with denoised frames/torsions.

    ``injected_noise`` optionally bypasses the internal RNG with
    pre-generated per-step noise (a Noise pytree with a leading [T] axis,
    index 0 used at t=T): the parity hook for comparing trajectories
    against the reference with identical stochastic draws (SURVEY.md §7
    "Hard parts": the two frameworks' RNGs cannot be synchronized).
    """
    if tables is None:
        tables = ScheduleTables(config)
    T = config.noise_step_count
    batch_shape = batch["frames"].shape  # (B, N)

    static = {k: v for k, v in batch.items() if k not in ("frames", "torsions")}

    def step(carry, xs):
        t, rand = xs
        frames, torsions = carry
        model_batch = dict(static)
        model_batch["frames"] = frames
        model_batch["torsions"] = torsions

        predicted = score_network_forward(
            params, model_batch, t, model_config, precision
        )
        if rand is None:
            step_key = jax.random.fold_in(key, t)
            rand = gen_noise(step_key, batch_shape, config)
        denoised = remove_noise(
            {"frames": frames, "torsions": torsions},
            predicted,
            rand,
            t,
            t - 1,
            tables,
        )
        return (denoised["frames"], denoised["torsions"]), None

    ts = jnp.arange(T, 0, -1)
    if injected_noise is None:
        step_fn = lambda carry, t: step(carry, (t, None))
        xs = ts
    else:
        step_fn = step
        xs = (ts, injected_noise)
    (frames, torsions), _ = jax.lax.scan(
        step_fn, (batch["frames"], batch["torsions"]), xs
    )

    result = dict(batch)
    result["frames"] = frames
    result["torsions"] = torsions
    return result
