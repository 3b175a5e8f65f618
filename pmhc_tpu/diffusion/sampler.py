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
) -> Dict[str, Any]:
    """Run the full reverse diffusion from the noised state in ``batch``.

    ``batch["frames"]``/``batch["torsions"]`` hold the initial (pure noise)
    state; everything else (features, masks, pocket) is static context.
    Returns the batch dict with denoised frames/torsions.
    """
    if tables is None:
        tables = ScheduleTables(config)
    T = config.noise_step_count
    batch_shape = batch["frames"].shape  # (B, N)

    static = {k: v for k, v in batch.items() if k not in ("frames", "torsions")}

    def step(carry, t):
        frames, torsions = carry
        model_batch = dict(static)
        model_batch["frames"] = frames
        model_batch["torsions"] = torsions

        predicted = score_network_forward(
            params, model_batch, t, model_config, precision
        )
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
    (frames, torsions), _ = jax.lax.scan(
        step, (batch["frames"], batch["torsions"]), ts
    )

    result = dict(batch)
    result["frames"] = frames
    result["torsions"] = torsions
    return result
