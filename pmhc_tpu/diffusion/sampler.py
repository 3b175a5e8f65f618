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

from pmhc_tpu.diffusion.noise import gen_noise, remove_noise, remove_noise_scalars
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
    data_axis: str | None = None,
    num_steps: int | None = None,
) -> Dict[str, Any]:
    """Run the full reverse diffusion from the noised state in ``batch``.

    ``batch["frames"]``/``batch["torsions"]`` hold the initial (pure noise)
    state; everything else (features, masks, pocket) is static context.
    Returns the batch dict with denoised frames/torsions.

    ``num_steps``: reverse jumps to take (default T — the reference's full
    chain, ``optimizer.py:236-249``). Fewer steps run the same ancestral
    update over a strided t-grid (``StridedTables``: the reference's own
    general (t, s) formulas, golden-tested at arbitrary strides) for a
    ~T/num_steps sampling speedup; with ``injected_noise`` its leading
    axis must then be [K] (jumps), not [T].

    ``injected_noise`` optionally bypasses the internal RNG with
    pre-generated per-step noise (a Noise pytree with a leading [T] axis,
    index 0 used at t=T): the parity hook for comparing trajectories
    against the reference with identical stochastic draws (SURVEY.md §7
    "Hard parts": the two frameworks' RNGs cannot be synchronized).

    ``data_axis``: manual-SPMD mode for running inside shard_map (see
    ``sample_sharded``): per-step noise is drawn at GLOBAL batch shape and
    sliced to this shard, so the trajectory is bit-identical to the dense
    sampler on the concatenated batch.
    """
    if tables is None:
        tables = ScheduleTables(config)
    T = config.noise_step_count
    batch_shape = batch["frames"].shape  # (B, N) — local shard under data_axis

    if data_axis is None:
        gshape = batch_shape
        slice_local = lambda x: x
    else:
        from jax import lax

        n_data = lax.axis_size(data_axis)
        gshape = (batch_shape[0] * n_data,) + batch_shape[1:]
        start = lax.axis_index(data_axis) * batch_shape[0]

        def slice_local(x):
            return lax.dynamic_slice_in_dim(x, start, batch_shape[0], axis=0)

    static = {k: v for k, v in batch.items() if k not in ("frames", "torsions")}

    strided = None
    if num_steps is not None and num_steps != T:
        from pmhc_tpu.diffusion.schedule import StridedTables, strided_timesteps

        strided = StridedTables(config, strided_timesteps(T, num_steps))

    def step(carry, xs):
        t, scalars, rand = xs
        frames, torsions = carry
        model_batch = dict(static)
        model_batch["frames"] = frames
        model_batch["torsions"] = torsions

        predicted = score_network_forward(
            params, model_batch, t, model_config, precision
        )
        if rand is None:
            step_key = jax.random.fold_in(key, t)
            rand = jax.tree_util.tree_map(
                slice_local, gen_noise(step_key, gshape, config)
            )
        state = {"frames": frames, "torsions": torsions}
        if scalars is None:
            denoised = remove_noise(state, predicted, rand, t, t - 1, tables)
        else:
            denoised = remove_noise_scalars(state, predicted, rand, *scalars)
        return (denoised["frames"], denoised["torsions"]), None

    if strided is None:
        ts = jnp.arange(T, 0, -1)
        sc = None
    else:
        ts = strided.ts
        sc = strided.scalars(jnp.arange(strided.num_jumps))
    if injected_noise is None:
        step_fn = lambda carry, xs: step(carry, (xs[0], xs[1], None))
        xs = (ts, sc)
    else:
        step_fn = step
        xs = (ts, sc, injected_noise)
    (frames, torsions), _ = jax.lax.scan(
        step_fn, (batch["frames"], batch["torsions"]), xs
    )

    result = dict(batch)
    result["frames"] = frames
    result["torsions"] = torsions
    return result


def make_sample_sharded(
    config: DiffusionConfig,
    model_config: ScoreNetworkConfig,
    mesh,
    tables: ScheduleTables | None = None,
    precision=DEFAULT_PRECISION,
    num_steps: int | None = None,
):
    """Build the context-parallel sampler: the whole T-step scan runs
    inside one jitted shard_map over ``mesh`` — batch sharded on 'data',
    the EGNN neighbour axis sharded on 'context' (requires
    ``model_config.backend in ('cp', 'ring')``). The returned
    ``run(params, batch, key)`` is bit-compatible with the dense
    ``sample`` on the same global batch and key; the jit is cached per
    batch structure."""
    if model_config.backend not in ("cp", "ring"):
        raise ValueError(
            "sharded sampling requires backend 'cp' or 'ring', got "
            f"{model_config.backend!r}"
        )
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def fn(params, batch, key):
        return sample(
            params, batch, key, config, model_config, tables, precision,
            data_axis="data", num_steps=num_steps,
        )

    jitted = {}

    def run(params, batch: Dict[str, Any], key: jax.Array):
        struct = jax.tree_util.tree_structure(batch)
        if struct not in jitted:
            batch_specs = jax.tree_util.tree_map(lambda _: P("data"), batch)
            jitted[struct] = jax.jit(shard_map(
                fn, mesh=mesh,
                in_specs=(P(), batch_specs, P()), out_specs=batch_specs,
            ))
        return jitted[struct](params, batch, key)

    return run


def sample_sharded(
    params,
    batch: Dict[str, Any],
    key: jax.Array,
    config: DiffusionConfig,
    model_config: ScoreNetworkConfig,
    mesh,
    tables: ScheduleTables | None = None,
    precision=DEFAULT_PRECISION,
    num_steps: int | None = None,
):
    """One-shot convenience wrapper over ``make_sample_sharded``."""
    return make_sample_sharded(
        config, model_config, mesh, tables, precision, num_steps
    )(params, batch, key)
