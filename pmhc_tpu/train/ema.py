"""Exponential moving average of the parameters, as an optax transform.

Standard production-diffusion practice (DDPM samples from an EMA of the
weights, decay ~0.999-0.9999) that the reference does not implement
(`/root/reference/optimize.py` saves the raw ``state_dict``); offered
here as an opt-in extension (``--ema-decay``).

The EMA lives INSIDE the optimizer state: ``ema_of_params`` is chained
after Adam, so the average is maintained by the same jitted/donated
update that applies the step — it therefore flows unchanged through
every trainer path (single-device, DP GSPMD, TP-sharded Adam moments,
the shard_map CP trainer, the K-step device scans) and through Orbax
checkpoint/restore, with zero changes to any step function. Because the
EMA tree mirrors the params tree leaf for leaf, the TP path-suffix
sharding rule shards it identically to the params.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class EmaParamsState(NamedTuple):
    ema: Any  # pytree mirroring the params


def ema_of_params(decay: float) -> optax.GradientTransformation:
    """Track ``ema = decay * ema + (1 - decay) * params`` after each
    update. Must be placed LAST in the optax chain: the ``updates`` it
    receives are the final deltas, so ``params + updates`` are the
    post-step parameters the average follows. Passes updates through
    unchanged."""

    def init_fn(params):
        # COPY: sharing the params' buffers would make a donated jitted
        # step donate the same buffer twice (params AND opt_state)
        return EmaParamsState(
            ema=jax.tree_util.tree_map(jnp.copy, params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema_of_params requires params in update()")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p,
            state.ema, new_params,
        )
        return updates, EmaParamsState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def extract_ema_params(opt_state):
    """Pull the EMA tree out of a (possibly chained) optimizer state;
    None if no ``ema_of_params`` is in the chain."""
    leaves = jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, EmaParamsState))
    for leaf in leaves:
        if isinstance(leaf, EmaParamsState):
            return leaf.ema
    return None
