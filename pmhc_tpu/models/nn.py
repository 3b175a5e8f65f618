"""Minimal neural-net building blocks: Linear / 2-layer MLP as pure functions.

Parameters are plain dict pytrees (JAX convention: ``y = x @ w + b`` with
``w: [in, out]``; the torch-checkpoint importer transposes torch's
``[out, in]`` Linear weights).

Initialization matches torch.nn.Linear defaults (kaiming-uniform with
a=sqrt(5) reduces to U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both weight
and bias), so training-from-scratch starts from the same distribution as
the reference's ``torch.nn.Sequential`` MLPs (``diffusion/model.py:39-81``).

All matmuls default to full-f32 precision: TPU backends otherwise drop
jnp.dot to bf16, which breaks quaternion-loss tolerances (SURVEY.md §7
"Precision"). Pass ``precision=None`` to opt into the backend default
(bf16 MXU) for throughput once parity is not required.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

DEFAULT_PRECISION = lax.Precision.HIGHEST


def linear_init(key: jax.Array, in_dim: int, out_dim: int) -> Params:
    bound = 1.0 / math.sqrt(in_dim)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(
            kw, (in_dim, out_dim), minval=-bound, maxval=bound, dtype=jnp.float32
        ),
        "b": jax.random.uniform(
            kb, (out_dim,), minval=-bound, maxval=bound, dtype=jnp.float32
        ),
    }


def linear_apply(
    p: Params, x: jnp.ndarray, precision=DEFAULT_PRECISION
) -> jnp.ndarray:
    return jnp.dot(x, p["w"], precision=precision) + p["b"]


def mlp_init(key: jax.Array, in_dim: int, hidden_dim: int, out_dim: int) -> Params:
    """Two-layer MLP (Linear -> ReLU -> Linear), the reference's universal
    MLP shape (transition_size=64, ``diffusion/model.py:36-81``)."""
    k1, k2 = jax.random.split(key)
    return {
        "lin1": linear_init(k1, in_dim, hidden_dim),
        "lin2": linear_init(k2, hidden_dim, out_dim),
    }


def mlp_apply(
    p: Params,
    x: jnp.ndarray,
    final_sigmoid: bool = False,
    precision=DEFAULT_PRECISION,
) -> jnp.ndarray:
    h = jax.nn.relu(linear_apply(p["lin1"], x, precision))
    y = linear_apply(p["lin2"], h, precision)
    if final_sigmoid:
        y = jax.nn.sigmoid(y)
    return y


def mlp_hidden(
    p: Params, pre_activation: jnp.ndarray, final_sigmoid: bool = False,
    precision=DEFAULT_PRECISION,
) -> jnp.ndarray:
    """Finish an MLP whose first-layer pre-activation was computed by the
    caller (used to split concat-inputs into block matmuls that broadcast
    instead of materializing, see ``pmhc_tpu.models.egnn``)."""
    h = jax.nn.relu(pre_activation)
    y = linear_apply(p["lin2"], h, precision)
    if final_sigmoid:
        y = jax.nn.sigmoid(y)
    return y


def linear_block(
    p: Params, x: jnp.ndarray, start: int, size: int, precision=DEFAULT_PRECISION
) -> jnp.ndarray:
    """Apply a row-slice of an MLP's first Linear: x @ w[start:start+size].

    For a Linear over a concatenated input ``cat(a, b) @ w ==
    a @ w[:da] + b @ w[da:]`` — splitting lets each operand keep its own
    (smaller, broadcastable) shape instead of materializing the concat
    across the [B, N, N+P] neighbour grid.
    """
    return jnp.dot(x, lax.slice_in_dim(p["w"], start, start + size, axis=0),
                   precision=precision)
