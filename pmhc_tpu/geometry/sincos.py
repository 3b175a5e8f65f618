"""(sin, cos) pair algebra for torsion angles.

Port of the reference's "complex number" torsion algebra,
``diffusion/tools/angle.py:33-174``. A torsion angle is carried as
``[..., 2] = (sin a, cos a)``; multiplication adds angles and multiplies
magnitudes (complex product with sin = imaginary part, cos = real part).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pmhc_tpu.geometry.quat import torch_normalize

PI = math.pi


def angle_to_sin_cos(angle: jnp.ndarray) -> jnp.ndarray:
    """[...]-shaped angles -> [..., 2] (sin, cos). Reference ``angle.py:44-57``."""
    return jnp.stack((jnp.sin(angle), jnp.cos(angle)), axis=-1)


def random_sin_cos(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform random angles in [0, 2pi) as (sin, cos). Reference ``angle.py:33-41``."""
    a = jax.random.uniform(key, tuple(shape), dtype=jnp.float32) * 2.0 * PI
    return angle_to_sin_cos(a)


def multiply_sin_cos(sc1: jnp.ndarray, sc2: jnp.ndarray) -> jnp.ndarray:
    """Complex product: angles add, magnitudes multiply; NOT normalized.

    Exact port of reference ``angle.py:139-152``:
    sin_out = s1*c2 + c1*s2 ; cos_out = c1*c2 - s1*s2.
    """
    s1, c1 = sc1[..., :1], sc1[..., 1:]
    s2, c2 = sc2[..., :1], sc2[..., 1:]
    return jnp.concatenate((s1 * c2 + c1 * s2, c1 * c2 - s1 * s2), axis=-1)


def inverse_sin_cos(sc: jnp.ndarray) -> jnp.ndarray:
    """Complex reciprocal-conjugate: negate angle, invert magnitude.

    Exact port of reference ``angle.py:155-162`` (divides by the SQUARED
    norm, so multiply(inverse(x), x) is the exact identity for unit inputs).
    """
    sqr_norm = jnp.sum(sc * sc, axis=-1, keepdims=True)
    return jnp.concatenate((-sc[..., :1], sc[..., 1:]), axis=-1) / sqr_norm


def partial_sin_cos(sc: jnp.ndarray, amount) -> jnp.ndarray:
    """Scale the angle by ``amount``; output is a unit (sin, cos).

    Exact port of reference ``angle.py:165-174``: normalize, recover
    a = sign(sin) * acos(clamp(cos)), emit (sin(a*amount), cos(a*amount)).
    """
    sc = torch_normalize(sc)
    a = jnp.arccos(jnp.clip(sc[..., 1:], -1.0, 1.0))
    a = jnp.where(sc[..., :1] < 0.0, -a, a)
    return jnp.concatenate((jnp.sin(a * amount), jnp.cos(a * amount)), axis=-1)


def get_sin_cos_angle(sc1: jnp.ndarray, sc2: jnp.ndarray) -> jnp.ndarray:
    """Angle between two (sin, cos) vectors. Reference ``angle.py:125-136``."""
    sc1 = torch_normalize(sc1)
    sc2 = torch_normalize(sc2)
    dot = jnp.sum(sc1 * sc2, axis=-1)
    return jnp.arccos(jnp.clip(dot, -1.0, 1.0))
