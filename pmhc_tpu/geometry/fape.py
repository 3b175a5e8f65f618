"""Frame-Aligned Point Error (FAPE).

The reference imports OpenFold's ``compute_fape`` but never calls it
(``diffusion/optimizer.py:8`` — dead import, SURVEY.md §2.2). Provided
here for API completeness with the standard AlphaFold-2 semantics
(Alg. 28): express target and predicted points in every frame's local
coordinates, L1-ish clamped distance, masked mean.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from pmhc_tpu.geometry.rigid import RigidArray


def compute_fape(
    pred_frames: RigidArray,  # [*, F]
    target_frames: RigidArray,  # [*, F]
    frames_mask: jnp.ndarray,  # [*, F]
    pred_positions: jnp.ndarray,  # [*, A, 3]
    target_positions: jnp.ndarray,  # [*, A, 3]
    positions_mask: jnp.ndarray,  # [*, A]
    length_scale: float = 10.0,
    l1_clamp_distance: Optional[float] = 10.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Scalar-per-batch FAPE between predicted and target structures."""
    # [*, F, A, 3]: every point in every frame's local coordinates
    def localize(frames: RigidArray, points: jnp.ndarray) -> jnp.ndarray:
        f = RigidArray(frames.quats[..., :, None, :], frames.trans[..., :, None, :])
        return f.invert_apply(points[..., None, :, :])

    local_pred = localize(pred_frames, pred_positions)
    local_target = localize(target_frames, target_positions)

    d = jnp.sqrt(jnp.sum(jnp.square(local_pred - local_target), axis=-1) + eps)
    if l1_clamp_distance is not None:
        d = jnp.clip(d, 0.0, l1_clamp_distance)
    d = d / length_scale

    mask = frames_mask[..., :, None] * positions_mask[..., None, :]
    return jnp.sum(d * mask, axis=(-2, -1)) / (jnp.sum(mask, axis=(-2, -1)) + eps)
