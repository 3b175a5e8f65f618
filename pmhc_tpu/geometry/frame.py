"""Frame-set RMSD.

Twin of reference ``diffusion/tools/frame.py:6-7``: RMSD between two frame
sets' translations, unmasked, averaged over the residue axis.
"""

from __future__ import annotations

import jax.numpy as jnp

from pmhc_tpu.geometry.rigid import RigidArray


def get_rmsd(pred_frames: RigidArray, true_frames: RigidArray) -> jnp.ndarray:
    """sqrt(sum((t_true - t_pred)^2) / N) per batch element."""
    sq = jnp.sum(
        jnp.square(true_frames.trans - pred_frames.trans), axis=(-2, -1)
    )
    return jnp.sqrt(sq / pred_frames.shape[-1])
