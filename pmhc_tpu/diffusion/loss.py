"""Composite diffusion loss.

Twin of reference ``DiffusionModelOptimizer.get_loss``
(``diffusion/optimizer.py:38-79``), SURVEY.md §3.5.5:

- positions: masked mean over residues of the SQUARED deviation (not RMSD),
  weighted 0.1 in the total;
- rotations: 1 - <normalize(q_true), normalize(q_pred)>, masked mean —
  sign-sensitive by design, so both pipelines must feed sign-consistent
  quats (pmhc_tpu is quat-native end to end, so signs are deterministic);
- torsions: 1 - <normalize(sc_true), normalize(sc_pred)>, masked mean over
  (residues, 7 angles);
- 'rmsd' is reported but NOT optimized (``optimizer.py:54,78``).

Returns per-sample vectors [B]; reduction to scalars happens in the train
step so metrics can accumulate per-sample sums on device (the reference
syncs to host every batch via ``.item()``, ``tools/metrics.py:17``).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from pmhc_tpu.geometry import torch_normalize


def diffusion_loss(
    noise_true: Dict[str, Any],
    noise_pred: Dict[str, Any],
    residues_mask: jnp.ndarray,
    torsions_mask: jnp.ndarray,
    position_loss_weight: float = 0.1,
    rotation_loss_weight: float = 1.0,
    torsion_loss_weight: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    mask = residues_mask.astype(jnp.float32)
    tmask = torsions_mask.astype(jnp.float32)

    true_frames = noise_true["frames"]
    pred_frames = noise_pred["frames"]

    sq_dev = jnp.sum(jnp.square(true_frames.trans - pred_frames.trans), axis=-1)
    positions_loss = jnp.sum(sq_dev * mask, axis=-1) / jnp.sum(mask, axis=-1)
    rmsd = jnp.sqrt(positions_loss)

    q_true = torch_normalize(true_frames.quats)
    q_pred = torch_normalize(pred_frames.quats)
    quat_dev = 1.0 - jnp.sum(q_true * q_pred, axis=-1)  # in [0, 2]
    rotations_loss = jnp.sum(quat_dev * mask, axis=-1) / jnp.sum(mask, axis=-1)

    sc_true = torch_normalize(noise_true["torsions"])
    sc_pred = torch_normalize(noise_pred["torsions"])
    torsion_dev = 1.0 - jnp.sum(sc_true * sc_pred, axis=-1)
    torsions_loss = jnp.sum(torsion_dev * tmask, axis=(-2, -1)) / jnp.sum(
        tmask, axis=(-2, -1)
    )

    return {
        "total loss": position_loss_weight * positions_loss
        + rotation_loss_weight * rotations_loss
        + torsion_loss_weight * torsions_loss,
        "positions loss": positions_loss,
        "rotations loss": rotations_loss,
        "torsions loss": torsions_loss,
        "rmsd": rmsd,
    }
