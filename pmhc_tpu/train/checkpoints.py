"""Checkpoint / resume via Orbax, plus reference-format interop.

The reference checkpoints by overwriting a single torch ``state_dict``
file every 100 batches and at epoch end, auto-resuming if the file exists;
Adam moments, RNG state and the step counter are lost on resume
(``optimize.py:55-56,75-80``, SURVEY.md §5 "Checkpoint/resume").

TPU-native: Orbax step-numbered directories with retention, saving
params AND optimizer state AND the RNG key AND the step counter — a
deliberate, documented improvement over the reference (same training
semantics on an uninterrupted run; strictly better on resume).

For drop-in interop, the training CLI also mirrors the reference and
writes/reads the torch ``.pth`` format via
``pmhc_tpu.models.import_torch`` when the output path ends in ``.pth``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


class CheckpointManager:
    """Thin wrapper over orbax.checkpoint.CheckpointManager."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, params, opt_state, key) -> None:
        state = {
            "params": params,
            "opt_state": opt_state,
            "key_data": jax.random.key_data(key),
        }
        self.manager.save(step, args=self._ocp.args.StandardSave(state))

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, params_like, opt_state_like, step: Optional[int] = None):
        """Restore (params, opt_state, key, step); the *_like pytrees give
        orbax the target structure (e.g. a fresh init)."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        target = {
            "params": params_like,
            "opt_state": opt_state_like,
            "key_data": jax.random.key_data(jax.random.key(0)),
        }
        restored = self.manager.restore(step, args=self._ocp.args.StandardRestore(target))
        # rebuild the key from HOST data so it comes back uncommitted:
        # orbax restores onto device 0, and a device-0-committed key
        # conflicts with mesh-committed params inside the shard_map (CP)
        # trainer jit, which has no in_shardings to re-place it
        import numpy as np

        key = jax.random.wrap_key_data(
            jax.numpy.asarray(np.asarray(restored["key_data"]))
        )
        return restored["params"], restored["opt_state"], key, step
