"""Device-side metric accumulation with per-epoch CSV output.

Twin of the reference ``MetricsRecord`` (``diffusion/tools/metrics.py:8-40``)
with one crucial difference: the reference calls ``.item()`` on every loss
component every batch — a host sync per training step (SURVEY.md §5
"Metrics"). Here the train step returns per-batch SUMS as device scalars;
``add_batch`` just stashes them (async, no sync) and the single blocking
transfer happens in ``mean()``/``save()`` once per epoch.

CSV schema matches the reference exactly (lazy header, 3-decimal rounding,
append mode), so existing loss-curve tooling reads both.
"""

from __future__ import annotations

import csv
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


# the reference CSV's column order is ``get_loss``'s dict insertion order
# (``optimizer.py:74-79`` via ``metrics.py:27-40``); dicts returned from a
# jitted step carry jax's SORTED key order, so the canonical order is
# restored here
_REFERENCE_ORDER = (
    "total loss", "positions loss", "rotations loss", "torsions loss", "rmsd",
)


class MetricsRecord:
    def __init__(self):
        self._pending = []  # batches not yet folded into the running totals
        self._running = None  # host-side running sums (folded on demand)
        self._size = 0
        self._key_order = None

    def add_batch(self, batch_sums: Dict[str, jnp.ndarray], batch_size: int):
        """Accumulate a train step's per-batch loss sums (device scalars;
        no host sync and no extra device dispatch here)."""
        if self._key_order is None:
            # reference column order first, any extra keys after
            self._key_order = [
                k for k in _REFERENCE_ORDER if k in batch_sums
            ] + [k for k in batch_sums if k not in _REFERENCE_ORDER]
        self._pending.append(batch_sums)
        self._size += batch_size

    def _totals(self) -> Dict[str, float]:
        """Fold pending batches into the running totals. Work is O(batches
        since the last call), not O(all batches) — the periodic ``has_nan``
        guard (every 100 batches) stays O(epoch) overall, not O(epoch²)."""
        if self._pending:
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.sum(jnp.stack(xs)), *self._pending
            )
            host = jax.device_get(stacked)
            fresh = {k: float(host[k]) for k in self._key_order}
            if self._running is None:
                self._running = fresh
            else:
                self._running = {
                    k: self._running[k] + fresh[k] for k in self._key_order
                }
            self._pending = []
        return dict(self._running) if self._running is not None else {}

    def mean(self) -> Dict[str, float]:
        return {k: v / self._size for k, v in self._totals().items()}

    def save(self, path: str, epoch_number: int):
        means = self.mean()
        keys = list(means.keys())
        add_header = not os.path.isfile(path)
        if not add_header:
            # Resuming onto an existing CSV: honour ITS header order so rows
            # written before a column-order change (e.g. the pre-fix
            # alphabetical header) never misalign under the old header. If
            # the column sets differ entirely, rotate the stale file.
            with open(path, "rt") as f:
                header = next(csv.reader(f), None)
            existing = [c for c in (header or []) if c != "epoch"]
            if existing and set(existing) == set(keys):
                keys = existing
            elif existing:
                import logging

                # rotate to a unique name so a second mismatch can never
                # clobber an earlier rotation's history (ADVICE r4)
                old = path + ".old"
                n = 1
                while os.path.exists(old):
                    old = f"{path}.old.{n}"
                    n += 1
                logging.getLogger(__name__).warning(
                    "metrics CSV %s has columns %s but this run produces %s; "
                    "rotating it to %s", path, existing, keys, old,
                )
                os.replace(path, old)
                add_header = True
        with open(path, "at") as f:
            w = csv.writer(f, delimiter=",")
            if add_header:
                w.writerow(["epoch"] + keys)
            w.writerow([epoch_number] + [round(means[k], 3) for k in keys])

    def __len__(self) -> int:
        """Number of examples accumulated (0 = nothing to save)."""
        return self._size

    def has_nan(self) -> bool:
        """Host-side NaN check over everything accumulated so far (used by
        the trainer's periodic NaN guard, replacing the reference's
        per-step abort at ``optimizer.py:217-218``)."""
        return any(np.isnan(v) for v in self._totals().values())
