"""Metrics CSV byte-compatibility: same per-batch loss values through both
MetricsRecord implementations produce identical CSV files (reference
``tools/metrics.py``: lazy header, 3-decimal rounding, append mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference import install

install()

from diffusion.tools.metrics import MetricsRecord as RefMetrics  # noqa: E402

from pmhc_tpu.train.metrics import MetricsRecord  # noqa: E402


def test_csv_output_matches_reference(tmp_path):
    rng = np.random.default_rng(3)
    keys = ("total loss", "positions loss", "rotations loss", "torsions loss", "rmsd")

    ours = MetricsRecord()
    theirs = RefMetrics()
    for _ in range(4):
        batch = {k: rng.uniform(0, 10, size=(8,)).astype(np.float32) for k in keys}
        ours.add_batch({k: jnp.sum(jnp.asarray(v)) for k, v in batch.items()}, 8)
        theirs.add_batch({k: torch.tensor(v) for k, v in batch.items()})

    ours_path = tmp_path / "ours.csv"
    ref_path = tmp_path / "ref.csv"
    for epoch in (0, 1):
        ours.save(str(ours_path), epoch)
        theirs.save(str(ref_path), epoch)

    assert ours_path.read_text() == ref_path.read_text()


def test_csv_column_order_survives_jit_key_sorting(tmp_path):
    """Dicts returned from a jitted train step carry jax's SORTED key
    order; the CSV must still come out in the reference's get_loss
    insertion order (``optimizer.py:74-79``)."""
    keys = ("total loss", "positions loss", "rotations loss", "torsions loss", "rmsd")

    ours = MetricsRecord()
    theirs = RefMetrics()
    vals = {k: float(i + 1) for i, k in enumerate(keys)}
    # ours sees the dict as jit would deliver it: alphabetically sorted
    ours.add_batch(
        {k: jnp.asarray(vals[k] * 8) for k in sorted(keys)}, 8)
    theirs.add_batch(
        {k: torch.full((8,), vals[k]) for k in keys})

    ours_path = tmp_path / "ours.csv"
    ref_path = tmp_path / "ref.csv"
    ours.save(str(ours_path), 0)
    theirs.save(str(ref_path), 0)
    assert ours_path.read_text() == ref_path.read_text()
    assert ours_path.read_text().splitlines()[0] == "epoch," + ",".join(keys)
