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
