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


def test_csv_resume_honours_existing_header_order(tmp_path):
    """Resuming onto a CSV written with a DIFFERENT column order (e.g. the
    pre-fix alphabetical header) must append rows in THAT file's order, not
    the current canonical order — otherwise values silently misalign."""
    keys = ("total loss", "positions loss", "rotations loss", "torsions loss", "rmsd")
    vals = {k: float(i + 1) for i, k in enumerate(keys)}

    path = tmp_path / "resume.csv"
    old_order = sorted(keys)  # the pre-fix alphabetical header
    path.write_text(
        "epoch," + ",".join(old_order) + "\n"
        + "0," + ",".join(str(round(vals[k], 3)) for k in old_order) + "\n")

    rec = MetricsRecord()
    rec.add_batch({k: jnp.asarray(vals[k] * 4) for k in keys}, 4)
    rec.save(str(path), 1)

    import csv as _csv

    with open(path) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 2
    for row in rows:
        for k in keys:
            assert float(row[k]) == pytest.approx(vals[k], abs=1e-3)


def test_csv_resume_rotates_on_column_mismatch(tmp_path):
    """A CSV whose column SET differs from this run's keys is rotated to
    ``<path>.old`` and a fresh canonical-order file is started."""
    keys = ("total loss", "positions loss", "rotations loss", "torsions loss", "rmsd")
    path = tmp_path / "rotate.csv"
    path.write_text("epoch,some,other,columns\n0,1,2,3\n")

    rec = MetricsRecord()
    rec.add_batch({k: jnp.asarray(8.0) for k in keys}, 8)
    rec.save(str(path), 0)

    assert (tmp_path / "rotate.csv.old").read_text().startswith(
        "epoch,some,other,columns")
    assert path.read_text().splitlines()[0] == "epoch," + ",".join(keys)
