"""Native PDB formatter (csrc/pdb_formatter.cc): byte-exact vs the
pure-Python path, record by record and whole-file."""

import os

import numpy as np
import pytest

from pmhc_tpu.io import pdb_native
from pmhc_tpu.io.pdb import _emit_atoms, _name_fields, save_pdb


def _random_fields(rng, n, coords):
    names = ["N", "CA", "C", "O", "CB", "OXT", "CG1", "NE2", "OD1", "SD"]
    names4, elems2 = zip(*(_name_fields(names[i % len(names)])
                           for i in range(n)))
    res3 = np.frombuffer(b"GLYALAMETTRP", np.uint8).reshape(4, 3)
    return (np.stack(names4), res3[rng.integers(0, 4, n)],
            np.stack(elems2), rng.integers(1, 500, n).astype(np.int32),
            coords)


@pytest.mark.skipif(not pdb_native.is_available(),
                    reason="no compiler for the native formatter")
def test_native_matches_python_bytes():
    rng = np.random.default_rng(0)
    n = 400
    # ordinary, negative, large, and near-rounding-boundary coordinates
    coords = np.concatenate([
        rng.normal(0, 30, (n - 8, 3)),
        [[-999.9995, 0.0005, 12345.678],   # %8.3f width overflow
         [-0.0004, -0.0005, 0.0005],       # signed-zero / half-even edges
         [99999.999, -99999.999, 1e-12],
         [0.12345, 1.99949999, 2.0005],
         [8.3335, -8.3335, 83.3335],
         [1/3, -2/3, 1e6 + 1/3],
         [np.float64(np.float32(3.14159)), np.float64(np.float32(-77.7)), 0],
         [1234.5675, -1234.5675, 0.9995]],
    ])
    fields = _random_fields(rng, n, coords)

    native = _emit_atoms(7, "M", *fields[:3], fields[3], fields[4])
    os.environ["PMHC_PDB_FORMATTER"] = "python"
    try:
        python = _emit_atoms(7, "M", *fields[:3], fields[3], fields[4])
    finally:
        del os.environ["PMHC_PDB_FORMATTER"]
    assert native == python


def test_save_pdb_native_vs_python_whole_file(tmp_path):
    """End-to-end save_pdb: identical files with and without the native
    formatter on a realistic entry (skips silently to python-vs-python
    when no compiler is present — still covers the array emit path)."""
    from pmhc_tpu.data import PmhcDataset, PrefetchLoader
    from pmhc_tpu.data.realistic import write_realistic_hdf5
    from pmhc_tpu.diffusion import DiffusionConfig, gen_noise
    from pmhc_tpu.io.pdb import precompute_pdb_arrays
    from pmhc_tpu.train.trainer import prepare_batch

    h5 = str(tmp_path / "e.hdf5")
    write_realistic_hdf5(h5, n_entries=2, seed=4)
    ds = PmhcDataset(h5)
    batch = next(iter(PrefetchLoader(ds, batch_size=2)))
    names = batch.pop("name")
    mb = prepare_batch(batch)
    mb["aatype"] = np.asarray(batch["aatype"])
    import jax

    noise = gen_noise(jax.random.key(0), mb["frames"].shape, DiffusionConfig())
    mb["frames"], mb["torsions"] = noise["frames"], noise["torsions"]
    mb.update(ds.get_protein_positions(names))
    pc = precompute_pdb_arrays(mb)

    a, b = str(tmp_path / "a.pdb"), str(tmp_path / "b.pdb")
    save_pdb(None, 0, a, precomputed=pc)
    os.environ["PMHC_PDB_FORMATTER"] = "python"
    try:
        save_pdb(None, 0, b, precomputed=pc)
    finally:
        del os.environ["PMHC_PDB_FORMATTER"]
    assert open(a, "rb").read() == open(b, "rb").read()
    text = open(a).read()
    assert text.endswith("END\n") and "TER" in text
