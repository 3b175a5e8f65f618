"""Schema validator: clean synthetic/realistic files pass; each
corruption class produces an actionable message (the reference reader
would crash with a raw h5py/torch error instead,
``diffusion/data.py:35-119``)."""

import h5py
import numpy as np
import pytest

from pmhc_tpu.data.realistic import write_realistic_hdf5
from pmhc_tpu.data.synthetic import write_synthetic_hdf5
from pmhc_tpu.data.validate import validate_hdf5


@pytest.fixture(scope="module")
def clean_h5(tmp_path_factory):
    d = tmp_path_factory.mktemp("validate")
    p = str(d / "clean.hdf5")
    write_synthetic_hdf5(p, n_entries=3, peptide_lengths=(9, 11), seed=0)
    return p


def test_clean_synthetic_passes(clean_h5):
    checked, problems = validate_hdf5(clean_h5)
    assert checked == 3 and problems == []


def test_clean_realistic_passes(tmp_path):
    p = str(tmp_path / "real.hdf5")
    write_realistic_hdf5(p, n_entries=4, seed=1)
    checked, problems = validate_hdf5(p)
    assert checked == 4 and problems == []


def _copy_with(src, dst, mutate):
    with h5py.File(src, "r") as fin, h5py.File(dst, "w") as fout:
        fin.copy(fin[list(fin.keys())[0]], fout, name="E0")
        mutate(fout["E0"])


def _drop_peptide(e):
    del e["peptide"]


def _drop_torsion_mask(e):
    del e["peptide/torsion_angles_mask"]


def _narrow_onehot(e):
    p = np.asarray(e["peptide/sequence_onehot"][:])[:, :21].copy()
    del e["peptide/sequence_onehot"]
    e["peptide"].create_dataset("sequence_onehot", data=p)


def _bad_aatype(e):
    n = e["peptide/aatype"].shape[0]
    del e["peptide/aatype"]
    e["peptide"].create_dataset("aatype", data=np.full(n, 25, np.int64))


def _empty_pocket(e):
    e["protein/cross_residues_mask"].write_direct(
        np.zeros(e["protein/cross_residues_mask"].shape, bool))


@pytest.mark.parametrize(
    "mutate,needle",
    [
        (_drop_peptide, "missing 'peptide'"),
        (_drop_torsion_mask, "missing dataset"),
        (_narrow_onehot, "expected (N,22)"),
        (_bad_aatype, "outside [0, 21]"),
        (_empty_pocket, "pocket residues"),
    ],
)
def test_corruptions_are_reported(clean_h5, tmp_path, mutate, needle):
    dst = str(tmp_path / "bad.hdf5")
    _copy_with(clean_h5, dst, mutate)
    _, problems = validate_hdf5(dst)
    assert any(needle in p for p in problems), problems


def test_transposed_frames_flagged(clean_h5, tmp_path):
    dst = str(tmp_path / "tframes.hdf5")

    def mutate(e):
        fr = np.asarray(e["peptide/backbone_rigid_tensor"][:])
        e["peptide/backbone_rigid_tensor"].write_direct(
            np.transpose(fr, (0, 2, 1)).copy())

    _copy_with(clean_h5, dst, mutate)
    _, problems = validate_hdf5(dst)
    assert any("bottom row" in p or "orthonormal" in p for p in problems), problems


def test_train_cli_validate_data_aborts_on_drift(clean_h5, tmp_path):
    """--validate-data fails fast with actionable messages instead of a
    mid-epoch h5py/torch crash (the reference's behavior on drift)."""
    from pmhc_tpu.cli.train_cli import main

    dst = str(tmp_path / "drift.hdf5")
    _copy_with(clean_h5, dst, _narrow_onehot)
    with pytest.raises(SystemExit, match="schema problems"):
        main([dst, "1", str(tmp_path / "m.pth"), "--validate-data",
              "-b", "1", "-w", "1", "-T", "4"])


def test_nonfinite_flagged(clean_h5, tmp_path):
    dst = str(tmp_path / "nan.hdf5")

    def mutate(e):
        pos = np.asarray(e["protein/atom14_gt_positions"][:])
        pos[0, 0, 0] = np.nan
        e["protein/atom14_gt_positions"].write_direct(pos)

    _copy_with(clean_h5, dst, mutate)
    _, problems = validate_hdf5(dst)
    assert any("non-finite" in p for p in problems), problems
