"""Native C++ HDF5 decoder (csrc/hdf5_decoder.cc): bit-exact parity with
the Python decoder on every field, on both random-schema and realistic
ragged-pocket files."""

import numpy as np
import pytest

from pmhc_tpu.data import PmhcDataset, write_realistic_hdf5, write_synthetic_hdf5
from pmhc_tpu.data import native
from pmhc_tpu.data.loader import collate

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native decoder unavailable (no g++/libhdf5)"
)

KEYS = (
    "mask", "frames", "features", "aatype", "torsions", "torsions_mask",
    "pocket_aatype", "pocket_features", "pocket_mask", "pocket_frames",
    "pocket_atom14_positions", "pocket_atom14_exists",
)


@pytest.mark.parametrize("writer", [write_synthetic_hdf5, write_realistic_hdf5])
def test_native_decoder_bit_exact(tmp_path, writer):
    h5 = str(tmp_path / "t.hdf5")
    writer(h5, n_entries=6, peptide_lengths=(8, 9, 10, 11), seed=3)
    ds = PmhcDataset(h5)
    ref = collate([ds[i] for i in range(len(ds))])
    out = native.decode_packed(h5, ds.entry_names)
    for k in KEYS:
        a = np.asarray(ref[k])
        b = out[k]
        assert a.dtype == b.dtype or a.dtype.kind == b.dtype.kind, (k, a.dtype, b.dtype)
        np.testing.assert_array_equal(b, a, err_msg=k)


def test_packed_dataset_uses_native(tmp_path):
    from pmhc_tpu.data import PackedDataset

    h5 = str(tmp_path / "t.hdf5")
    write_synthetic_hdf5(h5, n_entries=5, peptide_lengths=(9,), seed=1)
    ds = PmhcDataset(h5)
    packed = PackedDataset(h5)
    for i in (0, 4):
        a, b = ds[i], packed[i]
        assert a["name"] == b["name"]
        for k in KEYS:
            np.testing.assert_array_equal(np.asarray(b[k]), np.asarray(a[k]), err_msg=k)
    batch = packed.get_batch([1, 3])
    assert batch["frames"].shape == (2, 16, 7)
    assert batch["name"] == [ds.entry_names[1], ds.entry_names[3]]


def test_device_dataset_matches_packed(tmp_path):
    """DeviceDataset batches (on-device gather) equal PackedDataset
    batches, and the train CLI runs with --device-data."""
    import jax.numpy as jnp

    from pmhc_tpu.data import DeviceDataset, PackedDataset

    h5 = str(tmp_path / "t.hdf5")
    write_synthetic_hdf5(h5, n_entries=6, peptide_lengths=(9, 10), seed=2)
    packed = PackedDataset(h5)
    dev = DeviceDataset(packed)
    a = packed.get_batch([0, 3, 5])
    b = dev.get_batch([0, 3, 5])
    assert a["name"] == b["name"]
    for k in KEYS:
        np.testing.assert_array_equal(np.asarray(b[k]), np.asarray(a[k]), err_msg=k)


def test_train_cli_device_data(tmp_path):
    import os

    from pmhc_tpu.cli.train_cli import main

    h5 = str(tmp_path / "train.hdf5")
    write_synthetic_hdf5(h5, n_entries=6, peptide_lengths=(9,), seed=0)
    model = str(tmp_path / "m.pth")
    main([h5, "1", model, "-T", "8", "--batch-size", "3", "--device-data"])
    assert os.path.isfile(model)
