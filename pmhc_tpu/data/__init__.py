"""Data pipeline: SwiftMHC-format HDF5 -> fixed-shape device batches."""

from pmhc_tpu.data.dataset import PmhcDataset, PEPTIDE_MAXLEN, POCKET_MAXLEN
from pmhc_tpu.data.loader import PrefetchLoader
from pmhc_tpu.data.packed import DeviceDataset, PackedDataset
from pmhc_tpu.data.realistic import write_realistic_hdf5
from pmhc_tpu.data.synthetic import synthetic_batch, write_synthetic_hdf5

__all__ = [
    "PmhcDataset",
    "PackedDataset",
    "DeviceDataset",
    "PrefetchLoader",
    "PEPTIDE_MAXLEN",
    "POCKET_MAXLEN",
    "synthetic_batch",
    "write_synthetic_hdf5",
    "write_realistic_hdf5",
]
