"""Packed (decode-once) dataset: the TPU-native answer to loader starvation.

The per-entry HDF5 decode costs ~6-7 ms (about 12 tiny h5py dataset reads
behind libhdf5's global lock, measured ~143 entries/s with 4 threads —
tools/bench_loader.py), which is 135x short of the chip's ~20k examples/s
training ceiling. The reference never notices because its torch step
consumes ~28 examples/s (``optimize.py:63``); a TPU does.

``PackedDataset`` pays the decode ONCE (parallel across processes — each
worker opens its own HDF5 handle, sidestepping the HDF5 global lock) and
keeps every padded field stacked in one contiguous numpy array. After
packing:

- ``__getitem__`` is a pure array view (no I/O, no padding work);
- ``get_batch(indices)`` returns an already-collated batch by fancy
  indexing — the PrefetchLoader detects it and skips per-entry stacking
  entirely (measured >100k examples/s host-side).

Memory: ~34 KB/entry (~3.4 GB per 100k entries) — printed at pack time.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from pmhc_tpu.data.dataset import PmhcDataset

_BATCH_KEYS = (
    "mask", "frames", "features", "aatype", "torsions", "torsions_mask",
    "pocket_aatype", "pocket_features", "pocket_mask", "pocket_frames",
    "pocket_atom14_positions", "pocket_atom14_exists",
)


def _decode_shard(args):
    path, names = args
    ds = PmhcDataset(path)
    return [ds.get_entry(n) for n in names]


class PackedDataset:
    """Decode-once, RAM-resident view of a SwiftMHC HDF5 file."""

    def __init__(self, hdf5_path: str, num_workers: int = 8, _entries=None):
        self.hdf5_path = hdf5_path
        base = PmhcDataset(hdf5_path)
        self.peptide_maxlen = base.peptide_maxlen
        self.pocket_maxlen = base.pocket_maxlen
        self.entry_names: List[str] = list(base.entry_names)
        self._base = base  # kept for get_protein_positions (PDB output)

        if _entries is None:
            from pmhc_tpu.data import native

            n = len(self.entry_names)
            if native.is_available():
                # C++ decoder (csrc/hdf5_decoder.cc): bit-exact twin of
                # get_entry at ~30x the throughput; one call packs the
                # whole file
                self._data = native.decode_packed(hdf5_path, self.entry_names)
                self.nbytes = sum(v.nbytes for v in self._data.values())
                return
            if num_workers > 1 and n >= 10_000:
                # process pool: each worker opens its own file handle, so
                # decode scales past libhdf5's in-process global lock.
                # spawn (not fork): JAX is multithreaded and fork deadlocks;
                # the ~seconds of child interpreter startup only amortizes
                # on large files, hence the entry-count threshold.
                import multiprocessing as mp
                from concurrent.futures import ProcessPoolExecutor

                shards = [
                    (hdf5_path, self.entry_names[i::num_workers])
                    for i in range(num_workers)
                ]
                with ProcessPoolExecutor(
                    num_workers, mp_context=mp.get_context("spawn")
                ) as pool:
                    results = list(pool.map(_decode_shard, shards))
                entries: List[Dict] = [None] * n
                for i, shard in enumerate(results):
                    entries[i::num_workers] = shard
            else:
                entries = [base.get_entry(name) for name in self.entry_names]
        else:
            entries = _entries

        self._data = {
            k: np.stack([e[k] for e in entries]) for k in _BATCH_KEYS
        }
        self.nbytes = sum(v.nbytes for v in self._data.values())

    def __len__(self) -> int:
        return len(self.entry_names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        out = {k: v[index] for k, v in self._data.items()}
        out["name"] = self.entry_names[index]
        return out

    def get_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Collated batch by fancy indexing — no per-entry work."""
        idx = np.asarray(indices)
        out = {k: v[idx] for k, v in self._data.items()}
        out["name"] = [self.entry_names[i] for i in indices]
        return out

    def get_protein_positions(self, entry_names: List[str]):
        return self._base.get_protein_positions(entry_names)


class DeviceDataset:
    """The packed dataset RESIDENT on device, batches gathered on-device.

    Motivation (measured, tools/bench_loader.py on the real chip): bulk
    ``device_put`` through the axon tunnel sustains only ~500 examples/s
    at batch 1024 — the host->device link, not decode, is the final
    loader wall in this environment. The TPU-native answer is to upload
    the WHOLE packed dataset once (~34 KB/entry: 3.4 GB per 100k entries,
    vs 16 GB HBM) and assemble batches with an on-device jitted gather —
    per batch, only the index vector crosses the link.

    Exposes the same ``get_batch`` protocol as PackedDataset, so the
    PrefetchLoader fast path works unchanged (its device_put of an
    already-committed device array is a no-op).
    """

    def __init__(self, packed: PackedDataset, sharding=None):
        import jax

        self.entry_names = packed.entry_names
        self.peptide_maxlen = packed.peptide_maxlen
        self.pocket_maxlen = packed.pocket_maxlen
        self.nbytes = packed.nbytes
        self._base = packed._base
        if sharding is not None:
            self._data = jax.device_put(packed._data, sharding)
        else:
            self._data = jax.device_put(packed._data)
        self._gather = jax.jit(
            lambda data, idx: jax.tree_util.tree_map(lambda x: x[idx], data)
        )

    def __len__(self) -> int:
        return len(self.entry_names)

    def __getitem__(self, index: int):
        out = {k: v[index] for k, v in self._data.items()}
        out["name"] = self.entry_names[index]
        return out

    def get_batch(self, indices: Sequence[int]):
        import jax.numpy as jnp

        out = dict(self._gather(self._data, jnp.asarray(indices)))
        out["name"] = [self.entry_names[i] for i in indices]
        return out

    @property
    def arrays(self):
        """The resident array pytree (no names) — for fused
        gather-in-step training (Trainer.train_indices)."""
        return self._data

    def get_protein_positions(self, entry_names: List[str]):
        return self._base.get_protein_positions(entry_names)
