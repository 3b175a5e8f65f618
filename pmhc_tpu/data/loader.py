"""Host-side prefetching batch loader with device double-buffering.

The reference parallelizes loading with 4 forked DataLoader worker
processes and moves tensors to the device inside the workers
(``optimize.py:63``, ``data.py:57-102`` — SURVEY.md §3.1 "unusual design").
TPU-native version:

- a thread pool maps ``PmhcDataset.get_entry`` over the epoch order (h5py
  releases the GIL, so threads overlap HDF5 I/O without fork overhead);
- batches are collated on the host as numpy and uploaded with
  ``jax.device_put`` (optionally against a ``NamedSharding`` so each data
  shard lands directly on its mesh device);
- a prefetch queue keeps ``prefetch`` batches in flight so step N+1's
  upload overlaps step N's compute (double buffering);
- multi-host: pass ``process_index``/``process_count`` to shard the entry
  list per host (SURVEY.md §2.3 "Host/data-loading parallelism").

Shuffling is seeded numpy permutation per epoch — deterministic across
hosts given the same seed.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Sequence

import numpy as np

try:
    import jax
except ImportError:  # pragma: no cover - loader is usable host-only
    jax = None


def collate(entries: Sequence[Dict[str, np.ndarray]]) -> Dict[str, Any]:
    """Stack entry dicts; string fields become lists (the reference's
    default torch collation keeps 'name' as a list, ``data.py:105``)."""
    batch: Dict[str, Any] = {}
    for key in entries[0]:
        vals = [e[key] for e in entries]
        if isinstance(vals[0], str):
            batch[key] = vals
        else:
            batch[key] = np.stack(vals)
    return batch


class PrefetchLoader:
    """Iterable over device-resident batches of a PmhcDataset."""

    def __init__(
        self,
        dataset,
        batch_size: int = 64,
        shuffle: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        drop_last: bool = False,
        sharding=None,
        device_put: bool = True,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.drop_last = drop_last
        self.sharding = sharding
        self.device_put = device_put
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

    def _epoch_indices(self) -> List[int]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            order = rng.permutation(n)
        # per-host shard of the epoch order
        return list(order[self.process_index :: self.process_count])

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        indices = self._epoch_indices()
        self._epoch += 1

        batches: List[List[int]] = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def upload(batch):
            if self.device_put and jax is not None:
                names = batch.pop("name", None)
                if self.sharding is not None:
                    batch = jax.device_put(batch, self.sharding)
                else:
                    batch = jax.device_put(batch)
                if names is not None:
                    batch["name"] = names
            return batch

        def produce_packed():
            # PackedDataset fast path: collated batches come out of one
            # fancy-indexing call; no per-entry decode, no stacking
            try:
                for batch_idx in batches:
                    out_q.put(upload(self.dataset.get_batch(batch_idx)))
            except Exception as exc:
                out_q.put(exc)
            finally:
                out_q.put(sentinel)

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    # sliding window: entry reads for the next few batches
                    # are IN FLIGHT while the current batch collates and
                    # uploads, so HDF5 I/O overlaps the host-side stack +
                    # device_put instead of serializing behind them
                    window = self.prefetch + 1
                    pending = [
                        [pool.submit(self.dataset.__getitem__, i) for i in b]
                        for b in batches[:window]
                    ]
                    for k, batch_idx in enumerate(batches):
                        futures = pending[k]
                        if k + window < len(batches):
                            pending.append([
                                pool.submit(self.dataset.__getitem__, i)
                                for i in batches[k + window]
                            ])
                        entries = [f.result() for f in futures]
                        out_q.put(upload(collate(entries)))
            except Exception as exc:  # surface loader errors to the consumer
                out_q.put(exc)
            finally:
                out_q.put(sentinel)

        producer = (
            produce_packed if hasattr(self.dataset, "get_batch") else produce
        )
        thread = threading.Thread(target=producer, daemon=True)
        thread.start()

        while True:
            item = out_q.get()
            if item is sentinel:
                break
            if isinstance(item, Exception):
                raise item
            yield item
