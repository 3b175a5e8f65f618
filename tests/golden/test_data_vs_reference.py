"""Golden parity: HDF5 dataset vs the reference MhcpDataset.

Same synthetic SwiftMHC HDF5 file through both loaders; every padded array
must match exactly (frames compared at rotation-matrix level: the
reference derives quats by eigendecomposition with arbitrary sign,
SURVEY.md §3.5.4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference import install

install()

from diffusion.data import MhcpDataset  # noqa: E402

from pmhc_tpu.data import PmhcDataset, write_synthetic_hdf5  # noqa: E402
from pmhc_tpu.data.loader import PrefetchLoader, collate  # noqa: E402


@pytest.fixture(scope="module")
def h5_path(tmp_path_factory):
    import os

    # real-data runbook hook (docs/realdata.md A.2): point the whole
    # golden suite at a real SwiftMHC export instead of the generator
    real = os.environ.get("PMHC_GOLDEN_HDF5")
    if real:
        return real
    path = str(tmp_path_factory.mktemp("data") / "synthetic.hdf5")
    write_synthetic_hdf5(
        path, n_entries=5, peptide_lengths=(8, 9, 10, 11, 16), protein_len=100,
        pocket_len=55, seed=11,
    )
    return path


def quats_to_mats(t7):
    from pmhc_tpu.geometry import quat_to_rot
    import jax.numpy as jnp

    return np.asarray(quat_to_rot(jnp.asarray(t7[..., :4])))


def test_entry_parity(h5_path):
    ours_ds = PmhcDataset(h5_path)
    ref_ds = MhcpDataset(h5_path)
    assert ours_ds.entry_names == ref_ds.entry_names

    for i in range(len(ours_ds)):
        ours = ours_ds[i]
        theirs = ref_ds[i]
        assert ours["name"] == theirs["name"][0]
        for key in ("mask", "features", "aatype", "torsions", "torsions_mask",
                    "pocket_aatype", "pocket_features", "pocket_mask",
                    "pocket_atom14_positions", "pocket_atom14_exists"):
            np.testing.assert_array_equal(
                np.asarray(ours[key], dtype=np.float64),
                theirs[key].numpy().astype(np.float64),
                err_msg=f"field {key!r} diverged for entry {i}",
            )
        for key in ("frames", "pocket_frames"):
            ref_t7 = theirs[key].numpy()
            np.testing.assert_allclose(
                ours[key][..., 4:], ref_t7[..., 4:], atol=1e-6,
                err_msg=f"{key} translations",
            )
            np.testing.assert_allclose(
                quats_to_mats(ours[key]), quats_to_mats(ref_t7), atol=1e-4,
                err_msg=f"{key} rotations",
            )


def test_protein_positions_parity(h5_path):
    ours_ds = PmhcDataset(h5_path)
    ref_ds = MhcpDataset(h5_path)
    names = ours_ds.entry_names[:3]
    ours = ours_ds.get_protein_positions(names)
    theirs = ref_ds.get_protein_positions(names)
    for key in ours:
        np.testing.assert_array_equal(
            np.asarray(ours[key], dtype=np.float64),
            theirs[key].numpy().astype(np.float64),
            err_msg=f"{key} diverged",
        )


def test_prefetch_loader_batches(h5_path):
    ds = PmhcDataset(h5_path)
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3, device_put=False)
    batches = list(loader)
    assert len(batches) == 3  # 5 entries, batch 2, keep last
    assert batches[0]["frames"].shape == (2, 16, 7)
    assert batches[-1]["frames"].shape == (1, 16, 7)
    seen = [n for b in batches for n in b["name"]]
    assert sorted(seen) == sorted(ds.entry_names)
    # epochs reshuffle deterministically given the seed
    loader2 = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3, device_put=False)
    seen2 = [n for b in loader2 for n in b["name"]]
    assert seen2 == seen


def test_loader_host_sharding(h5_path):
    ds = PmhcDataset(h5_path)
    seen = []
    for pi in range(2):
        loader = PrefetchLoader(
            ds, batch_size=2, device_put=False, process_index=pi, process_count=2
        )
        seen.extend(n for b in loader for n in b["name"])
    assert sorted(seen) == sorted(ds.entry_names)


def test_collate_matches_reference_stacking(h5_path):
    ours_ds = PmhcDataset(h5_path)
    entries = [ours_ds[i] for i in range(2)]
    batch = collate(entries)
    assert batch["name"] == [e["name"] for e in entries]
    assert batch["mask"].shape == (2, 16)
