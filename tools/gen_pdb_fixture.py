#!/usr/bin/env python
"""Generate the golden PDB fixture by running the REFERENCE writer
(/root/reference/diffusion/tools/pdb.py) through the BioPython-semantics
stub (tests/golden/bio_stub.py), on a deterministic synthetic entry.

Commits two artifacts (tests/golden/fixtures/):
- pdb_input.npz  — the exact writer input (ground-truth frames/torsions
  from the synthetic dataset, so no RNG is involved);
- reference_sample.pdb — the reference writer's byte output.

tests/golden/test_pdb_golden.py asserts our first-party writer
(pmhc_tpu/io/pdb.py) reproduces the file byte-for-byte.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the functional Bio stub must be installed BEFORE tests._reference, whose
# own placeholder stub would otherwise win
from tests.golden import bio_stub

bio_stub.install()

from tests._reference import install

install()

import numpy as np
import torch

from diffusion.tools.pdb import save as ref_save
from openfold.utils.rigid_utils import Rigid

from pmhc_tpu.data import PmhcDataset, write_synthetic_hdf5
from pmhc_tpu.data.loader import collate

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "fixtures",
)


def main():
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    with tempfile.TemporaryDirectory() as d:
        h5 = os.path.join(d, "fix.hdf5")
        write_synthetic_hdf5(h5, n_entries=2, peptide_lengths=(9, 11), seed=7)
        ds = PmhcDataset(h5)
        batch = collate([ds[i] for i in range(2)])
        names = batch.pop("name")
        batch.update(ds.get_protein_positions(names))

    np.savez(os.path.join(FIXTURE_DIR, "pdb_input.npz"),
             **{k: np.asarray(v) for k, v in batch.items()})

    ref_batch = {k: torch.tensor(np.asarray(v)) for k, v in batch.items()}
    ref_batch["frames"] = Rigid.from_tensor_7(ref_batch["frames"])

    for i in range(2):
        out = os.path.join(FIXTURE_DIR, f"reference_sample_{i}.pdb")
        ref_save(ref_batch, i, out)
        print("wrote", out, os.path.getsize(out), "bytes")


if __name__ == "__main__":
    main()
