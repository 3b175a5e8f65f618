"""Byte-level golden test of the first-party PDB writer against output of
the REFERENCE writer (/root/reference/diffusion/tools/pdb.py).

The fixtures were produced by running the reference's ``save()`` itself —
its openfold-driven atom placement, O/OXT geometry, orderings and
numbering — through a BioPython-semantics serializer stub
(tests/golden/bio_stub.py, mirroring Bio/PDB/PDBIO.py 1.8x), on a
deterministic synthetic input (tools/gen_pdb_fixture.py; the input arrays
are committed alongside). Our writer must reproduce the files
byte-for-byte.

To re-confirm the serializer stub against REAL BioPython, rerun
tools/gen_pdb_fixture.py in any environment where ``import Bio`` works
(bio_stub.install() defers to an existing Bio module) and diff the
fixtures.
"""

import os

import numpy as np
import pytest

from pmhc_tpu.geometry import RigidArray
from pmhc_tpu.io import save_pdb

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.mark.parametrize("index", [0, 1])
def test_pdb_writer_byte_matches_reference(tmp_path, index):
    data = dict(np.load(os.path.join(FIXTURES, "pdb_input.npz")))
    batch = dict(data)
    frames_t7 = batch.pop("frames")
    batch["frames"] = RigidArray.from_tensor_7(frames_t7)

    out = tmp_path / f"ours_{index}.pdb"
    save_pdb(batch, index, str(out))

    ref_path = os.path.join(FIXTURES, f"reference_sample_{index}.pdb")
    ref_lines = open(ref_path).read().splitlines()
    our_lines = open(out).read().splitlines()

    assert len(our_lines) == len(ref_lines), (
        f"line count {len(our_lines)} != reference {len(ref_lines)}"
    )
    n_diff = 0
    for k, (a, b) in enumerate(zip(our_lines, ref_lines)):
        if a != b:
            n_diff += 1
            if n_diff <= 5:
                print(f"line {k + 1}:\n  ours {a!r}\n  ref  {b!r}")
    assert n_diff == 0, f"{n_diff} differing lines"
