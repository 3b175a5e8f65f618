#!/usr/bin/env python
"""Generate pmhc_tpu's residue-constant data files.

The reference depends on OpenFold's ``residue_constants`` module
(reference ``diffusion/tools/pdb.py:14-23``), ~979 lines of static
literature data (AlphaFold's idealized amino-acid geometry) plus derived
numpy tables built at import time ([openfold] residue_constants.py:831-862).

Rather than vendoring that module, we extract exactly the tables the
framework needs from the transformers-vendored copy (an installed
third-party package, same values) into:

- ``pmhc_tpu/constants/data/residue_tables.npz`` — the 4 derived arrays
- ``pmhc_tpu/constants/data/residue_names.json`` — name tables + the
  rigid_group_atom_positions literature dict

Run once and commit the outputs; the framework itself has no dependency
on transformers.
"""

import json
import os

import numpy as np

from transformers.models.esm.openfold_utils import residue_constants as rc

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pmhc_tpu",
    "constants",
    "data",
)


def main():
    os.makedirs(OUT_DIR, exist_ok=True)

    np.savez_compressed(
        os.path.join(OUT_DIR, "residue_tables.npz"),
        restype_rigid_group_default_frame=np.asarray(
            rc.restype_rigid_group_default_frame, dtype=np.float32
        ),
        restype_atom14_to_rigid_group=np.asarray(
            rc.restype_atom14_to_rigid_group, dtype=np.int32
        ),
        restype_atom14_mask=np.asarray(rc.restype_atom14_mask, dtype=np.float32),
        restype_atom14_rigid_group_positions=np.asarray(
            rc.restype_atom14_rigid_group_positions, dtype=np.float32
        ),
    )

    names = {
        "restypes": list(rc.restypes),
        "restype_1to3": dict(rc.restype_1to3),
        "restype_name_to_atom14_names": {
            k: list(v) for k, v in rc.restype_name_to_atom14_names.items()
        },
        "rigid_group_atom_positions": {
            res: [[a, int(g), [float(x) for x in p]] for a, g, p in entries]
            for res, entries in rc.rigid_group_atom_positions.items()
        },
    }
    with open(os.path.join(OUT_DIR, "residue_names.json"), "w") as f:
        json.dump(names, f)

    print(f"wrote tables to {OUT_DIR}")


if __name__ == "__main__":
    main()
