"""Import shim for golden-parity tests against the mounted PyTorch reference.

The reference (/root/reference) imports ``openfold.*``, which is not
installed; the identical code is vendored inside transformers at
``transformers.models.esm.openfold_utils`` (see SURVEY.md preamble). This
shim aliases that vendored copy under the ``openfold`` package name and puts
/root/reference on sys.path, so tests can run the actual reference
implementation side by side with pmhc_tpu.

``openfold.utils.loss.compute_fape`` is stubbed: the reference imports it
(``diffusion/optimizer.py:8``) but never calls it (SURVEY.md §2.2), and the
vendored loss module does not define it.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def install():
    """Install the openfold shim and reference path. Returns the reference
    ``diffusion`` package or None if unavailable."""
    if "openfold" not in sys.modules:
        from transformers.models.esm import openfold_utils as of

        openfold = types.ModuleType("openfold")
        utils = types.ModuleType("openfold.utils")
        np_mod = types.ModuleType("openfold.np")

        loss_shim = types.ModuleType("openfold.utils.loss")
        loss_shim.compute_fape = None  # dead import in the reference

        utils.rigid_utils = of.rigid_utils
        utils.feats = of.feats
        utils.loss = loss_shim
        np_mod.residue_constants = of.residue_constants
        openfold.utils = utils
        openfold.np = np_mod

        sys.modules["openfold"] = openfold
        sys.modules["openfold.utils"] = utils
        sys.modules["openfold.np"] = np_mod
        sys.modules["openfold.utils.rigid_utils"] = of.rigid_utils
        sys.modules["openfold.utils.feats"] = of.feats
        sys.modules["openfold.utils.loss"] = loss_shim
        sys.modules["openfold.np.residue_constants"] = of.residue_constants

    if "Bio" not in sys.modules:
        # BioPython is not installed in this environment; the reference's
        # diffusion.optimizer transitively imports its PDB writer, so stub
        # the Bio.PDB object model (golden tests never call save()).
        bio = types.ModuleType("Bio")
        bio_pdb = types.ModuleType("Bio.PDB")
        placeholder = type("BioStub", (), {"__init__": lambda self, *a, **k: None})
        for name, attr in (
            ("Structure", "Structure"),
            ("Model", "Model"),
            ("Chain", "Chain"),
            ("Residue", "Residue"),
            ("Atom", "Atom"),
            ("PDBIO", "PDBIO"),
        ):
            mod = types.ModuleType(f"Bio.PDB.{name}")
            setattr(mod, attr, placeholder)
            sys.modules[f"Bio.PDB.{name}"] = mod
            setattr(bio_pdb, name, mod)
        sys.modules["Bio"] = bio
        sys.modules["Bio.PDB"] = bio_pdb
        bio.PDB = bio_pdb

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)

    import diffusion  # the reference package

    return diffusion
