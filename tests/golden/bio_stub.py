"""Minimal BioPython (Bio.PDB) stand-in for running the REFERENCE PDB
writer (/root/reference/diffusion/tools/pdb.py) in this environment, where
BioPython is not installed.

Implements exactly the surface the reference imports — Structure, Model,
Chain, Residue, Atom, PDBIO — with the serialization semantics of
BioPython 1.8x's ``Bio/PDB/PDBIO.py``:

- ``_ATOM_FORMAT_STRING = "%s%5i %-4s%c%3s %c%4i%c   %8.3f%8.3f%8.3f%s%6.2f      %4s%2s%2s\\n"``
- atom NAME field: fullname is stripped, then re-padded with one leading
  space when the name is < 4 chars, starts alphabetic, and the element is
  a single character;
- atoms are RENUMBERED sequentially from 1 in file order (PDBIO's default
  ``preserve_atom_numbering=False``);
- one TER record per non-empty chain carrying (next serial, last resname,
  chain id, last resseq, icode), padded to 80 columns; the TER serial is
  shared with the next chain's first atom (BioPython quirk: the counter
  is not incremented for TER);
- the residue SEGID (the reference passes the chain id as segid,
  ``pdb.py:102,185``) lands in columns 73-76;
- MODEL/ENDMDL only for multi-model structures; trailing ``END`` record.

These semantics are mirrored from the BioPython source; any environment
with real BioPython can confirm byte-parity by swapping this module out
(tests/golden/test_pdb_golden.py documents the procedure).
"""

from __future__ import annotations

import numpy as np

_ATOM_FORMAT = "%s%5i %-4s%c%3s %c%4i%c   %8.3f%8.3f%8.3f%s%6.2f      %4s%2s%2s\n"


class Entity:
    def __init__(self):
        self.child_list = []

    def add(self, child):
        self.child_list.append(child)

    def __iter__(self):
        return iter(self.child_list)


class Structure(Entity):
    def __init__(self, id):
        super().__init__()
        self.id = id


class Model(Entity):
    def __init__(self, id):
        super().__init__()
        self.id = id


class Chain(Entity):
    def __init__(self, id):
        super().__init__()
        self.id = id


class Residue(Entity):
    def __init__(self, id, resname, segid):
        super().__init__()
        self.id = id  # (hetfield, resseq, icode)
        self.resname = resname
        self.segid = segid

    def get_unpacked_list(self):
        return self.child_list


class Atom:
    # signature matches Bio.PDB.Atom.Atom.__init__ as the reference calls
    # it: Atom(name, coord, bfactor, occupancy, altloc, fullname, serial,
    # element=...)
    def __init__(self, name, coord, bfactor, occupancy, altloc, fullname,
                 serial_number, element=None):
        self.name = name
        self.coord = np.asarray(
            coord.detach().numpy() if hasattr(coord, "detach") else coord,
            dtype=np.float64,
        )
        self.bfactor = bfactor
        self.occupancy = occupancy
        self.altloc = altloc
        self.fullname = fullname
        self.serial_number = serial_number
        self.element = (element or "").strip().upper()

    def get_fullname(self):
        return self.fullname


class PDBIO:
    def set_structure(self, structure):
        self.structure = structure

    def save(self, path, write_end=True):
        with open(path, "w") as fp:
            models = list(self.structure)
            multi = len(models) > 1
            atom_number = 1
            for model in models:
                if multi:
                    fp.write("MODEL      %i\n" % model.id)
                for chain in model:
                    wrote = False
                    resname = resseq = icode = None
                    for residue in chain:
                        hetfield, resseq, icode = residue.id
                        resname = residue.resname
                        segid = residue.segid
                        for atom in residue.get_unpacked_list():
                            record = "ATOM  " if hetfield == " " else "HETATM"
                            name = atom.get_fullname().strip()
                            element = atom.element
                            if (len(name) < 4 and name[:1].isalpha()
                                    and len(element) < 2):
                                name = " " + name
                            x, y, z = atom.coord
                            line = _ATOM_FORMAT % (
                                record, atom_number, name, atom.altloc,
                                resname, chain.id, resseq, icode,
                                x, y, z, "%6.2f" % atom.occupancy,
                                atom.bfactor, segid, element, "",
                            )
                            fp.write(line)
                            atom_number += 1
                            wrote = True
                    if wrote:
                        ter = "TER   %5i      %3s %c%4i%c" % (
                            atom_number, resname, chain.id, resseq, icode)
                        fp.write(ter.ljust(80) + "\n")
                if multi:
                    fp.write("ENDMDL\n")
            if write_end:
                fp.write("END\n")


def install():
    """Register this module as Bio.PDB.* so the reference's imports
    resolve (``from Bio.PDB.Structure import Structure`` etc.). No-op
    when real BioPython is importable — rerunning the fixture generator
    in such an environment validates this stub byte-for-byte."""
    import sys
    import types

    try:
        import Bio.PDB  # noqa: F401
        return
    except ImportError:
        pass

    this = sys.modules[__name__]
    bio = types.ModuleType("Bio")
    pdb = types.ModuleType("Bio.PDB")
    for name, obj in (("Structure", Structure), ("Model", Model),
                      ("Chain", Chain), ("Residue", Residue),
                      ("Atom", Atom), ("PDBIO", PDBIO)):
        mod = types.ModuleType(f"Bio.PDB.{name}")
        setattr(mod, name, obj)
        sys.modules[f"Bio.PDB.{name}"] = mod
        setattr(pdb, name, mod)
    mod = types.ModuleType("Bio.PDB.PDBIO")
    mod.PDBIO = PDBIO
    sys.modules["Bio.PDB.PDBIO"] = mod
    pdb.PDBIO = mod
    bio.PDB = pdb
    sys.modules.setdefault("Bio", bio)
    sys.modules["Bio.PDB"] = pdb
