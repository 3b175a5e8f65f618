"""Independent re-implementation of BioPython PDBIO's save semantics.

Second, structurally different implementation of the serialization rules
in ``Bio/PDB/PDBIO.py`` (BioPython 1.8x), used to cross-check
``bio_stub.py``: the stub renders through BioPython's single
``_ATOM_FORMAT_STRING`` %-format; this module builds each record
column-by-column from the PDB v3.3 fixed-column layout, implementing
every formatting rule separately:

- ATOM serial: columns 7-11, right-justified, sequential from 1 in file
  order (``preserve_atom_numbering=False``); Python ``%5i`` widens the
  field on overflow (serial > 99999) rather than truncating, which the
  column builder reproduces by right-justifying to a MINIMUM of 5.
- atom name: columns 13-16 left-justified, with the leading-space rule —
  pad iff the stripped name is < 4 chars AND starts with a letter AND
  the element is a single character (numeric-leading hydrogen names like
  ``1HB`` are NOT padded).
- altloc col 17; resname cols 18-20 right-justified (%3s); chain id col
  22; resseq cols 23-26 right-justified (widening on >9999); icode col
  27.
- coords cols 31-54: three %8.3f fields, widening on overflow.
- occupancy cols 55-60 (%6.2f), bfactor cols 61-66 (%6.2f).
- segid cols 73-76 right-justified (%4s — BioPython passes segid through
  ``%4s``, so a 1-char segid lands in col 76), element cols 77-78
  right-justified.
- TER: ``TER`` + serial (sharing the atom counter WITHOUT incrementing
  it — the next chain's first atom reuses the number), resname, chain
  id, resseq, icode of the LAST residue ITERATED (BioPython takes the
  fields from the residue loop variable, so a trailing atom-less
  residue still supplies the TER identity), line space-padded to 80
  columns. Emitted once per chain that produced at least one atom.
- MODEL/ENDMDL wrap each model only when the structure has > 1 model;
  MODEL is ``"MODEL      %i"`` (no padding to 80 in 1.8x's save path as
  the reference exercises it). Trailing ``END``.

Corpus cross-check: tests/golden/test_pdbio_stub_vs_vendored.py.
"""

from __future__ import annotations


def _rj(value, width: int) -> str:
    """Right-justify to a MINIMUM width (Python %*i/%*s semantics:
    overflow widens the field, never truncates)."""
    s = str(value)
    return s if len(s) >= width else s.rjust(width)


def _fixed(value: float, width: int, decimals: int) -> str:
    return _rj(f"{float(value):.{decimals}f}", width)


def _atom_name_field(fullname: str, element: str) -> str:
    name = fullname.strip()
    if len(name) < 4 and name[:1].isalpha() and len(element.strip()) < 2:
        name = " " + name
    return name if len(name) >= 4 else name.ljust(4)


def _atom_record(serial: int, atom, residue, chain_id: str) -> str:
    hetfield, resseq, icode = residue.id
    record = "ATOM  " if hetfield == " " else "HETATM"
    element = (atom.element or "").strip().upper()
    x, y, z = (float(c) for c in atom.coord)
    cols = [
        record,                                   # 1-6
        _rj(serial, 5),                           # 7-11
        " ",
        _atom_name_field(atom.get_fullname(), element),  # 13-16
        str(atom.altloc),                         # 17
        _rj(residue.resname, 3),                  # 18-20
        " ",
        str(chain_id),                            # 22
        _rj(resseq, 4),                           # 23-26
        str(icode),                               # 27
        "   ",
        _fixed(x, 8, 3), _fixed(y, 8, 3), _fixed(z, 8, 3),  # 31-54
        _fixed(atom.occupancy, 6, 2),             # 55-60
        _fixed(atom.bfactor, 6, 2),               # 61-66
        "      ",
        _rj(residue.segid, 4),                    # 73-76
        _rj(element, 2),                          # 77-78
        _rj("", 2),                               # charge ("%2s" % "")
    ]
    return "".join(cols) + "\n"


def _ter_record(serial: int, residue, chain_id: str) -> str:
    _, resseq, icode = residue.id
    line = (
        "TER   "
        + _rj(serial, 5)
        + "      "
        + _rj(residue.resname, 3)
        + " "
        + str(chain_id)
        + _rj(resseq, 4)
        + str(icode)
    )
    return line.ljust(80) + "\n"


def save(structure, path, write_end: bool = True) -> None:
    """Serialize a (stub- or BioPython-shaped) entity tree to ``path``
    with PDBIO semantics, built column-by-column (see module doc)."""
    models = list(structure)
    multi = len(models) > 1
    serial = 1
    lines = []
    for model in models:
        if multi:
            lines.append("MODEL      %i\n" % model.id)
        for chain in model:
            wrote_any = False
            residue = None
            for residue in chain:
                for atom in residue.get_unpacked_list():
                    lines.append(_atom_record(serial, atom, residue,
                                              chain.id))
                    serial += 1
                    wrote_any = True
            # BioPython takes the TER identity from the residue loop
            # variable — the last residue ITERATED, atoms or not
            if wrote_any:
                lines.append(_ter_record(serial, residue, chain.id))
        if multi:
            lines.append("ENDMDL\n")
    if write_end:
        lines.append("END\n")
    with open(path, "w") as fp:
        fp.writelines(lines)
