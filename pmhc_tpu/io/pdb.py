"""PDB file writer: sampled frames + torsions -> all-atom PDB.

Behavioral twin of the reference writer (``diffusion/tools/pdb.py:34-211``):

- chain P: the peptide. Backbone-group atoms (N, CA, C, CB) placed by
  applying the (re-normalized) residue frame to literature positions
  (``pdb.py:106-116``); side-chain atoms beyond atom14 slot 4 from the
  idealized atom14 coordinates (``pdb.py:119-128``); each residue's
  backbone O placed from the previous residue's CA/C and this residue's N
  (``pdb.py:130-143``); the terminal residue gets O from the psi-group
  frame and a mirrored OXT (``pdb.py:145-176``).
- chain M: the full MHC protein from its stored atom14 coordinates and
  existence mask (``pdb.py:178-204``).

Differences by design:
- serialization is first-party fixed-width PDB records, byte-compatible
  with what BioPython's PDBIO (which the reference drives) emits for
  these structures: sequential atom renumbering in file order, the
  residue segid (= chain id) in columns 73-76, a TER record per chain
  carrying (next serial, last resname, chain, last resseq) whose serial
  is shared with the next chain's first atom (PDBIO quirk), and END.
  Golden test: tests/golden/test_pdb_golden.py byte-diffs against
  fixtures produced by the REFERENCE writer itself
  (tools/gen_pdb_fixture.py);
- the reference's latent IndexError for peptides of exactly maxlen
  (``pdb.py:145`` reads mask[i+1] before the bounds check — SURVEY.md
  §3.5.8) is fixed: bounds are checked first.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

import pmhc_tpu.constants as rc
from pmhc_tpu.geometry import RigidArray
from pmhc_tpu.io.atoms import (
    PSI_GROUP,
    frames_to_atom14_positions,
    torsion_angles_to_frames,
)

BACKBONE_GROUP = 0


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(n, 1e-12)


def _ter_record(serial, resname, chain, resseq) -> str:
    return f"TER   {serial:>5}      {resname:>3} {chain}{resseq:>4} ".ljust(80) + "\n"


_NAME_FIELD_CACHE: Dict[str, tuple] = {}


def _name_fields(name: str):
    """(4-byte name field, 2-byte element field) as packed bytes —
    PDBIO's _ATOM_FORMAT_STRING padding rules (short names get a leading
    space then left-justify to 4; element is name[0] right-justified)."""
    hit = _NAME_FIELD_CACHE.get(name)
    if hit is None:
        field = (" " + name).ljust(4)[:4] if len(name) < 4 else name[:4]
        hit = (np.frombuffer(field.encode(), np.uint8),
               np.frombuffer(f"{name[0]:>2}".encode(), np.uint8))
        _NAME_FIELD_CACHE[name] = hit
    return hit


def _build_atom14_tables():
    """Static per-(restype, atom14 slot) record fields for the vectorized
    chain-M emit: every column of an ATOM record except serial/resseq/
    coords is a function of (restype, slot) alone."""
    R = len(rc.restypes)
    names4 = np.full((R, 14, 4), ord(" "), np.uint8)
    elems2 = np.full((R, 14, 2), ord(" "), np.uint8)
    valid = np.zeros((R, 14), bool)
    res3 = np.zeros((R, 3), np.uint8)
    for r, rt in enumerate(rc.restypes):
        aa = rc.restype_1to3[rt]
        res3[r] = np.frombuffer(f"{aa:>3}".encode(), np.uint8)
        for s, name in enumerate(rc.restype_name_to_atom14_names[aa]):
            if not name.strip():
                continue
            names4[r, s], elems2[r, s] = _name_fields(name)
            valid[r, s] = True
    return names4, elems2, valid, res3


_A14_NAMES4, _A14_ELEMS2, _A14_VALID, _RES3 = _build_atom14_tables()


def _emit_atoms(serial_start: int, chain: str, names4, resnames3, elements2,
                resseqs, xyz) -> bytes:
    """All ATOM records of one chain as bytes, from packed field arrays
    (names4 [n,4] u8, resnames3 [n,3] u8, elements2 [n,2] u8, resseqs
    int, xyz f64 [n,3]). Native snprintf formatter when available
    (csrc/pdb_formatter.cc — the CLI's profiled host wall was f-string
    formatting at ~6.8 ms/entry); pure-Python fallback otherwise or when
    PMHC_PDB_FORMATTER=python. Both paths are byte-identical
    (tests/unit/test_pdb_native_formatter.py)."""
    import os

    n = len(resseqs)
    serials = np.arange(serial_start + 1, serial_start + n + 1, dtype=np.int32)
    xyz = np.asarray(xyz, np.float64)
    if os.environ.get("PMHC_PDB_FORMATTER") != "python":
        from pmhc_tpu.io import pdb_native

        blob = pdb_native.format_atoms(
            serials, np.asarray(resseqs, np.int32), chain,
            np.asarray(names4), np.asarray(resnames3),
            np.asarray(elements2), xyz,
        )
        if blob is not None:
            return blob
    nm = np.asarray(names4).tobytes().decode()
    rs = np.asarray(resnames3).tobytes().decode()
    el = np.asarray(elements2).tobytes().decode()
    sq = resseqs.tolist() if hasattr(resseqs, "tolist") else list(resseqs)
    ch4 = f"{chain:>4}"
    lines = [
        f"ATOM  {k:>5} {nm[4*j:4*j+4]} {rs[3*j:3*j+3]} {chain}{sq[j]:>4}    "
        f"{xyz[j, 0]:8.3f}{xyz[j, 1]:8.3f}{xyz[j, 2]:8.3f}"
        f"  1.00  0.00      {ch4}{el[2*j:2*j+2]}  \n"
        for j, k in enumerate(range(serial_start + 1, serial_start + n + 1))
    ]
    return "".join(lines).encode()


def convert_batch_for_pdb(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Dispatch the batch-level torsion->frames->atom14 conversion ONCE
    (device arrays out, no blocking fetch). The sampling CLI queues this
    right after a batch's sampler dispatch and fetches it one batch
    later, so PDB writing overlaps the next batch's device time."""
    import jax.numpy as jnp

    frames: RigidArray = batch["frames"]
    group_rots, group_trans = torsion_angles_to_frames(
        frames,
        jnp.asarray(batch["torsions"]),
        jnp.asarray(batch["aatype"]),
        jnp.asarray(rc.restype_rigid_group_default_frame),
    )
    atom14 = frames_to_atom14_positions(
        group_rots,
        group_trans,
        jnp.asarray(batch["aatype"]),
        jnp.asarray(rc.restype_atom14_to_rigid_group),
        jnp.asarray(rc.restype_atom14_mask),
        jnp.asarray(rc.restype_atom14_rigid_group_positions),
    )
    return {
        "aatype": batch["aatype"],
        "mask": batch["mask"],
        "quats": frames.quats,
        "trans": frames.trans,
        "atom14": atom14,
        "group_rots": group_rots,
        "group_trans": group_trans,
        "protein_aatype": batch["protein_aatype"],
        "protein_atom14_positions": batch["protein_atom14_positions"],
        "protein_atom14_exists": batch["protein_atom14_exists"],
    }


def fetch_pdb_arrays(conv: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Fetch a ``convert_batch_for_pdb`` result to host numpy."""
    pc = {k: np.asarray(v) for k, v in conv.items()}
    pc["mask"] = pc["mask"].astype(bool)
    pc["protein_atom14_exists"] = pc["protein_atom14_exists"].astype(bool)
    return pc


def precompute_pdb_arrays(batch: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Run the batch-level torsion->frames->atom14 conversion ONCE and
    fetch every array ``save_pdb`` reads to host numpy.

    Without this, writing a B-entry batch pays B redundant full-batch
    device dispatches + fetches (one per ``save_pdb`` call) — measured
    as the end-to-end wall of the sampling CLI at batch 256+."""
    return fetch_pdb_arrays(convert_batch_for_pdb(batch))


def save_pdb(
    batch: Dict[str, Any],
    batch_index: int,
    path: str,
    precomputed: Dict[str, np.ndarray] | None = None,
) -> None:
    """Write one complex (peptide chain P + protein chain M) as PDB.

    ``batch`` holds the sampler output plus ``get_protein_positions``
    fields: frames (RigidArray [B, N]), torsions [B, N, 7, 2], aatype,
    mask, protein_aatype, protein_atom14_positions, protein_atom14_exists.
    When writing many entries of one batch, pass
    ``precomputed=precompute_pdb_arrays(batch)`` so the batch-level
    conversion and device fetches run once, not per entry.
    """
    data = pdb_bytes(batch, batch_index, precomputed)
    with open(path, "wb") as f:
        f.write(data)


def pdb_bytes(
    batch: Dict[str, Any] | None,
    batch_index: int,
    precomputed: Dict[str, np.ndarray] | None = None,
) -> bytes:
    """The PDB file contents for one complex, in memory (the serving
    path returns these over the wire instead of touching disk; the
    bytes are identical to what ``save_pdb`` writes)."""
    pc = precomputed if precomputed is not None else precompute_pdb_arrays(batch)

    b = batch_index
    aatype = pc["aatype"][b]
    mask = pc["mask"][b]
    quats = _normalize(pc["quats"][b])
    trans = pc["trans"][b]
    atom14_np = pc["atom14"][b]
    group_rots_np = pc["group_rots"][b]
    group_trans_np = pc["group_trans"][b]
    n_res = aatype.shape[0]

    def apply_frame(i: int, p) -> np.ndarray:
        q = quats[i]
        w, x, y, z = q
        m = np.array(
            [
                [w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)],
                [2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)],
                [2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z],
            ]
        )
        return m @ np.asarray(p, dtype=np.float64) + trans[i]

    serial = 0
    atom_pos: Dict[tuple, np.ndarray] = {}
    residue_atoms: Dict[int, list] = {}

    def add_atom(res_idx: int, name: str, pos: np.ndarray):
        nonlocal serial
        serial += 1
        residue_atoms.setdefault(res_idx, []).append((serial, name, pos))
        atom_pos[(res_idx, name)] = np.asarray(pos, dtype=np.float64)

    for i in range(n_res):
        if not mask[i]:
            continue
        aa_name = rc.restype_1to3[rc.restypes[int(aatype[i])]]

        # backbone group atoms from the residue frame (pdb.py:106-116)
        for atom_name, group_id, p in rc.rigid_group_atom_positions[aa_name]:
            if group_id == BACKBONE_GROUP:
                add_atom(i, atom_name, apply_frame(i, p))

        # side chain beyond CB from idealized atom14 (pdb.py:119-128)
        for atom_idx, atom_name in enumerate(rc.restype_name_to_atom14_names[aa_name]):
            if atom_idx > 4 and atom_name.strip():
                add_atom(i, atom_name, atom14_np[i, atom_idx])

        # previous residue's backbone O from CA/C/N geometry (pdb.py:130-143)
        if i > 0 and mask[i - 1]:
            cac = _normalize(atom_pos[(i - 1, "C")] - atom_pos[(i - 1, "CA")])
            nc = _normalize(atom_pos[(i - 1, "C")] - atom_pos[(i, "N")])
            co = _normalize(cac + nc) * 1.24
            add_atom(i - 1, "O", atom_pos[(i - 1, "C")] + co)

        # terminal residue: psi-frame O + mirrored OXT (pdb.py:145-176);
        # bounds checked BEFORE the mask lookup (fixes SURVEY.md §3.5.8)
        is_last = (i + 1 >= n_res) or (not mask[i + 1])
        if is_last:
            c = atom_pos[(i, "C")]
            cac = _normalize(c - atom_pos[(i, "CA")])
            o_rot = group_rots_np[i, PSI_GROUP]
            o_tr = group_trans_np[i, PSI_GROUP]
            for atom_name, group_id, p in rc.rigid_group_atom_positions[aa_name]:
                if group_id == PSI_GROUP and atom_name == "O":
                    o = o_rot @ np.asarray(p, dtype=np.float64) + o_tr
                    add_atom(i, "O", o)
                    co = o - c
                    co_proj = cac * np.sum(co * cac)
                    normal = co - co_proj
                    add_atom(i, "OXT", c + co_proj - normal)

    # emit chain P in residue order, renumbering atoms sequentially in
    # file order (PDBIO renumbers; creation order only fixes the
    # WITHIN-residue ordering, exactly as the reference's res.add calls do)
    parts = []
    p_names4, p_elems2, p_res3, p_resseq, p_xyz = [], [], [], [], []
    last = None
    for i in sorted(residue_atoms):
        aa_name = rc.restype_1to3[rc.restypes[int(aatype[i])]]
        res3 = np.frombuffer(f"{aa_name:>3}".encode(), np.uint8)
        for _, name, pos in residue_atoms[i]:
            nf, ef = _name_fields(name)
            p_names4.append(nf)
            p_elems2.append(ef)
            p_res3.append(res3)
            p_resseq.append(i + 1)
            p_xyz.append(np.asarray(pos, np.float64))
        last = (aa_name, i + 1)
    out_serial = len(p_resseq)
    if out_serial:
        parts.append(_emit_atoms(
            0, "P", np.stack(p_names4), np.stack(p_res3),
            np.stack(p_elems2), np.asarray(p_resseq, np.int32),
            np.stack(p_xyz),
        ))
    if last is not None:
        # PDBIO quirk: the TER serial (= last atom + 1) is SHARED with the
        # next chain's first atom — the counter does not advance for TER
        parts.append(_ter_record(out_serial + 1, last[0], "P", last[1]).encode())

    # chain M: the full protein from stored atom14 (pdb.py:178-204),
    # vectorized: np.nonzero's row-major order IS the per-residue
    # per-slot loop order, and every record column except serial/resseq/
    # coords is static per (restype, slot) (_build_atom14_tables)
    p_aatype = pc["protein_aatype"][b].astype(np.int64)
    p_pos = pc["protein_atom14_positions"][b]
    p_exists = pc["protein_atom14_exists"][b]
    n_pres = p_aatype.shape[0]
    if n_pres:
        ri, ai = np.nonzero(p_exists & _A14_VALID[p_aatype])
        if ri.size:
            parts.append(_emit_atoms(
                out_serial, "M", _A14_NAMES4[p_aatype[ri], ai],
                _RES3[p_aatype[ri]], _A14_ELEMS2[p_aatype[ri], ai],
                (ri + 1).astype(np.int32),
                p_pos[ri, ai].astype(np.float64),
            ))
            out_serial += int(ri.size)
        last_m = rc.restype_1to3[rc.restypes[int(p_aatype[-1])]]
        parts.append(
            _ter_record(out_serial + 1, last_m, "M", n_pres).encode())
    parts.append(b"END\n")
    return b"".join(parts)
