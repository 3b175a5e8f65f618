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


def _atom_record(serial, name, resname, chain, resseq, pos, element) -> str:
    # columns per PDBIO's _ATOM_FORMAT_STRING; occupancy 1.00 / bfactor
    # 0.00 like the reference's Atom(..., 0.0, 1.0, ...); segid = chain id
    # (the reference passes chain.id as Residue segid, ref pdb.py:102,185)
    name_field = (" " + name).ljust(4)[:4] if len(name) < 4 else name[:4]
    return (
        f"ATOM  {serial:>5} {name_field} {resname:>3} {chain}{resseq:>4}    "
        f"{pos[0]:8.3f}{pos[1]:8.3f}{pos[2]:8.3f}{1.0:6.2f}{0.0:6.2f}"
        f"      {chain:>4}{element:>2}  \n"
    )


def _ter_record(serial, resname, chain, resseq) -> str:
    return f"TER   {serial:>5}      {resname:>3} {chain}{resseq:>4} ".ljust(80) + "\n"


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

    lines = []
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
    out_serial = 0
    last = None
    for i in sorted(residue_atoms):
        aa_name = rc.restype_1to3[rc.restypes[int(aatype[i])]]
        for _, name, pos in residue_atoms[i]:
            out_serial += 1
            lines.append(_atom_record(out_serial, name, aa_name, "P", i + 1, pos, name[0]))
        last = (aa_name, i + 1)
    if last is not None:
        # PDBIO quirk: the TER serial (= last atom + 1) is SHARED with the
        # next chain's first atom — the counter does not advance for TER
        lines.append(_ter_record(out_serial + 1, last[0], "P", last[1]))

    # chain M: the full protein from stored atom14 (pdb.py:178-204)
    p_aatype = pc["protein_aatype"][b]
    p_pos = pc["protein_atom14_positions"][b]
    p_exists = pc["protein_atom14_exists"][b]
    last = None
    for ri in range(p_aatype.shape[0]):
        aa_name = rc.restype_1to3[rc.restypes[int(p_aatype[ri])]]
        for ai, atom_name in enumerate(rc.restype_name_to_atom14_names[aa_name]):
            if p_exists[ri, ai] and atom_name.strip():
                out_serial += 1
                lines.append(
                    _atom_record(out_serial, atom_name, aa_name, "M", ri + 1, p_pos[ri, ai], atom_name[0])
                )
        last = (aa_name, ri + 1)
    if last is not None:
        lines.append(_ter_record(out_serial + 1, last[0], "M", last[1]))
    lines.append("END\n")

    with open(path, "w") as f:
        f.writelines(lines)
