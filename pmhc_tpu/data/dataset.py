"""SwiftMHC-format HDF5 dataset -> fixed-shape numpy entry dicts.

Behavioral twin of the reference ``MhcpDataset`` (``diffusion/data.py:13-145``)
with the exact padding policy (every quirk is load-bearing for parity):

- peptide padded to 16 with IDENTITY 4x4 frames (``data.py:71-72``);
- pocket = the rows of the MHC protein where ``cross_residues_mask`` is
  set, packed to the front of 80-row buffers: frames identity-padded,
  atom14/onehot/aatype zero-padded (``data.py:53-66,74-75``);
- torsion-mask policy: backbone torsions (pre-omega, phi, psi) disabled,
  EXCEPT psi (index 2) re-enabled on the last residue; masked torsion
  slots get the identity (sin, cos) = (0, 1) (``data.py:92-102``);
- frames are converted 4x4 -> tensor-7 (quat || translation) for stacking
  (``data.py:107,115``) — here via vectorized numpy branchless Shepperd
  with canonical w >= 0 (the reference pays a per-item torch eigh on the
  host EVERY epoch, SURVEY.md §3.3; signs differ by convention only).

TPU-native differences: emits numpy (host) arrays — device upload is the
loader's job, batched and double-buffered — and the HDF5 file handle is
kept open per loader thread instead of reopened per item per epoch
(``data.py:38``, SURVEY.md §7 step 8 "no per-item HDF5 reopen").
"""

from __future__ import annotations

import threading
from typing import Dict, List

import h5py
import numpy as np

PEPTIDE_MAXLEN = 16
POCKET_MAXLEN = 80
N_TORSIONS = 7
ONEHOT_WIDTH = 22


def rot_to_quat_np(m: np.ndarray) -> np.ndarray:
    """Vectorized branchless Shepperd for host-side loading; same
    convention as ``pmhc_tpu.geometry.rot_to_quat`` (w >= 0)."""
    m = m.astype(np.float64)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    cands = np.stack(
        (1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22),
        axis=-1,
    )
    qw = np.stack((1.0 + tr, m21 - m12, m02 - m20, m10 - m01), axis=-1)
    qx = np.stack((m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20), axis=-1)
    qy = np.stack((m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21), axis=-1)
    qz = np.stack((m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22), axis=-1)
    best = np.argmax(cands, axis=-1)[..., None]
    q = np.where(best == 0, qw, np.where(best == 1, qx, np.where(best == 2, qy, qz)))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    q = np.where(q[..., :1] < 0.0, -q, q)
    return q.astype(np.float32)


def frames_4x4_to_tensor7(frames: np.ndarray) -> np.ndarray:
    """[*, 4, 4] homogeneous -> [*, 7] quat || translation."""
    return np.concatenate(
        (rot_to_quat_np(frames[..., :3, :3]), frames[..., :3, 3].astype(np.float32)),
        axis=-1,
    )


_IDENTITY_T7 = np.array([1, 0, 0, 0, 0, 0, 0], dtype=np.float32)


class PmhcDataset:
    """Random-access dataset over one SwiftMHC HDF5 file.

    Thread-safe: each thread gets its own h5py handle (h5py releases the
    GIL during I/O, so the prefetch loader's thread pool overlaps reads).
    """

    peptide_maxlen = PEPTIDE_MAXLEN
    pocket_maxlen = POCKET_MAXLEN

    def __init__(self, hdf5_path: str):
        self.hdf5_path = hdf5_path
        self._local = threading.local()
        with h5py.File(hdf5_path, "r") as f5:
            self.entry_names: List[str] = list(f5.keys())

    @property
    def _file(self) -> h5py.File:
        f = getattr(self._local, "file", None)
        if f is None:
            f = h5py.File(self.hdf5_path, "r")
            self._local.file = f
        return f

    def __len__(self) -> int:
        return len(self.entry_names)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return self.get_entry(self.entry_names[index])

    def get_entry(self, entry_name: str) -> Dict[str, np.ndarray]:
        entry = self._file[entry_name]
        if "peptide" not in entry:
            raise ValueError(f"no peptide in {entry_name}")
        peptide = entry["peptide"]
        mhc = entry["protein"]

        pocket_sel = mhc["cross_residues_mask"][:].astype(bool)
        n_pocket = int(pocket_sel.sum())
        if n_pocket > POCKET_MAXLEN:
            raise ValueError(
                f"{entry_name}: pocket has {n_pocket} residues > {POCKET_MAXLEN}"
            )

        peptide_len = peptide["backbone_rigid_tensor"].shape[0]
        if peptide_len > PEPTIDE_MAXLEN:
            raise ValueError(
                f"{entry_name}: peptide has {peptide_len} residues > {PEPTIDE_MAXLEN}"
            )

        # peptide frames: identity padding (data.py:71-72)
        frames = np.broadcast_to(np.eye(4, dtype=np.float32), (PEPTIDE_MAXLEN, 4, 4)).copy()
        frames[:peptide_len] = peptide["backbone_rigid_tensor"][:]

        # pocket buffers: packed to the front (data.py:53-66,74-75)
        pocket_frames = np.broadcast_to(np.eye(4, dtype=np.float32), (POCKET_MAXLEN, 4, 4)).copy()
        pocket_frames[:n_pocket] = mhc["backbone_rigid_tensor"][:][pocket_sel]
        pocket_atoms = np.zeros((POCKET_MAXLEN, 14, 3), dtype=np.float32)
        pocket_atoms[:n_pocket] = mhc["atom14_gt_positions"][:][pocket_sel]
        pocket_atoms_exist = np.zeros((POCKET_MAXLEN, 14), dtype=bool)
        pocket_atoms_exist[:n_pocket] = mhc["atom14_gt_exists"][:][pocket_sel]
        pocket_aatype = np.zeros(POCKET_MAXLEN, dtype=np.int32)
        pocket_aatype[:n_pocket] = mhc["aatype"][:][pocket_sel]
        pocket_onehot = np.zeros((POCKET_MAXLEN, ONEHOT_WIDTH), dtype=np.float32)
        pocket_onehot[:n_pocket] = mhc["sequence_onehot"][:][pocket_sel]
        pocket_mask = np.zeros(POCKET_MAXLEN, dtype=bool)
        pocket_mask[:n_pocket] = True

        mask = np.zeros(PEPTIDE_MAXLEN, dtype=bool)
        mask[:peptide_len] = True
        aatype = np.zeros(PEPTIDE_MAXLEN, dtype=np.int32)
        aatype[:peptide_len] = peptide["aatype"][:]
        onehot = np.zeros((PEPTIDE_MAXLEN, ONEHOT_WIDTH), dtype=np.float32)
        onehot[:peptide_len] = peptide["sequence_onehot"][:]

        # torsions + mask policy (data.py:92-102)
        torsions = np.zeros((PEPTIDE_MAXLEN, N_TORSIONS, 2), dtype=np.float32)
        torsions[:peptide_len] = peptide["torsion_angles_sin_cos"][:]
        torsions_mask = np.zeros((PEPTIDE_MAXLEN, N_TORSIONS), dtype=bool)
        torsions_mask[:peptide_len] = peptide["torsion_angles_mask"][:].astype(bool)
        torsions_mask[:, :3] = False
        torsions_mask[peptide_len - 1, 2] = True
        torsions[~torsions_mask] = np.array([0.0, 1.0], dtype=np.float32)

        return {
            "name": entry_name,
            "mask": mask,
            "frames": frames_4x4_to_tensor7(frames),
            "features": onehot,
            "aatype": aatype,
            "torsions": torsions,
            "torsions_mask": torsions_mask,
            "pocket_aatype": pocket_aatype,
            "pocket_features": pocket_onehot,
            "pocket_mask": pocket_mask,
            "pocket_frames": frames_4x4_to_tensor7(pocket_frames),
            "pocket_atom14_positions": pocket_atoms,
            "pocket_atom14_exists": pocket_atoms_exist,
        }

    def get_protein_positions(self, entry_names: List[str]) -> Dict[str, np.ndarray]:
        """Full-protein (not pocket-packed) atom data for PDB output;
        mirrors ``data.py:121-145`` — except that variable-length MHC
        proteins are padded to the batch max with exists=False (the
        reference's bare ``torch.stack`` crashes on ragged lengths,
        ``data.py:143``; the exists mask gates every downstream consumer,
        so padding is behaviorally invisible — deliberate robustness fix,
        documented like the maxlen IndexError in io/pdb.py)."""
        out = {"protein_aatype": [], "protein_atom14_positions": [], "protein_atom14_exists": []}
        f5 = self._file
        for name in entry_names:
            mhc = f5[name]["protein"]
            out["protein_aatype"].append(mhc["aatype"][:].astype(np.int32))
            out["protein_atom14_positions"].append(
                mhc["atom14_gt_positions"][:].astype(np.float32)
            )
            out["protein_atom14_exists"].append(mhc["atom14_gt_exists"][:].astype(bool))
        max_len = max(a.shape[0] for a in out["protein_aatype"])

        def pad(a):
            n = a.shape[0]
            if n == max_len:
                return a
            return np.concatenate(
                (a, np.zeros((max_len - n,) + a.shape[1:], dtype=a.dtype))
            )

        return {k: np.stack([pad(a) for a in v]) for k, v in out.items()}
