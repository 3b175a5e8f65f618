"""Torsion frames and idealized atom placement.

JAX twins of the two OpenFold feature kernels the reference's PDB writer
uses (``diffusion/tools/pdb.py:71-84``):

- ``torsion_angles_to_frames`` ([openfold] feats.py:160-219): per residue,
  8 rigid groups (backbone, pre-omega, phi, psi, chi1-4); each group's
  default frame (indexed by aatype) composed with an x-axis rotation built
  from the torsion's (sin, cos); chi2..4 chained onto chi1; all composed
  into the residue's global backbone frame.
- ``frames_and_literature_positions_to_atom14_pos``
  ([openfold] feats.py:222-253): each atom14 slot selects its group's
  frame and transforms the literature position.

Deliberately computed in MATRIX space: the reference builds the x-axis
rotation matrix directly from raw (possibly unnormalized) sin/cos —
[[1,0,0],[0,c,-s],[0,s,c]] — so any non-unit magnitude scales coordinates.
A quat-native version would silently renormalize; this is an output-path
fidelity requirement, not a hot loop. The group-frame selection uses a
gather instead of the reference's one-hot multiply-sum (identical floats,
no [*, N, 14, 8] intermediate).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from pmhc_tpu.geometry import RigidArray, quat_to_rot


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 matrix product pinned to f32 (TPU default matmul is bf16)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def _mv(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Matrix-vector product as an elementwise contraction (full f32)."""
    return jnp.sum(m * v[..., None, :], axis=-1)

# rigid-group indices ([openfold] residue_constants rigid group layout)
BACKBONE_GROUP = 0
PSI_GROUP = 3  # reference pdb.py:31 `o_group_id = 3`


def torsion_angles_to_frames(
    frames: RigidArray,  # [*, N] backbone frames
    torsions: jnp.ndarray,  # [*, N, 7, 2] (sin, cos)
    aatype: jnp.ndarray,  # [*, N] int
    default_frames: jnp.ndarray,  # [21, 8, 4, 4]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (rot_mats [*, N, 8, 3, 3], trans [*, N, 8, 3]): the 8
    rigid-group frames of every residue in global coordinates."""
    default_4x4 = default_frames[aatype]  # [*, N, 8, 4, 4]
    d_rot = default_4x4[..., :3, :3]
    d_trans = default_4x4[..., :3, 3]

    # prepend the identity rotation for the backbone group
    bb = jnp.broadcast_to(
        jnp.asarray([0.0, 1.0], torsions.dtype), torsions.shape[:-2] + (1, 2)
    )
    alpha = jnp.concatenate((bb, torsions), axis=-2)  # [*, N, 8, 2]
    sin_a, cos_a = alpha[..., 0], alpha[..., 1]

    # x-axis rotation from raw (sin, cos), no normalization (feats.py:180-194)
    zeros = jnp.zeros_like(sin_a)
    ones = jnp.ones_like(sin_a)
    x_rot = jnp.stack(
        (
            jnp.stack((ones, zeros, zeros), axis=-1),
            jnp.stack((zeros, cos_a, -sin_a), axis=-1),
            jnp.stack((zeros, sin_a, cos_a), axis=-1),
        ),
        axis=-2,
    )  # [*, N, 8, 3, 3]

    # group frame = default ∘ x-rot (translation = default's)
    g_rot = _mm(d_rot, x_rot)
    g_trans = d_trans

    # chain chi2..chi4 onto chi1 (feats.py:198-215)
    def compose(r1, t1, r2, t2):
        return _mm(r1, r2), _mv(r1, t2) + t1

    rots = [g_rot[..., i, :, :] for i in range(8)]
    trs = [g_trans[..., i, :] for i in range(8)]
    for chi in (5, 6, 7):  # chi2, chi3, chi4 chained onto the previous
        rots[chi], trs[chi] = compose(rots[chi - 1], trs[chi - 1], rots[chi], trs[chi])
    g_rot = jnp.stack(rots, axis=-3)
    g_trans = jnp.stack(trs, axis=-2)

    # compose into the global backbone frame
    bb_rot = quat_to_rot(frames.quats)[..., None, :, :]  # [*, N, 1, 3, 3]
    bb_trans = frames.trans[..., None, :]
    out_rot = _mm(bb_rot, g_rot)
    out_trans = _mv(bb_rot, g_trans) + bb_trans
    return out_rot, out_trans


def frames_to_atom14_positions(
    group_rots: jnp.ndarray,  # [*, N, 8, 3, 3]
    group_trans: jnp.ndarray,  # [*, N, 8, 3]
    aatype: jnp.ndarray,  # [*, N]
    group_idx: jnp.ndarray,  # [21, 14]
    atom_mask: jnp.ndarray,  # [21, 14]
    lit_positions: jnp.ndarray,  # [21, 14, 3]
) -> jnp.ndarray:
    """[*, N, 14, 3] idealized atom positions ([openfold] feats.py:222-253
    semantics, gather instead of one-hot)."""
    groups = group_idx[aatype]  # [*, N, 14]
    flat_rots = group_rots.reshape(group_rots.shape[:-2] + (9,))  # [*, N, 8, 9]
    rots = jnp.take_along_axis(flat_rots, groups[..., None], axis=-2)
    rots = rots.reshape(rots.shape[:-1] + (3, 3))  # [*, N, 14, 3, 3]
    trans = jnp.take_along_axis(group_trans, groups[..., None], axis=-2)
    lit = lit_positions[aatype]  # [*, N, 14, 3]
    pred = _mv(rots, lit) + trans
    return pred * atom_mask[aatype][..., None]
