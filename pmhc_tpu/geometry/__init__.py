"""Quaternion-native SE(3) geometry kernels.

This package is the TPU-native replacement for the reference's geometry
substrate: first-party ``diffusion/tools/angle.py`` + OpenFold's
``rigid_utils.Rigid``/``Rotation`` (reference imports at
``diffusion/model.py:5``, ``diffusion/optimizer.py:7``).

Design: rotations are ALWAYS scalar-first (w, x, y, z) float32 quaternions.
There is no matrix-backed representation, hence no
``torch.linalg.eigh``-based matrix->quat conversion anywhere in the compute
path (the reference hits that path on every forward, see SURVEY.md §3.5.4).
Rotation matrices exist only transiently at the HDF5 boundary
(``rot_to_quat``) and in ``quat_rotate``'s internal formula.
"""

from pmhc_tpu.geometry.quat import (
    quat_multiply,
    quat_conjugate,
    quat_invert,
    quat_rotate,
    quat_to_rot,
    rot_to_quat,
    shoemake_quat,
    random_quat,
    partial_rot,
    get_quat_angle,
    torch_normalize,
)
from pmhc_tpu.geometry.sincos import (
    angle_to_sin_cos,
    random_sin_cos,
    multiply_sin_cos,
    inverse_sin_cos,
    partial_sin_cos,
    get_sin_cos_angle,
)
from pmhc_tpu.geometry.quat import spherical_to_quat, quat_multiply_by_vec
from pmhc_tpu.geometry.rigid import RigidArray
from pmhc_tpu.geometry.frame import get_rmsd
from pmhc_tpu.geometry.fape import compute_fape

__all__ = [
    "quat_multiply",
    "quat_conjugate",
    "quat_invert",
    "quat_rotate",
    "quat_to_rot",
    "rot_to_quat",
    "shoemake_quat",
    "random_quat",
    "partial_rot",
    "get_quat_angle",
    "torch_normalize",
    "angle_to_sin_cos",
    "random_sin_cos",
    "multiply_sin_cos",
    "inverse_sin_cos",
    "partial_sin_cos",
    "get_sin_cos_angle",
    "spherical_to_quat",
    "quat_multiply_by_vec",
    "RigidArray",
    "get_rmsd",
    "compute_fape",
]
