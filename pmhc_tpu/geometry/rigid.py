"""RigidArray: an immutable struct-of-arrays SE(3) transform pytree.

The TPU-native replacement for OpenFold's dual-backed ``Rigid``/``Rotation``
classes ([openfold] rigid_utils.py:253-1240, used throughout the reference:
``diffusion/model.py:5``, ``diffusion/optimizer.py:7``, ``diffusion/data.py:10``).

Differences by design (SURVEY.md §7 "Design stance"):
- Rotation is ALWAYS a scalar-first quaternion array ``f32[..., 4]``; there
  is no matrix backing, so composing rotations is a Hamilton product and no
  code path ever needs an eigendecomposition (the reference's
  ``compose_r`` returns a matrix-backed Rotation whose every quat read
  costs a 4x4 ``eigh``, [openfold] rigid_utils.py:471-485,525-538).
- It is a registered JAX pytree: it flows through ``jit``/``scan``/
  ``shard_map``/optax untouched, and vmapping over leading axes is free.
- Construction does NOT normalize quats, matching
  ``Rigid.from_tensor_7`` ([openfold] rigid_utils.py:1037-1046, called by
  the reference without normalization at ``optimizer.py:201-202``);
  callers normalize explicitly where the reference does.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pmhc_tpu.geometry.quat import (
    quat_conjugate,
    quat_multiply,
    quat_rotate,
    quat_to_rot,
    rot_to_quat,
    torch_normalize,
)


@jax.tree_util.register_pytree_node_class
class RigidArray:
    """A batch of SE(3) transforms: unit-ish quaternions + translations.

    Attributes:
        quats: f32[..., 4] scalar-first quaternions.
        trans: f32[..., 3] translations.
    """

    __slots__ = ("quats", "trans")

    def __init__(self, quats: jnp.ndarray, trans: jnp.ndarray):
        self.quats = quats
        self.trans = trans

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.quats, self.trans), None

    @classmethod
    def tree_unflatten(cls, aux: Any, children) -> "RigidArray":
        return cls(*children)

    # -- constructors ------------------------------------------------------
    @classmethod
    def identity(cls, shape, dtype=jnp.float32) -> "RigidArray":
        """Identity transforms of batch shape ``shape``."""
        q = jnp.zeros(tuple(shape) + (4,), dtype=dtype).at[..., 0].set(1.0)
        t = jnp.zeros(tuple(shape) + (3,), dtype=dtype)
        return cls(q, t)

    @classmethod
    def from_tensor_7(cls, t7: jnp.ndarray) -> "RigidArray":
        """[..., 7] = quat(4) || trans(3). NO normalization, matching
        [openfold] rigid_utils.py:1037-1046 (SURVEY.md §3.5.10)."""
        return cls(t7[..., :4], t7[..., 4:])

    @classmethod
    def from_tensor_4x4(cls, t44: jnp.ndarray) -> "RigidArray":
        """[..., 4, 4] homogeneous transform -> RigidArray.

        The reference converts via eigh-based ``rot_to_quat`` on the host
        per item per epoch (``diffusion/data.py:107,115``); here it is the
        branchless Shepperd with canonical w >= 0 sign.
        """
        return cls(rot_to_quat(t44[..., :3, :3]), t44[..., :3, 3])

    # -- conversions ---------------------------------------------------------
    def to_tensor_7(self) -> jnp.ndarray:
        return jnp.concatenate((self.quats, self.trans), axis=-1)

    def to_tensor_4x4(self) -> jnp.ndarray:
        rot = quat_to_rot(self.quats)
        shape = self.trans.shape[:-1]
        out = jnp.zeros(shape + (4, 4), dtype=self.trans.dtype)
        out = out.at[..., :3, :3].set(rot)
        out = out.at[..., :3, 3].set(self.trans)
        out = out.at[..., 3, 3].set(1.0)
        return out

    def rot_mats(self) -> jnp.ndarray:
        return quat_to_rot(self.quats)

    # -- algebra -------------------------------------------------------------
    def compose(self, other: "RigidArray") -> "RigidArray":
        """self o other (apply ``other`` first in the frame of ``self``).

        Quat-native equivalent of ``Rigid.compose`` ([openfold]
        rigid_utils.py:880-895).
        """
        return RigidArray(
            quat_multiply(self.quats, other.quats),
            quat_rotate(self.quats, other.trans) + self.trans,
        )

    def compose_rotation(self, q: jnp.ndarray) -> "RigidArray":
        """Left-compose a rotation onto self's rotation, translation unchanged."""
        return RigidArray(quat_multiply(q, self.quats), self.trans)

    def invert(self) -> "RigidArray":
        """Inverse transform ([openfold] rigid_utils.py:897-909 semantics)."""
        inv_q = quat_conjugate(torch_normalize(self.quats))
        return RigidArray(inv_q, -quat_rotate(inv_q, self.trans))

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Apply to points [..., 3]: R @ p + t."""
        return quat_rotate(self.quats, points) + self.trans

    def invert_apply(self, points: jnp.ndarray) -> jnp.ndarray:
        inv_q = quat_conjugate(torch_normalize(self.quats))
        return quat_rotate(inv_q, points - self.trans)

    def normalize(self) -> "RigidArray":
        """Return a copy with unit quaternions (torch normalize semantics)."""
        return RigidArray(torch_normalize(self.quats), self.trans)

    # -- structural helpers ----------------------------------------------------
    @property
    def shape(self):
        return self.quats.shape[:-1]

    @property
    def dtype(self):
        return self.quats.dtype

    def __getitem__(self, idx) -> "RigidArray":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return RigidArray(self.quats[idx], self.trans[idx])

    def reshape(self, shape) -> "RigidArray":
        shape = tuple(shape)
        return RigidArray(
            self.quats.reshape(shape + (4,)), self.trans.reshape(shape + (3,))
        )

    @staticmethod
    def cat(rigids, axis: int = 0) -> "RigidArray":
        if axis < 0:
            axis -= 1  # account for the trailing component axis
        return RigidArray(
            jnp.concatenate([r.quats for r in rigids], axis=axis),
            jnp.concatenate([r.trans for r in rigids], axis=axis),
        )

    def __repr__(self) -> str:
        return f"RigidArray(shape={self.shape}, dtype={self.dtype})"
