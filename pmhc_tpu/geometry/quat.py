"""Quaternion algebra as pure jnp functions.

Behavioral contract is the reference's quaternion layer:
``diffusion/tools/angle.py`` (first-party) and OpenFold
``rigid_utils.py:206-250`` (``quat_multiply``/``invert_quat``; the
reference imports these at ``diffusion/model.py:5``).

Conventions (matching the reference):
- scalar-first (w, x, y, z); identity = [1, 0, 0, 0]
- Hamilton product; R(q1 (x) q2) = R(q1) @ R(q2), i.e. quat multiplication
  composes rotations the same way matrix multiplication does — this is the
  quat-native replacement for OpenFold ``Rotation.compose_r``
  (``rigid_utils.py:525-538``), which the reference routes through rotation
  matrices (forcing an eigh on the way back to quats).
- rot->quat here is branchless Shepperd with w >= 0 canonicalization,
  NOT OpenFold's symmetric-eigendecomposition (``rigid_utils.py:168-204``):
  both return +/-q for the same matrix; we pick a fixed sign. Only used at
  the data boundary. See SURVEY.md §3.5.4 and §7 "Hard parts".

Everything stays float32: the reference's ``Rotation`` constructor
force-casts to float32 ([openfold] rigid_utils.py:284-287) and the losses
are tolerance-sensitive quaternion dot products.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

PI = math.pi


def torch_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize with torch.nn.functional.normalize semantics.

    torch divides by ``max(||x||, eps)`` — a zero vector maps to zeros, not
    NaN. The reference relies on this in ``partial_rot``
    (``diffusion/tools/angle.py:182-184``: the identity quaternion has a
    zero axis) so we must reproduce it exactly.
    """
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of scalar-first quaternions ([*, 4] x [*, 4] -> [*, 4]).

    Algebraically identical to OpenFold's cached 4x4x4 coefficient-tensor
    contraction ([openfold] rigid_utils.py:206-240) but written as the
    closed-form product, which XLA fuses into a handful of VPU ops instead
    of materializing a [*, 4, 4, 4] intermediate.
    """
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        (
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ),
        axis=-1,
    )


def quat_multiply_by_vec(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multiply quaternion by a pure-vector quaternion [*, 3].

    Parity surface for OpenFold ``quat_multiply_by_vec``
    ([openfold] rigid_utils.py:238-243), imported by the reference at
    ``diffusion/model.py:5`` (unused there, but part of the API surface).
    """
    w1, x1, y1, z1 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    x2, y2, z2 = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        (
            -x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2,
        ),
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (w, -x, -y, -z). Reference: ``tools/angle.py:9-14``."""
    return jnp.concatenate((q[..., :1], -q[..., 1:]), axis=-1)


def quat_invert(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse = conjugate / squared norm ([openfold] rigid_utils.py:246-250)."""
    return quat_conjugate(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion [*, 4] -> rotation matrix [*, 3, 3].

    Matches OpenFold ``quat_to_rot`` ([openfold] rigid_utils.py:139-166):
    the formula is quadratic in q WITHOUT implicit normalization, so a
    non-unit quaternion scales the matrix by |q|^2 — callers that need a
    rotation must pass unit quats, exactly as in the reference.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack((ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy)), axis=-1)
    row1 = jnp.stack((2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx)), axis=-1)
    row2 = jnp.stack((2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz), axis=-1)
    return jnp.stack((row0, row1, row2), axis=-2)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors [*, 3] by quaternions [*, 4] (as R(q) @ v).

    Equivalent to OpenFold ``rot_vec_mul(quat_to_rot(q), v)``
    ([openfold] rigid_utils.py:100-121) but kept in quaternion form:
    v' = v + 2 * cross(q_vec, cross(q_vec, v) + w * v), scaled by |q|^2
    semantics of ``quat_to_rot`` (so unit quats required for a pure
    rotation, matching the reference).
    """
    # Explicit elementwise contraction (not einsum/matmul): keeps the math
    # in full f32 on the VPU regardless of the backend's default matmul
    # precision (TPU defaults would silently drop quaternion math to bf16,
    # SURVEY.md §7 "Precision").
    m = quat_to_rot(q)
    return jnp.sum(m * v[..., None, :], axis=-1)


def rot_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [*, 3, 3] -> unit quaternion [*, 4], branchless Shepperd.

    TPU-native replacement for OpenFold's eigendecomposition route
    ([openfold] rigid_utils.py:168-204): computes all four Shepperd
    candidates and selects the best-conditioned one with ``where`` (no
    data-dependent control flow, no eigh). Canonicalized to w >= 0; the
    eigh route returns an implementation-defined sign (SURVEY.md §3.5.4),
    and downstream losses are made sign-robust instead.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate quats, each numerically stable in a different regime.
    qw = jnp.stack((1.0 + tr, m21 - m12, m02 - m20, m10 - m01), axis=-1)
    qx = jnp.stack((m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20), axis=-1)
    qy = jnp.stack((m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21), axis=-1)
    qz = jnp.stack((m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22), axis=-1)

    # Pick the candidate whose leading term (4*component^2) is largest.
    c0 = 1.0 + tr
    c1 = 1.0 + m00 - m11 - m22
    c2 = 1.0 - m00 + m11 - m22
    c3 = 1.0 - m00 - m11 + m22
    cands = jnp.stack((c0, c1, c2, c3), axis=-1)
    best = jnp.argmax(cands, axis=-1)

    q = jnp.where(
        (best == 0)[..., None],
        qw,
        jnp.where((best == 1)[..., None], qx, jnp.where((best == 2)[..., None], qy, qz)),
    )
    q = torch_normalize(q)
    # Canonical sign: w >= 0 (the reference's eigh leaves the sign arbitrary).
    return jnp.where(q[..., :1] < 0.0, -q, q)


def shoemake_quat(x: jnp.ndarray) -> jnp.ndarray:
    """Shoemake coordinates [..., 3] in [0,1] -> uniform unit quaternion [..., 4].

    Exact port of reference ``diffusion/tools/angle.py:69-98`` including the
    clamp and the component ordering (w = r2*cos(theta2)).
    """
    x = jnp.clip(x, 0.0, 1.0)
    theta1 = 2.0 * PI * x[..., 1:2]
    theta2 = 2.0 * PI * x[..., 2:3]
    r1 = jnp.sqrt(1.0 - x[..., 0:1])
    r2 = jnp.sqrt(x[..., 0:1])
    return jnp.concatenate(
        (
            r2 * jnp.cos(theta2),
            r1 * jnp.sin(theta1),
            r1 * jnp.cos(theta1),
            r2 * jnp.sin(theta2),
        ),
        axis=-1,
    )


def random_quat(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform random unit quaternions of batch shape ``shape``.

    Reference ``diffusion/tools/angle.py:59-66`` (uniform Shoemake triples);
    RNG is explicit-key JAX instead of torch's global generator — parity
    tests inject the Shoemake triples directly (SURVEY.md §7 "Hard parts").
    """
    x = jax.random.uniform(key, tuple(shape) + (3,), dtype=jnp.float32)
    return shoemake_quat(x)


def spherical_to_quat(axis_phi: jnp.ndarray, axis_theta: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Axis (spherical coords) + rotation angle -> unit quaternion.

    Port of reference ``diffusion/tools/angle.py:101-122``.
    """
    x = jnp.cos(axis_phi)[..., None]
    y = jnp.sin(axis_phi)[..., None]
    z = jnp.cos(axis_theta)[..., None]
    xy = jnp.concatenate((x, y), axis=-1)
    xyz = jnp.concatenate((xy * jnp.sin(axis_theta)[..., None], z), axis=-1)
    a2 = alpha / 2.0
    w = jnp.cos(a2)[..., None]
    return jnp.concatenate((w, xyz * jnp.sin(a2)[..., None]), axis=-1)


def get_quat_angle(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Angle between two quaternions. Reference ``tools/angle.py:17-30``."""
    q1 = torch_normalize(q1)
    q2 = torch_normalize(q2)
    dot = jnp.clip(jnp.sum(q1 * q2, axis=-1), -1.0, 1.0)
    return jnp.arccos(jnp.abs(dot))


def partial_rot(q: jnp.ndarray, amount: jnp.ndarray | float) -> jnp.ndarray:
    """Fractional rotation: scale the rotation angle of ``q`` by ``amount``.

    Exact port of reference ``diffusion/tools/angle.py:177-186``:
    normalize q, half-angle a2 = acos(clamp(w, -1, 1)) in [0, pi], axis
    normalized with torch semantics (identity quat -> zero axis -> returns
    [cos(a2*amount), 0, 0, 0]), output NOT re-normalized.
    """
    q = torch_normalize(q)
    a2 = jnp.arccos(jnp.clip(q[..., :1], -1.0, 1.0))
    axis = torch_normalize(q[..., 1:])
    return jnp.concatenate((jnp.cos(a2 * amount), jnp.sin(a2 * amount) * axis), axis=-1)
