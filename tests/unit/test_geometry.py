"""Property tests for the geometry layer.

Tier 1 of the test strategy (SURVEY.md §4): ports of the reference's
``tests/unit/tools/test_angle.py`` properties plus new quat/matrix
cross-checks the reference never had.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from pmhc_tpu.geometry import (
    RigidArray,
    angle_to_sin_cos,
    get_quat_angle,
    inverse_sin_cos,
    multiply_sin_cos,
    partial_rot,
    partial_sin_cos,
    quat_conjugate,
    quat_invert,
    quat_multiply,
    quat_rotate,
    quat_to_rot,
    random_quat,
    random_sin_cos,
    rot_to_quat,
    shoemake_quat,
    torch_normalize,
)

EPS = 1e-6
PI = math.pi


def test_sin_cos_multiplication():
    # Port of reference tests/unit/tools/test_angle.py:11-38.
    angles = jnp.array([PI, PI / 2, PI / 3, 0.0, -PI / 3, -PI / 2, -PI])
    size = angles.shape[0]
    sum_of_angles = angles[:, None] + angles[None, :]
    sin_cos = angle_to_sin_cos(angles)

    product = multiply_sin_cos(
        jnp.broadcast_to(sin_cos[:, None, :], (size, size, 2)),
        jnp.broadcast_to(sin_cos[None, :, :], (size, size, 2)),
    )
    expected = angle_to_sin_cos(sum_of_angles)
    assert jnp.all(jnp.abs(product - expected) < EPS)

    inverted = multiply_sin_cos(inverse_sin_cos(sin_cos), sin_cos)
    assert jnp.all(jnp.abs(inverted[..., 0]) < EPS)
    assert jnp.all(jnp.abs(inverted[..., 1] - 1.0) < EPS)


def test_random_quat_unit_norm():
    # Port of reference tests/unit/tools/test_angle.py:42-48.
    q = random_quat(jax.random.key(0), (10, 10))
    norms = jnp.sqrt(jnp.sum(q * q, axis=-1))
    assert jnp.all(jnp.abs(norms - 1.0) < EPS)


def test_quat_multiply_matches_matrix_composition():
    key = jax.random.key(1)
    k1, k2 = jax.random.split(key)
    q1 = random_quat(k1, (64,))
    q2 = random_quat(k2, (64,))
    q12 = quat_multiply(q1, q2)
    # numpy matmul: JAX's default matmul precision may be bf16 on TPU-like
    # backends, which is exactly what the geometry layer must avoid.
    m12 = np.asarray(quat_to_rot(q1)) @ np.asarray(quat_to_rot(q2))
    np.testing.assert_allclose(quat_to_rot(q12), m12, atol=1e-5)


def test_quat_identity_and_inverse():
    q = random_quat(jax.random.key(2), (32,))
    ident = jnp.array([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(
        quat_multiply(q, jnp.broadcast_to(ident, q.shape)), q, atol=1e-6
    )
    qq_inv = quat_multiply(q, quat_invert(q))
    np.testing.assert_allclose(qq_inv, jnp.broadcast_to(ident, q.shape), atol=1e-5)
    # conjugate == inverse for unit quats
    np.testing.assert_allclose(quat_conjugate(q), quat_invert(q), atol=1e-5)


def test_rot_to_quat_roundtrip():
    q = random_quat(jax.random.key(3), (256,))
    m = quat_to_rot(q)
    q2 = rot_to_quat(m)
    # equal up to sign; rot_to_quat canonicalizes w >= 0
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    assert jnp.all(dot > 1.0 - 1e-5)
    assert jnp.all(q2[..., 0] >= 0.0)
    # matrices must match exactly
    np.testing.assert_allclose(quat_to_rot(q2), m, atol=1e-5)


def test_rot_to_quat_degenerate_cases():
    # 180-degree rotations exercise all four Shepperd branches.
    mats = []
    for axis in range(3):
        m = -np.eye(3)
        m[axis, axis] = 1.0
        mats.append(m)
    mats.append(np.eye(3))
    mats = jnp.array(np.stack(mats), dtype=jnp.float32)
    q = rot_to_quat(mats)
    np.testing.assert_allclose(quat_to_rot(q), mats, atol=1e-5)


def test_quat_rotate_matches_matrix():
    q = random_quat(jax.random.key(4), (64,))
    v = jax.random.normal(jax.random.key(5), (64, 3))
    np.testing.assert_allclose(
        quat_rotate(q, v),
        jnp.einsum("...ij,...j->...i", quat_to_rot(q), v),
        atol=1e-5,
    )


def test_partial_rot_fractional_composition():
    # partial_rot(q, a) composed with partial_rot(q, 1-a) == q (up to sign).
    q = random_quat(jax.random.key(6), (64,))
    a = 0.3
    q_part = quat_multiply(partial_rot(q, a), partial_rot(q, 1.0 - a))
    qn = torch_normalize(q)
    dot = jnp.abs(jnp.sum(torch_normalize(q_part) * qn, axis=-1))
    assert jnp.all(dot > 1.0 - 1e-5)


def test_partial_rot_identity_quat_no_nan():
    # The identity quaternion has a zero axis; torch normalize semantics
    # (reference angle.py:182-184) must give zeros, not NaN.
    ident = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    out = partial_rot(ident, 0.5)
    assert not jnp.any(jnp.isnan(out))
    np.testing.assert_allclose(out, ident, atol=1e-6)


def test_partial_rot_zero_amount_is_identity():
    q = random_quat(jax.random.key(7), (16,))
    out = partial_rot(q, 0.0)
    np.testing.assert_allclose(out[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 1:], 0.0, atol=1e-6)


def test_partial_sin_cos_fraction():
    a = jnp.linspace(-PI + 0.01, PI - 0.01, 37)
    sc = angle_to_sin_cos(a)
    half = partial_sin_cos(sc, 0.5)
    expected = angle_to_sin_cos(a * 0.5)
    np.testing.assert_allclose(half, expected, atol=1e-5)


def test_get_quat_angle():
    q1 = jnp.array([1.0, 0.0, 0.0, 0.0])
    # 90 degrees about z
    q2 = jnp.array([math.cos(PI / 4), 0.0, 0.0, math.sin(PI / 4)])
    angle = get_quat_angle(q1, q2)
    np.testing.assert_allclose(angle, PI / 4, atol=1e-6)  # half-angle metric


def test_random_sin_cos_unit():
    sc = random_sin_cos(jax.random.key(8), (100, 7))
    norms = jnp.sum(sc * sc, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_shoemake_uniformity_moments():
    # Uniform quats on S^3: E[q] = 0, E[q_i^2] = 1/4.
    x = jax.random.uniform(jax.random.key(9), (20000, 3))
    q = shoemake_quat(x)
    mean = jnp.mean(q, axis=0)
    second = jnp.mean(q * q, axis=0)
    assert jnp.all(jnp.abs(mean) < 0.02)
    np.testing.assert_allclose(second, 0.25, atol=0.01)


class TestRigidArray:
    def test_identity(self):
        r = RigidArray.identity((3, 4))
        assert r.shape == (3, 4)
        np.testing.assert_allclose(r.apply(jnp.ones((3, 4, 3))), 1.0)

    def test_compose_apply_consistency(self):
        k1, k2, k3, k4, k5 = jax.random.split(jax.random.key(10), 5)
        a = RigidArray(random_quat(k1, (8,)), jax.random.normal(k2, (8, 3)))
        b = RigidArray(random_quat(k3, (8,)), jax.random.normal(k4, (8, 3)))
        p = jax.random.normal(k5, (8, 3))
        np.testing.assert_allclose(
            a.compose(b).apply(p), a.apply(b.apply(p)), atol=1e-4
        )

    def test_invert(self):
        k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
        a = RigidArray(random_quat(k1, (8,)), jax.random.normal(k2, (8, 3)))
        p = jax.random.normal(k3, (8, 3))
        np.testing.assert_allclose(a.invert().apply(a.apply(p)), p, atol=1e-4)
        np.testing.assert_allclose(a.invert_apply(a.apply(p)), p, atol=1e-4)

    def test_tensor7_roundtrip(self):
        k1, k2 = jax.random.split(jax.random.key(12))
        a = RigidArray(random_quat(k1, (8,)), jax.random.normal(k2, (8, 3)))
        b = RigidArray.from_tensor_7(a.to_tensor_7())
        np.testing.assert_allclose(b.quats, a.quats)
        np.testing.assert_allclose(b.trans, a.trans)

    def test_tensor44_roundtrip(self):
        k1, k2 = jax.random.split(jax.random.key(13))
        a = RigidArray(random_quat(k1, (8,)), jax.random.normal(k2, (8, 3)))
        t44 = a.to_tensor_4x4()
        b = RigidArray.from_tensor_4x4(t44)
        np.testing.assert_allclose(b.to_tensor_4x4(), t44, atol=1e-5)

    def test_pytree(self):
        a = RigidArray.identity((4,))
        leaves = jax.tree_util.tree_leaves(a)
        assert len(leaves) == 2
        doubled = jax.tree_util.tree_map(lambda x: x * 2, a)
        assert isinstance(doubled, RigidArray)

    def test_jit_and_vmap(self):
        k1, k2, k3 = jax.random.split(jax.random.key(14), 3)
        a = RigidArray(random_quat(k1, (4, 8)), jax.random.normal(k2, (4, 8, 3)))
        p = jax.random.normal(k3, (4, 8, 3))
        out_jit = jax.jit(lambda r, x: r.apply(x))(a, p)
        out_vmap = jax.vmap(lambda r, x: r.apply(x))(a, p)
        np.testing.assert_allclose(out_jit, out_vmap, atol=1e-6)
