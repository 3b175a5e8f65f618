"""Golden-parity tests: geometry kernels vs the mounted PyTorch reference.

Tier 2 of the test strategy (SURVEY.md §4): identical inputs through both
implementations, float32 tolerances. RNG is bypassed by injecting the
uniform/normal draws directly (SURVEY.md §7 "Hard parts": torch and JAX
PRNGs cannot match).
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference import install

ref = install()

from diffusion.tools import angle as ref_angle  # noqa: E402
from openfold.utils import rigid_utils as ref_rigid  # noqa: E402

from pmhc_tpu.geometry import (  # noqa: E402
    RigidArray,
    inverse_sin_cos,
    multiply_sin_cos,
    partial_rot,
    partial_sin_cos,
    quat_invert,
    quat_multiply,
    quat_to_rot,
    rot_to_quat,
    shoemake_quat,
)

RNG = np.random.default_rng(42)


def _rand_unit_quats(shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_shoemake_quat_parity():
    x = RNG.uniform(size=(64, 3)).astype(np.float32)
    ours = np.asarray(shoemake_quat(jnp.asarray(x)))
    theirs = ref_angle.shoemake_quat(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_quat_multiply_parity():
    q1 = _rand_unit_quats((128,))
    q2 = _rand_unit_quats((128,))
    ours = np.asarray(quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    theirs = ref_rigid.quat_multiply(torch.tensor(q1), torch.tensor(q2)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_invert_quat_parity():
    q = (_rand_unit_quats((128,)) * 1.7).astype(np.float32)  # non-unit too
    ours = np.asarray(quat_invert(jnp.asarray(q)))
    theirs = ref_rigid.invert_quat(torch.tensor(q)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_quat_to_rot_parity():
    q = _rand_unit_quats((128,))
    ours = np.asarray(quat_to_rot(jnp.asarray(q)))
    theirs = ref_rigid.quat_to_rot(torch.tensor(q)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_rot_to_quat_matrix_level_parity():
    # Shepperd (ours) vs eigh (reference) agree up to quaternion sign;
    # compare at the rotation-matrix level, which is sign-invariant.
    q = _rand_unit_quats((128,))
    m = np.asarray(quat_to_rot(jnp.asarray(q)))
    ours = np.asarray(rot_to_quat(jnp.asarray(m)))
    theirs = ref_rigid.rot_to_quat(torch.tensor(m)).numpy()
    dots = np.abs(np.sum(ours * theirs, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_partial_rot_parity():
    q = _rand_unit_quats((128,))
    for amount in (0.0, 0.3, 0.8, 1.0):
        ours = np.asarray(partial_rot(jnp.asarray(q), amount))
        theirs = (
            ref_angle.partial_rot(ref_rigid.Rotation(quats=torch.tensor(q)), amount)
            .get_quats()
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_sin_cos_ops_parity():
    sc1 = RNG.normal(size=(64, 7, 2)).astype(np.float32)
    sc2 = RNG.normal(size=(64, 7, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(multiply_sin_cos(jnp.asarray(sc1), jnp.asarray(sc2))),
        ref_angle.multiply_sin_cos(torch.tensor(sc1), torch.tensor(sc2)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(inverse_sin_cos(jnp.asarray(sc1))),
        ref_angle.inverse_sin_cos(torch.tensor(sc1)).numpy(),
        atol=1e-5,
    )
    for amount in (0.0, 0.25, 0.8):
        np.testing.assert_allclose(
            np.asarray(partial_sin_cos(jnp.asarray(sc1), amount)),
            ref_angle.partial_sin_cos(torch.tensor(sc1), amount).numpy(),
            atol=1e-5,
        )


def test_rigid_compose_parity():
    # compose_r path: reference goes quat->matrix->matrix-product->eigh->quat;
    # ours is a straight Hamilton product. Compare rotation matrices.
    q1 = _rand_unit_quats((64,))
    q2 = _rand_unit_quats((64,))
    t1 = RNG.normal(size=(64, 3)).astype(np.float32)
    t2 = RNG.normal(size=(64, 3)).astype(np.float32)

    ours = RigidArray(jnp.asarray(q1), jnp.asarray(t1)).compose(
        RigidArray(jnp.asarray(q2), jnp.asarray(t2))
    )
    theirs = ref_rigid.Rigid(
        ref_rigid.Rotation(quats=torch.tensor(q1), normalize_quats=False),
        torch.tensor(t1),
    ).compose(
        ref_rigid.Rigid(
            ref_rigid.Rotation(quats=torch.tensor(q2), normalize_quats=False),
            torch.tensor(t2),
        )
    )
    np.testing.assert_allclose(
        np.asarray(ours.rot_mats()),
        theirs.get_rots().get_rot_mats().numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.trans), theirs.get_trans().numpy(), atol=1e-5
    )


def test_rigid_apply_parity():
    q = _rand_unit_quats((64,))
    t = RNG.normal(size=(64, 3)).astype(np.float32)
    p = RNG.normal(size=(64, 3)).astype(np.float32)
    ours = np.asarray(RigidArray(jnp.asarray(q), jnp.asarray(t)).apply(jnp.asarray(p)))
    theirs = (
        ref_rigid.Rigid(
            ref_rigid.Rotation(quats=torch.tensor(q), normalize_quats=False),
            torch.tensor(t),
        )
        .apply(torch.tensor(p))
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_from_tensor_4x4_matrix_parity():
    q = _rand_unit_quats((64,))
    t = RNG.normal(size=(64, 3)).astype(np.float32)
    t44 = np.asarray(RigidArray(jnp.asarray(q), jnp.asarray(t)).to_tensor_4x4())

    ours = RigidArray.from_tensor_4x4(jnp.asarray(t44))
    theirs = ref_rigid.Rigid.from_tensor_4x4(torch.tensor(t44))
    np.testing.assert_allclose(
        np.asarray(ours.rot_mats()),
        theirs.get_rots().get_rot_mats().numpy(),
        atol=1e-5,
    )
    # quat-level: equal up to sign vs the eigh-derived quats
    ref_quats = theirs.get_rots().get_quats().numpy()
    dots = np.abs(np.sum(np.asarray(ours.quats) * ref_quats, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)


def test_angle_metrics_parity():
    from pmhc_tpu.geometry import get_quat_angle, get_sin_cos_angle

    q1 = _rand_unit_quats((64,))
    q2 = _rand_unit_quats((64,))
    np.testing.assert_allclose(
        np.asarray(get_quat_angle(jnp.asarray(q1), jnp.asarray(q2))),
        ref_angle.get_quat_angle(torch.tensor(q1), torch.tensor(q2)).numpy(),
        atol=1e-4,
    )
    sc1 = RNG.normal(size=(64, 2)).astype(np.float32)
    sc2 = RNG.normal(size=(64, 2)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(get_sin_cos_angle(jnp.asarray(sc1), jnp.asarray(sc2))),
        ref_angle.get_sin_cos_angle(torch.tensor(sc1), torch.tensor(sc2)).numpy(),
        atol=1e-4,
    )


def test_spherical_to_quat_parity():
    from pmhc_tpu.geometry import spherical_to_quat

    phi = RNG.uniform(0, 2 * np.pi, size=(32,)).astype(np.float32)
    theta = RNG.uniform(0, np.pi, size=(32,)).astype(np.float32)
    alpha = RNG.uniform(0, np.pi, size=(32,)).astype(np.float32)
    ours = np.asarray(
        spherical_to_quat(jnp.asarray(phi), jnp.asarray(theta), jnp.asarray(alpha))
    )
    theirs = ref_angle.spherical_to_quat(
        torch.tensor(phi), torch.tensor(theta), torch.tensor(alpha)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_get_rmsd_parity():
    """geometry/frame.py::get_rmsd vs the reference's tools/frame.py:6-7
    (unmasked translation RMSD averaged over the residue axis)."""
    from diffusion.tools.frame import get_rmsd as ref_get_rmsd
    from openfold.utils.rigid_utils import Rigid

    from pmhc_tpu.geometry.frame import get_rmsd

    q = _rand_unit_quats((8, 16))
    t1 = RNG.normal(scale=5.0, size=(8, 16, 3)).astype(np.float32)
    t2 = RNG.normal(scale=5.0, size=(8, 16, 3)).astype(np.float32)

    ours = np.asarray(
        get_rmsd(
            RigidArray(jnp.asarray(q), jnp.asarray(t1)),
            RigidArray(jnp.asarray(q), jnp.asarray(t2)),
        )
    )
    tensor7 = lambda tr: torch.cat([torch.tensor(q), torch.tensor(tr)], dim=-1)
    theirs = ref_get_rmsd(
        Rigid.from_tensor_7(tensor7(t1)), Rigid.from_tensor_7(tensor7(t2))
    ).numpy()
    assert ours.shape == (8,)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)
