"""Golden parity: torsion frames + atom14 placement vs the vendored
OpenFold kernels the reference's PDB writer calls
(``diffusion/tools/pdb.py:71-84`` -> [openfold] feats.py:160-253)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference import install

install()

import jax.numpy as jnp  # noqa: E402
from openfold.np import residue_constants as ref_rc  # noqa: E402
from openfold.utils.feats import (  # noqa: E402
    frames_and_literature_positions_to_atom14_pos,
    torsion_angles_to_frames,
)
from openfold.utils.rigid_utils import Rigid, Rotation  # noqa: E402

import pmhc_tpu.constants as rc  # noqa: E402
from pmhc_tpu.geometry import RigidArray  # noqa: E402
from pmhc_tpu.io.atoms import (  # noqa: E402
    frames_to_atom14_positions,
    torsion_angles_to_frames as our_torsion_frames,
)

RNG = np.random.default_rng(21)


def test_constants_tables_match_openfold():
    np.testing.assert_array_equal(
        rc.restype_rigid_group_default_frame, ref_rc.restype_rigid_group_default_frame
    )
    np.testing.assert_array_equal(
        rc.restype_atom14_to_rigid_group, ref_rc.restype_atom14_to_rigid_group
    )
    np.testing.assert_array_equal(rc.restype_atom14_mask, ref_rc.restype_atom14_mask)
    np.testing.assert_array_equal(
        rc.restype_atom14_rigid_group_positions,
        ref_rc.restype_atom14_rigid_group_positions,
    )
    assert rc.restypes == ref_rc.restypes
    assert rc.restype_1to3 == ref_rc.restype_1to3


def test_atom14_positions_match_openfold():
    B, N = 2, 9
    q = RNG.normal(size=(B, N, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    trans = (RNG.normal(size=(B, N, 3)) * 5).astype(np.float32)
    angles = RNG.uniform(-np.pi, np.pi, size=(B, N, 7)).astype(np.float32)
    torsions = np.stack((np.sin(angles), np.cos(angles)), axis=-1)
    aatype = RNG.integers(0, 20, size=(B, N))

    # ours
    gr, gt = our_torsion_frames(
        RigidArray(jnp.asarray(q), jnp.asarray(trans)),
        jnp.asarray(torsions),
        jnp.asarray(aatype),
        jnp.asarray(rc.restype_rigid_group_default_frame),
    )
    ours = frames_to_atom14_positions(
        gr, gt, jnp.asarray(aatype),
        jnp.asarray(rc.restype_atom14_to_rigid_group),
        jnp.asarray(rc.restype_atom14_mask),
        jnp.asarray(rc.restype_atom14_rigid_group_positions),
    )

    # openfold (as the reference's pdb.py drives it)
    r = Rigid(Rotation(quats=torch.tensor(q), normalize_quats=False), torch.tensor(trans))
    t_aatype = torch.tensor(aatype)
    default_frames = torch.tensor(ref_rc.restype_rigid_group_default_frame)
    frames8 = torsion_angles_to_frames(
        r, torch.tensor(torsions), t_aatype, default_frames
    )
    theirs = frames_and_literature_positions_to_atom14_pos(
        frames8,
        t_aatype,
        default_frames,
        torch.tensor(ref_rc.restype_atom14_to_rigid_group, dtype=torch.long),
        torch.tensor(ref_rc.restype_atom14_mask),
        torch.tensor(ref_rc.restype_atom14_rigid_group_positions),
    )

    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=2e-4)

    # group frames themselves (rotation matrices + translations)
    np.testing.assert_allclose(
        np.asarray(gr), frames8.get_rots().get_rot_mats().numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gt), frames8.get_trans().numpy(), atol=2e-4
    )
