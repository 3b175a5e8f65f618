"""Golden parity: diffusion engine vs the torch reference, injected noise.

Per-function comparisons of add_noise / remove_noise / loss with the exact
same injected noise tensors through both implementations (SURVEY.md §4
tier 2; RNGs bypassed per §7 "Hard parts").
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference import install

install()

import jax.numpy as jnp  # noqa: E402
from diffusion.optimizer import DiffusionModelOptimizer  # noqa: E402
from openfold.utils.rigid_utils import Rigid, Rotation  # noqa: E402

from pmhc_tpu.diffusion import (  # noqa: E402
    DiffusionConfig,
    ScheduleTables,
    add_noise,
    diffusion_loss,
    remove_noise,
)
from pmhc_tpu.geometry import RigidArray, quat_to_rot  # noqa: E402

RNG = np.random.default_rng(123)
T = 1000


def _unit_quats(shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _state(shape=(4, 16)):
    return {
        "quats": _unit_quats(shape),
        "trans": RNG.normal(size=shape + (3,)).astype(np.float32) * 5.0,
        "torsions": _sincos(shape + (7,)),
    }


def _sincos(shape):
    a = RNG.uniform(-np.pi, np.pi, size=shape).astype(np.float32)
    return np.stack((np.sin(a), np.cos(a)), axis=-1)


def _ref_dmo():
    return DiffusionModelOptimizer(T, torch.nn.Linear(1, 1), lr=0.0)


def _to_ref(state):
    return {
        "frames": Rigid(
            Rotation(quats=torch.tensor(state["quats"]), normalize_quats=False),
            torch.tensor(state["trans"]),
        ),
        "torsions": torch.tensor(state["torsions"]),
    }


def _to_ours(state):
    return {
        "frames": RigidArray(jnp.asarray(state["quats"]), jnp.asarray(state["trans"])),
        "torsions": jnp.asarray(state["torsions"]),
    }


@pytest.mark.parametrize("t", [0, 1, 250, 999])
def test_add_noise_parity(t):
    signal, noise = _state(), _state()
    cfg = DiffusionConfig()
    tables = ScheduleTables(cfg)

    ours = add_noise(_to_ours(signal), _to_ours(noise), t, tables)
    theirs = _ref_dmo().add_noise(_to_ref(signal), _to_ref(noise), t)

    np.testing.assert_allclose(
        np.asarray(ours["frames"].trans), theirs["frames"].get_trans().numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours["torsions"]), theirs["torsions"].numpy(), atol=1e-5
    )
    # reference rotations leave as matrix-backed (compose_r); compare matrices
    np.testing.assert_allclose(
        np.asarray(quat_to_rot(ours["frames"].quats)),
        theirs["frames"].get_rots().get_rot_mats().numpy(),
        atol=1e-5,
    )


@pytest.mark.parametrize("t", [1000, 500, 1])
def test_remove_noise_parity(t, monkeypatch):
    noised, predicted, rand = _state(), _state(), _state()
    cfg = DiffusionConfig()
    tables = ScheduleTables(cfg)

    # inject the stochastic draw into the reference (optimizer.py:151)
    monkeypatch.setattr(
        DiffusionModelOptimizer,
        "gen_noise",
        staticmethod(lambda shape, device: _to_ref(rand)),
    )
    theirs = _ref_dmo().remove_noise(_to_ref(noised), _to_ref(predicted), t, t - 1)

    ours = remove_noise(
        _to_ours(noised), _to_ours(predicted), _to_ours(rand), t, t - 1, tables
    )

    np.testing.assert_allclose(
        np.asarray(ours["frames"].trans),
        theirs["frames"].get_trans().numpy(),
        atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["torsions"]), theirs["torsions"].numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(quat_to_rot(ours["frames"].quats)),
        theirs["frames"].get_rots().get_rot_mats().numpy(),
        atol=1e-4,
    )


def test_loss_parity():
    true, pred = _state(), _state()
    mask = np.zeros((4, 16), dtype=bool)
    for b, L in enumerate((9, 10, 11, 16)):
        mask[b, :L] = True
    tmask = RNG.uniform(size=(4, 16, 7)) > 0.5
    tmask[:, :, :3] = False
    tmask[0, 8, 2] = True  # keep every sample's torsion mask non-empty

    ours = diffusion_loss(
        _to_ours(true), _to_ours(pred), jnp.asarray(mask), jnp.asarray(tmask)
    )
    theirs = DiffusionModelOptimizer.get_loss(
        _to_ref(true), _to_ref(pred), torch.tensor(mask), torch.tensor(tmask)
    )

    for key in ("total loss", "positions loss", "rotations loss", "torsions loss", "rmsd"):
        np.testing.assert_allclose(
            np.asarray(ours[key]), theirs[key].numpy(), atol=1e-4,
            err_msg=f"loss component {key!r} diverged",
        )


def test_schedule_tables_match_reference_scalars():
    cfg = DiffusionConfig()
    tables = ScheduleTables(cfg)
    dmo = _ref_dmo()
    for t in (0, 1, 500, 999, 1000):
        beta, alpha, sigma = dmo.get_beta_alpha_sigma(t)
        np.testing.assert_allclose(float(tables.beta[t]), beta, rtol=1e-6)
        np.testing.assert_allclose(float(tables.alpha[t]), alpha, rtol=1e-6)
        np.testing.assert_allclose(float(tables.sigma[t]), sigma, rtol=1e-6)
