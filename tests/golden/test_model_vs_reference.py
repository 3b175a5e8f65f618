"""Golden parity: score-network forward vs the reference, shipped weights.

The strongest test in the suite (SURVEY.md §4 tier 2): identical batch,
identical timestep, the shipped ``model.pth`` weights through both the
torch reference Model and pmhc_tpu's score network; frames (matrix level +
quat level), torsions, and features must agree within float32 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests._reference import install

install()

import jax.numpy as jnp  # noqa: E402
from diffusion.model import Model as RefModel  # noqa: E402
from openfold.utils.rigid_utils import Rigid, Rotation  # noqa: E402

from pmhc_tpu.geometry import RigidArray, quat_to_rot  # noqa: E402
from pmhc_tpu.models import (  # noqa: E402
    ScoreNetworkConfig,
    import_torch_checkpoint,
    score_network_forward,
)

CHECKPOINT = "/root/reference/model.pth"
RNG = np.random.default_rng(7)


def _unit_quats(shape):
    q = RNG.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _unit_sincos(shape):
    a = RNG.uniform(-np.pi, np.pi, size=shape).astype(np.float32)
    return np.stack((np.sin(a), np.cos(a)), axis=-1)


def make_batch(B=3, N=16, P=80, lengths=(9, 10, 11), pocket_len=70):
    mask = np.zeros((B, N), dtype=bool)
    for b, L in enumerate(lengths):
        mask[b, :L] = True
    pocket_mask = np.zeros((B, P), dtype=bool)
    pocket_mask[:, :pocket_len] = True

    quats = _unit_quats((B, N))
    trans = RNG.normal(size=(B, N, 3)).astype(np.float32) * 5.0
    # identity frames in padding, like the dataset (data.py:71-75)
    quats[~mask] = np.array([1.0, 0.0, 0.0, 0.0], dtype=np.float32)
    trans[~mask] = 0.0
    pocket_quats = _unit_quats((B, P))
    pocket_trans = RNG.normal(size=(B, P, 3)).astype(np.float32) * 5.0
    pocket_quats[~pocket_mask] = np.array([1.0, 0.0, 0.0, 0.0], dtype=np.float32)
    pocket_trans[~pocket_mask] = 0.0

    torsions = _unit_sincos((B, N, 7))
    features = np.zeros((B, N, 22), dtype=np.float32)
    aa = RNG.integers(0, 20, size=(B, N))
    features[np.arange(B)[:, None], np.arange(N)[None, :], aa] = 1.0
    features[~mask] = 0.0
    pocket_features = np.zeros((B, P, 22), dtype=np.float32)
    paa = RNG.integers(0, 20, size=(B, P))
    pocket_features[np.arange(B)[:, None], np.arange(P)[None, :], paa] = 1.0
    pocket_features[~pocket_mask] = 0.0

    return {
        "quats": quats,
        "trans": trans,
        "pocket_quats": pocket_quats,
        "pocket_trans": pocket_trans,
        "torsions": torsions,
        "features": features,
        "pocket_features": pocket_features,
        "mask": mask,
        "pocket_mask": pocket_mask,
    }


def run_reference(data, t):
    model = RefModel(16, 22, 1000)
    model.load_state_dict(torch.load(CHECKPOINT, map_location="cpu"))
    model.eval()
    batch = {
        "frames": Rigid(
            Rotation(quats=torch.tensor(data["quats"]), normalize_quats=False),
            torch.tensor(data["trans"]),
        ),
        "torsions": torch.tensor(data["torsions"]),
        "features": torch.tensor(data["features"]),
        "mask": torch.tensor(data["mask"]),
        "pocket_frames": Rigid(
            Rotation(quats=torch.tensor(data["pocket_quats"]), normalize_quats=False),
            torch.tensor(data["pocket_trans"]),
        ),
        "pocket_mask": torch.tensor(data["pocket_mask"]),
        "pocket_features": torch.tensor(data["pocket_features"]),
    }
    with torch.no_grad():
        out = model(batch, t)
    return {
        "quats": out["frames"].get_rots().get_quats().numpy(),
        "trans": out["frames"].get_trans().numpy(),
        "torsions": out["torsions"].numpy(),
    }


def run_ours(data, t):
    config = ScoreNetworkConfig()
    params = import_torch_checkpoint(CHECKPOINT)
    batch = {
        "frames": RigidArray(jnp.asarray(data["quats"]), jnp.asarray(data["trans"])),
        "torsions": jnp.asarray(data["torsions"]),
        "features": jnp.asarray(data["features"]),
        "mask": jnp.asarray(data["mask"]),
        "pocket_frames": RigidArray(
            jnp.asarray(data["pocket_quats"]), jnp.asarray(data["pocket_trans"])
        ),
        "pocket_mask": jnp.asarray(data["pocket_mask"]),
        "pocket_features": jnp.asarray(data["pocket_features"]),
    }
    out = score_network_forward(params, batch, t, config)
    return {
        "quats": np.asarray(out["frames"].quats),
        "trans": np.asarray(out["frames"].trans),
        "torsions": np.asarray(out["torsions"]),
    }


def test_importer_shapes():
    params = import_torch_checkpoint(CHECKPOINT)
    assert set(params.keys()) == {"gnn1", "gnn2"}
    # H=23, E=31 -> message lin1 input 2*23+31 = 77 (SURVEY.md §2 comp. 13)
    assert params["gnn1"]["message"]["lin1"]["w"].shape == (77, 64)
    assert params["gnn2"]["message"]["lin1"]["w"].shape == (64 * 2 + 31, 64)
    assert params["gnn1"]["feature"]["lin2"]["w"].shape == (64, 64)
    assert params["gnn2"]["feature"]["lin2"]["w"].shape == (64, 1)
    n_params = sum(
        np.asarray(leaf).size
        for layer in params.values()
        for mlp in layer.values()
        for lin in mlp.values()
        for leaf in lin.values()
    )
    assert n_params == 79195  # measured from model.pth (SURVEY.md §2)


@pytest.mark.parametrize("t", [0, 500, 1000])
def test_forward_parity_shipped_weights(t):
    data = make_batch()
    ref = run_reference(data, t)
    ours = run_ours(data, t)

    # float32 tolerances: block-matmul reassociation perturbs attention
    # logits by ~1e-6; softmax weights amplify that relatively, and the
    # torsion MLP's unbounded outputs (unlike the sigmoid-bounded rotation
    # path) scale it to ~1e-4 per layer (measured: layer-1 torsions differ
    # 1.4e-4 while quats/trans/features differ 5e-6).
    np.testing.assert_allclose(ours["trans"], ref["trans"], atol=2e-4)
    np.testing.assert_allclose(ours["torsions"], ref["torsions"], atol=2e-3)

    # rotations: compare at matrix level (sign-invariant) AND quat level
    # (signs must agree here: both paths stay quat-backed throughout, the
    # reference only ever hits eigh when frames are matrix-backed, which
    # this input is not)
    np.testing.assert_allclose(
        np.asarray(quat_to_rot(jnp.asarray(ours["quats"]))),
        np.asarray(quat_to_rot(jnp.asarray(ref["quats"]))),
        atol=2e-4,
    )
    np.testing.assert_allclose(ours["quats"], ref["quats"], atol=2e-4)


def test_layer1_parity_shipped_weights():
    """Single-layer parity, tighter than the 2-layer test: isolates the
    EGNN layer math from cross-layer error compounding."""
    import jax.numpy as jnp

    from pmhc_tpu.models.egnn import egnn_forward
    from pmhc_tpu.models.score import relpos_edge_pre

    data = make_batch()
    params = import_torch_checkpoint(CHECKPOINT)
    B, N, P = data["mask"].shape[0], 16, 80
    t = 250

    model = RefModel(16, 22, 1000)
    model.load_state_dict(torch.load(CHECKPOINT, map_location="cpu"))
    model.eval()
    tt = torch.tensor
    ft = torch.full((B, N, 1), t / 1000.0)
    h = torch.cat((tt(data["features"]), ft), dim=-1)
    e = model.relative_position_encodings.clone().unsqueeze(0).expand(B, -1, -1, -1).float()
    pocket_h = torch.cat((tt(data["pocket_features"]), torch.zeros(B, P, 1)), dim=-1)
    with torch.no_grad():
        rf, rtors, ri = model.gnn1(
            Rigid(Rotation(quats=tt(data["quats"]), normalize_quats=False), tt(data["trans"])),
            tt(data["torsions"]), h, e, tt(data["mask"]), pocket_h,
            Rigid(Rotation(quats=tt(data["pocket_quats"]), normalize_quats=False), tt(data["pocket_trans"])),
            tt(data["pocket_mask"]),
        )

    jh = jnp.concatenate(
        (jnp.asarray(data["features"]), jnp.full((B, N, 1), t / 1000.0)), axis=-1
    )
    jpocket_h = jnp.concatenate(
        (jnp.asarray(data["pocket_features"]), jnp.zeros((B, P, 1))), axis=-1
    )
    of, otors, oi = egnn_forward(
        params["gnn1"],
        RigidArray(jnp.asarray(data["quats"]), jnp.asarray(data["trans"])),
        jnp.asarray(data["torsions"]), jh,
        relpos_edge_pre(params["gnn1"], 16),
        jnp.asarray(data["mask"], jnp.float32),
        jpocket_h,
        RigidArray(jnp.asarray(data["pocket_quats"]), jnp.asarray(data["pocket_trans"])),
        jnp.asarray(data["pocket_mask"], jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(of.quats), rf.get_rots().get_quats().numpy(), atol=5e-5
    )
    np.testing.assert_allclose(np.asarray(of.trans), rf.get_trans().numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(oi), ri.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(otors), rtors.numpy(), atol=5e-4)


def test_forward_all_masked_row_is_finite():
    # A fully padded peptide row gets uniform softmax weights in the
    # reference; outputs must stay finite.
    data = make_batch(lengths=(9, 1, 16))
    ours = run_ours(data, 250)
    assert np.isfinite(ours["quats"]).all()
    assert np.isfinite(ours["trans"]).all()
    assert np.isfinite(ours["torsions"]).all()
