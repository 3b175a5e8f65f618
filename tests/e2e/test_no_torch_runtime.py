"""The FULL training path is torch-free at runtime (VERDICT r3 next #3).

The reference checkpoints with ``torch.save(model.state_dict())`` every
100 batches and at epoch end (``/root/reference/optimize.py:75-80``); the
round-3 torch-free zip READER removed torch only from the sampling
process, while the train CLI still imported torch to WRITE ``.pth``.
With the torch-free writer (``import_torch._save_state_dict_no_torch``)
a whole train run — including the .pth checkpoint writes — must never
import torch, and the files it writes must be consumable by the
reference's own ``torch.load`` + strict ``load_state_dict``
(``/root/reference/test.py:46-48``).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_train_cli_never_imports_torch(tmp_path):
    """A fresh process trains one epoch (with .pth checkpoint writes) and
    asserts torch was never imported."""
    h5 = str(tmp_path / "train.hdf5")
    model = str(tmp_path / "m.pth")
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {REPO!r})
from pmhc_tpu.data import write_synthetic_hdf5
write_synthetic_hdf5({h5!r}, n_entries=8, peptide_lengths=(9,), seed=3)
from pmhc_tpu.cli.train_cli import main
main([{h5!r}, "1", {model!r}, "-T", "6", "--batch-size", "2"])
assert "torch" not in sys.modules, "torch was imported during training"
print("NO_TORCH_OK")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "NO_TORCH_OK" in proc.stdout
    assert os.path.isfile(model)


def test_torch_free_pth_consumed_by_reference_model(tmp_path):
    """Our torch-free .pth writer's output loads into the actual reference
    Model with strict=True and bit-exact tensors (all 48)."""
    torch = pytest.importorskip("torch")

    import jax

    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.models.import_torch import export_torch_checkpoint

    params = init_score_network(jax.random.key(7), ScoreNetworkConfig())
    path = str(tmp_path / "ours.pth")
    export_torch_checkpoint(params, path)

    state = torch.load(path, map_location="cpu", weights_only=True)
    assert len(state) == 48
    for key, tensor in state.items():
        layer, mlp, idx, kind = key.split(".")
        leaf = params[layer][{
            "feature_mlp": "feature", "message_mlp": "message",
            "attention_mlp": "attention", "translation_mlp": "translation",
            "rotation_mlp": "rotation", "torsion_mlp": "torsion",
        }[mlp]][{"0": "lin1", "2": "lin2"}[idx]]
        expect = np.asarray(leaf["w"]).T if kind == "weight" else np.asarray(leaf["b"])
        np.testing.assert_array_equal(tensor.numpy(), expect.astype(np.float32))

    from tests._reference import install

    install()
    from diffusion.model import Model

    ref_model = Model(16, 22, 1000)
    ref_model.load_state_dict(state, strict=True)  # raises on any mismatch


def test_writer_reader_roundtrip_without_torch(tmp_path):
    """Pure no-torch path: writer -> our own restricted-unpickler reader,
    bit-exact, multiple dtypes."""
    from pmhc_tpu.models.import_torch import (
        _load_state_dict_no_torch,
        _save_state_dict_no_torch,
    )

    rng = np.random.default_rng(11)
    state = {
        "w": rng.normal(size=(300, 500)).astype(np.float32),  # >64k elems
        "b": rng.normal(size=(64,)).astype(np.float32),
        "i": rng.integers(0, 9, size=(4, 3)).astype(np.int64),
        "flag": np.asarray([True, False]),
        "scalar": np.float32(2.25).reshape(()),
    }
    path = str(tmp_path / "rt.pth")
    _save_state_dict_no_torch(state, path)
    back = _load_state_dict_no_torch(path)
    assert set(back) == set(state)
    for k in state:
        np.testing.assert_array_equal(back[k], state[k])
        assert back[k].dtype == state[k].dtype
