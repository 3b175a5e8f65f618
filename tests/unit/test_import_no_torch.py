"""Torch-free .pth reader (models/import_torch.py::_load_state_dict_no_torch):
bit-exact vs torch.load, rejects what it can't prove, and keeps the
sampling path free of the ~3.6 s torch import."""

import numpy as np
import pytest

from pmhc_tpu.models.import_torch import (
    _load_state_dict_no_torch,
    export_torch_checkpoint,
    import_torch_checkpoint,
)

torch = pytest.importorskip("torch")

REF = "/root/reference/model.pth"


def test_no_torch_loader_bit_exact_vs_torch(tmp_path):
    import os

    path = REF
    if not os.path.isfile(path):
        # synthesize an equivalent checkpoint from a fresh init
        import jax

        from pmhc_tpu.models import ScoreNetworkConfig, init_score_network

        params = init_score_network(jax.random.key(0), ScoreNetworkConfig())
        path = str(tmp_path / "m.pth")
        export_torch_checkpoint(params, path)

    ours = _load_state_dict_no_torch(path)
    ref = torch.load(path, map_location="cpu", weights_only=True)
    assert set(ours) == set(ref)
    for k in ours:
        np.testing.assert_array_equal(ours[k], ref[k].numpy())


def test_no_torch_loader_rejects_noncontiguous(tmp_path):
    path = str(tmp_path / "t.pth")
    torch.save({"w": torch.arange(12.0).reshape(3, 4).t()}, path)
    with pytest.raises(Exception):
        _load_state_dict_no_torch(path)
    # the public importer falls back to torch.load for such files
    sd = torch.load(path, map_location="cpu", weights_only=True)
    assert sd["w"].shape == (4, 3)


def test_import_checkpoint_same_tree_with_and_without_torch(tmp_path):
    import jax

    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network

    params = init_score_network(jax.random.key(1), ScoreNetworkConfig())
    path = str(tmp_path / "m.pth")
    export_torch_checkpoint(params, path)
    via_fast = import_torch_checkpoint(path)

    import pmhc_tpu.models.import_torch as it
    orig = it._load_state_dict_no_torch

    def boom(_):
        raise RuntimeError("force torch fallback")

    it._load_state_dict_no_torch = boom
    try:
        via_torch = import_torch_checkpoint(path)
    finally:
        it._load_state_dict_no_torch = orig

    la, lb = (jax.tree_util.tree_leaves(t) for t in (via_fast, via_torch))
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        np.testing.assert_array_equal(a, b)
