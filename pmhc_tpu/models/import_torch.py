"""One-way importer: reference torch checkpoint -> pmhc_tpu params pytree.

The reference ships ``model.pth`` (48 tensors, 79,195 params — SURVEY.md §2
component 13), a ``state_dict`` of ``Model(16, 22, 1000)``. This maps each
``gnn{1,2}.<name>_mlp.{0,2}.{weight,bias}`` entry onto the corresponding
pytree leaf, transposing torch's [out, in] Linear weights to JAX's
[in, out] convention. Used by parity tests and to serve the shipped
checkpoint on TPU.

torch is only imported inside the function: the framework itself never
depends on it.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# reference Sequential index -> our MLP leaf (model.py:39-81: Linear at 0,
# ReLU at 1, Linear at 2; trailing Flatten/Sigmoid carry no params)
_MLP_NAMES = {
    "feature_mlp": "feature",
    "message_mlp": "message",
    "attention_mlp": "attention",
    "translation_mlp": "translation",
    "rotation_mlp": "rotation",
    "torsion_mlp": "torsion",
}


def import_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference-format .pth state_dict into a params pytree."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    params: Dict[str, Any] = {}
    for key, tensor in state.items():
        layer_name, mlp_name, seq_idx, kind = key.split(".")
        mlp_key = _MLP_NAMES[mlp_name]
        lin_key = {"0": "lin1", "2": "lin2"}[seq_idx]
        value = tensor.detach().numpy().astype(np.float32)
        if kind == "weight":
            leaf_name, value = "w", value.T
        else:
            leaf_name = "b"
        params.setdefault(layer_name, {}).setdefault(mlp_key, {}).setdefault(
            lin_key, {}
        )[leaf_name] = value
    return params


def export_torch_checkpoint(params: Dict[str, Any], path: str) -> None:
    """Write a params pytree as a reference-format .pth state_dict, so
    models trained on TPU can be consumed by reference tooling."""
    import torch

    state = {}
    rev = {v: k for k, v in _MLP_NAMES.items()}
    for layer_name, layer in params.items():
        for mlp_key, mlp in layer.items():
            seq = {"lin1": "0", "lin2": "2"}
            for lin_key, lin in mlp.items():
                w = np.asarray(lin["w"]).T
                b = np.asarray(lin["b"])
                state[f"{layer_name}.{rev[mlp_key]}.{seq[lin_key]}.weight"] = torch.tensor(w)
                state[f"{layer_name}.{rev[mlp_key]}.{seq[lin_key]}.bias"] = torch.tensor(b)
    torch.save(state, path)
