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


def _load_state_dict_no_torch(path: str) -> Dict[str, np.ndarray]:
    """Parse a torch-zip .pth state_dict WITHOUT importing torch.

    Importing torch costs ~3.6 s of interpreter start — a measurable
    share of the sampling CLI's warm wall now that device sampling is
    sub-second (--sample-steps). The zip layout is stable public
    format: ``<prefix>/data.pkl`` pickles the dict with tensors as
    persistent-id references into ``<prefix>/data/<key>`` raw buffers.
    A restricted Unpickler admits only the three globals the format
    needs (safer than a general pickle load); anything else — legacy
    non-zip files, non-contiguous or exotic-dtype tensors, big-endian
    saves — raises and the caller falls back to ``torch.load``.
    """
    import io
    import pickle
    import zipfile

    zf = zipfile.ZipFile(path)  # closed in the finally below
    pkl_name = next(n for n in zf.namelist() if n.endswith("/data.pkl"))
    prefix = pkl_name[: -len("data.pkl")]
    try:
        if zf.read(prefix + "byteorder").decode() != "little":
            raise pickle.UnpicklingError("big-endian save")
    except KeyError:
        pass  # older saves omit the member; they are little-endian

    dtypes = {
        "FloatStorage": np.float32, "DoubleStorage": np.float64,
        "HalfStorage": np.float16, "LongStorage": np.int64,
        "IntStorage": np.int32, "BoolStorage": np.bool_,
    }

    class _Storage:
        def __init__(self, dtype, key):
            self.dtype, self.key = dtype, key

    def rebuild_tensor_v2(storage, offset, size, stride, *_ignored):
        data = np.frombuffer(
            zf.read(prefix + "data/" + storage.key), storage.dtype
        )
        acc, expect = 1, []
        for s in reversed(size):
            expect.insert(0, acc)
            acc *= s
        if tuple(stride) != tuple(expect):
            raise pickle.UnpicklingError("non-contiguous tensor")
        n = int(np.prod(size)) if size else 1
        return data[offset:offset + n].reshape(size).copy()

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
                return rebuild_tensor_v2
            if (module, name) == ("collections", "OrderedDict"):
                import collections

                return collections.OrderedDict
            if module == "torch" and name.endswith("Storage"):
                return name  # marker consumed by persistent_load
            raise pickle.UnpicklingError(f"refusing {module}.{name}")

        def persistent_load(self, pid):
            typ, storage_type, key, _location, _numel = pid
            name = (storage_type if isinstance(storage_type, str)
                    else getattr(storage_type, "__name__", str(storage_type)))
            if typ != "storage" or name not in dtypes:
                raise pickle.UnpicklingError(f"unsupported pid {typ}/{name}")
            return _Storage(np.dtype(dtypes[name]), key)

    try:
        return dict(_Unpickler(io.BytesIO(zf.read(pkl_name))).load())
    finally:
        zf.close()


def import_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference-format .pth state_dict into a params pytree."""
    try:
        state = _load_state_dict_no_torch(path)
    except Exception:
        import torch

        state = torch.load(path, map_location="cpu", weights_only=True)
    params: Dict[str, Any] = {}
    for key, tensor in state.items():
        layer_name, mlp_name, seq_idx, kind = key.split(".")
        mlp_key = _MLP_NAMES[mlp_name]
        lin_key = {"0": "lin1", "2": "lin2"}[seq_idx]
        value = (tensor.detach().numpy() if hasattr(tensor, "detach")
                 else np.asarray(tensor)).astype(np.float32)
        if kind == "weight":
            leaf_name, value = "w", value.T
        else:
            leaf_name = "b"
        params.setdefault(layer_name, {}).setdefault(mlp_key, {}).setdefault(
            lin_key, {}
        )[leaf_name] = value
    return params


def _save_state_dict_no_torch(state: Dict[str, np.ndarray], path: str) -> None:
    """Write a torch-zip .pth state_dict WITHOUT importing torch.

    Inverse of :func:`_load_state_dict_no_torch`: emits the same stable
    public layout the reference's ``torch.save(model.state_dict())``
    produces (``/root/reference/optimize.py:76,79``) — a STORED zip with
    ``<stem>/data.pkl`` (protocol-2 pickle, tensors as persistent-id
    references) plus ``<stem>/data/<i>`` little-endian storage bytes,
    ``byteorder`` and ``version`` members. The pickle stream is built
    opcode-by-opcode and restricted to the opcode subset torch's
    weights-only unpickler accepts (PROTO/GLOBAL/BINUNICODE/BININT*/
    MARK/TUPLE/BINPERSID/NEWFALSE/EMPTY_TUPLE/REDUCE/SETITEMS/STOP), so
    ``torch.load(..., weights_only=True)`` — and the reference's own
    ``test.py:48`` load — consume it directly. float32 contiguous
    tensors only (all 48 reference tensors are)."""
    import struct
    import zipfile

    np_dtypes = {
        np.dtype(np.float32): "FloatStorage",
        np.dtype(np.float64): "DoubleStorage",
        np.dtype(np.float16): "HalfStorage",
        np.dtype(np.int64): "LongStorage",
        np.dtype(np.int32): "IntStorage",
        np.dtype(np.bool_): "BoolStorage",
    }

    out = bytearray()

    def put_str(s: str) -> None:
        b = s.encode("utf-8")
        out.extend(b"X" + struct.pack("<I", len(b)) + b)

    def put_int(i: int) -> None:
        if 0 <= i < 256:
            out.extend(b"K" + bytes([i]))
        elif 0 <= i < 65536:
            out.extend(b"M" + struct.pack("<H", i))
        else:
            out.extend(b"J" + struct.pack("<i", i))

    out.extend(b"\x80\x02")  # PROTO 2
    # empty OrderedDict (GLOBAL + EMPTY_TUPLE + REDUCE), then SETITEMS
    out.extend(b"ccollections\nOrderedDict\n)R(")
    arrays = []
    for i, (name, arr) in enumerate(state.items()):
        arr = np.ascontiguousarray(arr)
        if arr.dtype not in np_dtypes:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        arrays.append(arr)
        put_str(name)
        out.extend(b"ctorch._utils\n_rebuild_tensor_v2\n(")
        # persistent id ('storage', <StorageClass>, key, 'cpu', numel)
        out.extend(b"(")
        put_str("storage")
        out.extend(b"ctorch\n" + np_dtypes[arr.dtype].encode() + b"\n")
        put_str(str(i))
        put_str("cpu")
        put_int(arr.size)
        out.extend(b"tQ")  # TUPLE, BINPERSID
        put_int(0)  # storage_offset
        out.extend(b"(")  # size
        for s in arr.shape:
            put_int(s)
        out.extend(b"t(")  # stride (contiguous)
        acc, strides = 1, []
        for s in reversed(arr.shape):
            strides.insert(0, acc)
            acc *= s
        for s in strides:
            put_int(s)
        out.extend(b"t")
        out.extend(b"\x89")  # requires_grad = False
        out.extend(b"ccollections\nOrderedDict\n)R")  # backward hooks
        out.extend(b"tR")  # close args tuple, REDUCE
    out.extend(b"u.")  # SETITEMS, STOP

    import os

    stem = os.path.splitext(os.path.basename(path))[0] or "archive"
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(f"{stem}/data.pkl", bytes(out))
        zf.writestr(f"{stem}/byteorder", "little")
        for i, arr in enumerate(arrays):
            zf.writestr(
                f"{stem}/data/{i}",
                arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes(),
            )
        zf.writestr(f"{stem}/version", "3\n")


def export_torch_checkpoint(params: Dict[str, Any], path: str) -> None:
    """Write a params pytree as a reference-format .pth state_dict, so
    models trained on TPU can be consumed by reference tooling
    (``/root/reference/test.py:48`` ``torch.load`` + strict
    ``load_state_dict``). torch-free: the train CLI checkpoints every
    100 batches (reference semantics) without ever importing torch."""
    state: Dict[str, np.ndarray] = {}
    rev = {v: k for k, v in _MLP_NAMES.items()}
    for layer_name, layer in params.items():
        for mlp_key, mlp in layer.items():
            seq = {"lin1": "0", "lin2": "2"}
            for lin_key, lin in mlp.items():
                w = np.asarray(lin["w"], dtype=np.float32).T
                b = np.asarray(lin["b"], dtype=np.float32)
                state[f"{layer_name}.{rev[mlp_key]}.{seq[lin_key]}.weight"] = w
                state[f"{layer_name}.{rev[mlp_key]}.{seq[lin_key]}.bias"] = b
    _save_state_dict_no_torch(state, path)
