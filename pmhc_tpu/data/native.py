"""ctypes binding for the native HDF5 entry decoder (csrc/hdf5_decoder.cc).

Builds the shared library on demand with g++ (no HDF5 dev headers needed:
the decoder declares the C API itself and dlopens the libhdf5 that h5py
bundles, so the library version always matches the files h5py wrote).
Falls back cleanly — ``is_available()`` is False — when no compiler or
libhdf5 is present, and every caller (PackedDataset) keeps the pure-Python
path.

The decoder replicates ``PmhcDataset.get_entry`` bit-exactly (asserted by
tests/unit/test_native_decoder.py): same padding policy, torsion-mask
policy, and float64 Shepperd rot->quat with canonical w >= 0.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Dict, List, Optional

import numpy as np

from pmhc_tpu.data.dataset import PEPTIDE_MAXLEN, POCKET_MAXLEN

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "hdf5_decoder.cc")
_LIB = os.path.join(_REPO, "csrc", "build", "libpmhc_decoder.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _find_libhdf5() -> Optional[str]:
    """Prefer h5py's bundled libhdf5 (version-matched to the writer)."""
    try:
        import h5py

        libs_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(h5py.__file__))),
            "h5py.libs",
        )
        # h5py wheels vendor the lib next to the package as h5py.libs
        for base in (libs_dir,
                     os.path.join(os.path.dirname(h5py.__file__), ".libs")):
            if os.path.isdir(base):
                for f in sorted(os.listdir(base)):
                    if f.startswith("libhdf5-") or f == "libhdf5.so":
                        return os.path.join(base, f)
        # fall back to whatever h5py itself has mapped into the process
        import ctypes.util

        maps = open("/proc/self/maps").read()
        for line in maps.splitlines():
            if "libhdf5" in line and "_hl" not in line:
                return line.split()[-1]
    except Exception:
        pass
    return None


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC, "-ldl"],
            check=True, capture_output=True, text=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        # import h5py FIRST so its libhdf5 is resident and version-matched
        try:
            import h5py  # noqa: F401
        except ImportError:
            _failed = True
            return None
        # rebuild keyed on a source hash, not mtimes: git does not preserve
        # mtimes, so a stale binary from a fresh checkout must never win
        src_hash = ""
        if os.path.isfile(_SRC):
            with open(_SRC, "rb") as f:
                src_hash = hashlib.sha256(f.read()).hexdigest()
        stamp = _LIB + ".srchash"
        built_hash = ""
        if os.path.isfile(stamp):
            with open(stamp) as f:
                built_hash = f.read().strip()
        if not os.path.isfile(_LIB) or built_hash != src_hash:
            if not _build():
                _failed = True
                return None
            with open(stamp, "w") as f:
                f.write(src_hash)
        hdf5 = _find_libhdf5()
        if hdf5 is None:
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.pmhc_init.argtypes = [ctypes.c_char_p]
        lib.pmhc_init.restype = ctypes.c_int
        lib.pmhc_last_error.restype = ctypes.c_char_p
        f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.pmhc_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            u8, f32, f32, i32, f32, u8, i32, f32, u8, f32, f32, u8,
        ]
        lib.pmhc_decode.restype = ctypes.c_int
        if lib.pmhc_init(hdf5.encode()) != 0:
            _failed = True
            return None
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def decode_packed(hdf5_path: str, names: List[str]) -> Dict[str, np.ndarray]:
    """Decode ``names`` from ``hdf5_path`` into stacked padded arrays —
    one native call for the whole dataset. Raises RuntimeError on decode
    failure, ImportError when the native path is unavailable."""
    lib = _load()
    if lib is None:
        raise ImportError("native decoder unavailable")
    B = len(names)
    N, P, NT, OH = PEPTIDE_MAXLEN, POCKET_MAXLEN, 7, 22
    out = {
        "mask": np.empty((B, N), np.uint8),
        "frames": np.empty((B, N, 7), np.float32),
        "features": np.empty((B, N, OH), np.float32),
        "aatype": np.empty((B, N), np.int32),
        "torsions": np.empty((B, N, NT, 2), np.float32),
        "torsions_mask": np.empty((B, N, NT), np.uint8),
        "pocket_aatype": np.empty((B, P), np.int32),
        "pocket_features": np.empty((B, P, OH), np.float32),
        "pocket_mask": np.empty((B, P), np.uint8),
        "pocket_frames": np.empty((B, P, 7), np.float32),
        "pocket_atom14_positions": np.empty((B, P, 14, 3), np.float32),
        "pocket_atom14_exists": np.empty((B, P, 14), np.uint8),
    }
    c_names = (ctypes.c_char_p * B)(*[n.encode() for n in names])
    rc = lib.pmhc_decode(
        hdf5_path.encode(), c_names, B,
        out["mask"], out["frames"], out["features"], out["aatype"],
        out["torsions"], out["torsions_mask"], out["pocket_aatype"],
        out["pocket_features"], out["pocket_mask"], out["pocket_frames"],
        out["pocket_atom14_positions"], out["pocket_atom14_exists"],
    )
    if rc != 0:
        err = lib.pmhc_last_error().decode()
        raise RuntimeError(f"native decode failed (rc={rc}): {err}")
    # match the Python decoder's dtypes (bool masks)
    for k in ("mask", "torsions_mask", "pocket_mask", "pocket_atom14_exists"):
        out[k] = out[k].astype(bool)
    return out
