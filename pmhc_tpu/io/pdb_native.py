"""ctypes binding for the native PDB ATOM-record formatter
(csrc/pdb_formatter.cc).

Profiled motivation (tools via cProfile, docs/status.md): once the
strided sampler dropped device time to ~0.2 ms/entry, the sampling CLI's
wall became host PDB serialization — 6.8 of 8.9 ms/entry is f-string
formatting of ~1350 atom records. snprintf over packed arrays runs the
same records at ~0.1 ms/entry and is byte-exact vs the Python formatter
(asserted by tests/unit/test_pdb_native_formatter.py).

Build/load mirrors data/native.py: g++ on demand, rebuild keyed on a
source hash (git does not preserve mtimes), clean fallback when no
compiler is present — every caller keeps the pure-Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "csrc", "pdb_formatter.cc")
_LIB = os.path.join(_REPO, "csrc", "build", "libpmhc_pdbfmt.so")
_LINE = 81  # fixed record length while serial <= 99999 and coords fit %8.3f

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB, _SRC],
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
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        lib.pmhc_format_atoms.argtypes = [
            ctypes.c_int, i32, i32, ctypes.c_char, u8, u8, u8, f64,
            u8, ctypes.c_long,
        ]
        lib.pmhc_format_atoms.restype = ctypes.c_long
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def format_atoms(serials: np.ndarray, resseqs: np.ndarray, chain: str,
                 names4: np.ndarray, resnames3: np.ndarray,
                 elements2: np.ndarray, xyz: np.ndarray) -> Optional[bytes]:
    """All ATOM records of one chain as bytes, or None when the native
    formatter is unavailable. Array contracts: serials/resseqs int32 [n],
    names4 uint8 [n,4] (pre-padded name field), resnames3 uint8 [n,3],
    elements2 uint8 [n,2] (right-justified), xyz float64 [n,3]."""
    lib = _load()
    if lib is None:
        return None
    n = int(serials.shape[0])
    if n == 0:
        return b""
    # capacity: fixed 81-byte lines plus slack for %5d/%8.3f overflow
    # widening (huge coords / serials); -1 means even that was exceeded.
    # numpy out buffer, NOT ctypes.create_string_buffer: the latter
    # creates a fresh (c_char * cap) TYPE per call (~1 ms, profiled —
    # 6x the snprintf work itself)
    cap = n * _LINE + 4096
    out = np.empty(cap, np.uint8)
    written = lib.pmhc_format_atoms(
        n, np.ascontiguousarray(serials, np.int32),
        np.ascontiguousarray(resseqs, np.int32),
        chain.encode()[:1], np.ascontiguousarray(names4, np.uint8),
        np.ascontiguousarray(resnames3, np.uint8),
        np.ascontiguousarray(elements2, np.uint8),
        np.ascontiguousarray(xyz, np.float64), out, cap,
    )
    if written < 0:
        return None
    return out[:written].tobytes()
