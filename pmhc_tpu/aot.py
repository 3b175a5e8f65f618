"""Ahead-of-time sampler artifacts: compiled executable or StableHLO.

A serving fleet should not pay per-process trace + lowering + compile
of the T-step sampler, and should be able to ship ONE reviewed
artifact whose program cannot drift with the Python source. Two
formats, one loader (``load_sampler`` sniffs the header):

- ``executable`` (default): the compiled PJRT executable itself via
  ``jax.experimental.serialize_executable`` — load skips trace,
  lowering AND XLA compilation (the StableHLO loader's 1346 s compile
  on this chip becomes a deserialize + device-load). Pinned to the
  exact jax version and device kind; the payload is a pickle, so load
  artifacts from trusted sources only.
- ``stablehlo``: ``jax.export`` StableHLO + calling convention —
  portable across jaxlib patch versions and reviewable, but the
  importing process recompiles it (and that compile's cache key
  differs from the jit path's, so the persistent compile cache never
  hits — measured 1346 s vs 28 s warm jit, docs/serving.md).

Both carry a JSON header pinning the configuration; loading on the
wrong platform or against a mismatched service config fails with a
clear error instead of a mid-request crash. No reference analogue
(the reference re-builds its model per process and has no
serialized-program story beyond pickled weights,
``/root/reference/test.py:46-54``).
"""

from __future__ import annotations

import json
import logging
import struct
from typing import Any, Callable, Dict

_log = logging.getLogger(__name__)

MAGIC = b"PMHCAOT1"      # StableHLO (jax.export) artifact
MAGIC_XC = b"PMHCAOTX"   # compiled-executable (serialize_executable)
_registered = False


def _register_serialization() -> None:
    """Register the RigidArray pytree with jax.export (idempotent)."""
    global _registered
    if _registered:
        return
    from jax import export

    from pmhc_tpu.geometry.rigid import RigidArray

    export.register_pytree_node_serialization(
        RigidArray,
        serialized_name="pmhc_tpu.geometry.rigid.RigidArray",
        serialize_auxdata=lambda aux: b"",  # tree_flatten aux is None
        deserialize_auxdata=lambda b: None,
    )
    _registered = True


def _service_meta(service) -> Dict[str, Any]:
    import jax

    return {
        "jax_version": jax.__version__,
        "platform": jax.default_backend(),
        "backend": service.backend,
        "batch_size": service.batch_size,
        "noise_step_count": service.diffusion_config.noise_step_count,
        "num_steps": service.num_steps,
        "precision": str(service.precision),
    }


def export_sampler(service) -> bytes:
    """Serialize the service's sampler for its exact batch shape."""
    import jax
    from jax import export

    from pmhc_tpu.serve import dummy_entry

    _register_serialization()
    mb, key, _ = service.build_model_batch(
        [dummy_entry()], jax.random.key(0))
    exported = export.export(service._run)(mb, key)
    blob = exported.serialize()
    meta = json.dumps(_service_meta(service)).encode()
    return MAGIC + struct.pack("<I", len(meta)) + meta + blob


def export_compiled(service) -> bytes:
    """Serialize the COMPILED sampler executable (no compile at load).

    The StableHLO format (:func:`export_sampler`) pins the *program*
    but its loader still pays a full XLA compile in the importing
    process (measured 1346 s on this chip vs 28 s for a warm-cache jit
    — the deserialized module's cache key differs from the jit path's,
    so the persistent compile cache never hits). This format pickles
    the PJRT executable itself via ``jax.experimental
    .serialize_executable``: load is deserialize + device-load,
    skipping trace, lowering AND compilation.

    Trade-offs vs StableHLO: tied to the exact jaxlib version and
    device kind (checked at load from the header), and the payload is
    a pickle — load artifacts from trusted sources only.
    """
    import pickle

    import jax
    from jax.experimental import serialize_executable

    from pmhc_tpu.serve import dummy_entry

    mb, key, _ = service.build_model_batch(
        [dummy_entry()], jax.random.key(0))
    compiled = service._run.lower(mb, key).compile()
    payload, in_tree, out_tree = serialize_executable.serialize(compiled)
    blob = pickle.dumps((payload, in_tree, out_tree))
    meta_d = _service_meta(service)
    # the executable is compiled for a specific device assignment; the
    # loader must pin execution_devices to the same COUNT (on a
    # multi-device client the default would be every addressable
    # device, and execute_sharded then expects n_devices shards per arg)
    meta_d["num_devices"] = len(compiled._executable.unsafe_call.
                                xla_executable.local_devices())
    meta = json.dumps(meta_d).encode()
    return MAGIC_XC + struct.pack("<I", len(meta)) + meta + blob


def save_sampler(service, path: str, fmt: str = "executable") -> None:
    """Write an AOT artifact: ``fmt="executable"`` (default — loads in
    seconds) or ``fmt="stablehlo"`` (portable across jaxlib patch
    versions, but the loader recompiles)."""
    if fmt not in ("executable", "stablehlo"):
        raise ValueError(f"unknown AOT format {fmt!r}")
    data = (export_compiled(service) if fmt == "executable"
            else export_sampler(service))
    with open(path, "wb") as f:
        f.write(data)
    _log.info("exported AOT sampler artifact (%s, %d bytes) to %s",
              fmt, len(data), path)


def load_sampler(path: str, service=None) -> Callable:
    """Load an artifact; returns the ``(batch, key) -> state`` callable.

    With ``service`` given, the artifact's configuration is checked
    against the service's and the service's ``_run`` is replaced in
    place (so ``dispatch``/``BatchingSampler`` use the AOT program).
    """
    import jax

    _register_serialization()
    with open(path, "rb") as f:
        data = f.read()
    magic = data[: len(MAGIC)]
    if magic not in (MAGIC, MAGIC_XC):
        raise ValueError(f"{path}: not a pmhc AOT artifact")
    off = len(MAGIC)
    (meta_len,) = struct.unpack_from("<I", data, off)
    off += 4
    meta = json.loads(data[off:off + meta_len].decode())
    blob = data[off + meta_len:]

    platform = jax.default_backend()
    if meta["platform"] != platform:
        raise ValueError(
            f"{path}: artifact was lowered for platform "
            f"'{meta['platform']}' but this process runs '{platform}'")
    if meta["jax_version"] != jax.__version__:
        if magic == MAGIC_XC:
            raise ValueError(
                f"{path}: compiled-executable artifact built with jax "
                f"{meta['jax_version']} cannot load under "
                f"{jax.__version__}; re-export, or use the stablehlo "
                f"format for cross-version artifacts")
        _log.warning(
            "%s: artifact built with jax %s, running %s — jax.export "
            "guarantees only best-effort cross-version compatibility",
            path, meta["jax_version"], jax.__version__)
    if service is not None:
        mine = _service_meta(service)
        mismatch = {k: (meta[k], mine[k]) for k in
                    ("backend", "batch_size", "noise_step_count",
                     "num_steps", "precision")
                    if meta[k] != mine[k]}
        if mismatch:
            raise ValueError(
                f"{path}: artifact configuration does not match the "
                f"service: {mismatch}")
    if magic == MAGIC_XC:
        import pickle

        from jax.experimental import serialize_executable

        n_dev = meta.get("num_devices", 1)
        run = serialize_executable.deserialize_and_load(
            *pickle.loads(blob),
            execution_devices=jax.devices()[:n_dev])
    else:
        from jax import export

        run = export.deserialize(blob).call
    if service is not None:
        service._run = run
    return run
