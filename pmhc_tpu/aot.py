"""Ahead-of-time sampler artifacts via ``jax.export``.

A serving fleet should not pay per-process trace + lowering of the
T-step sampler, and should be able to ship ONE reviewed artifact whose
program cannot drift with the Python source. ``export_sampler``
serializes a :class:`pmhc_tpu.serve.SamplerService`'s compiled sampler
(StableHLO + the calling convention) with a JSON header pinning the
configuration; ``load_sampler`` restores it as a drop-in replacement for
the service's jitted ``_run``.

The artifact is platform-specific (the lowering targets cpu or tpu);
loading on the wrong platform fails with a clear error instead of a
mid-request crash. No reference analogue (the reference re-builds its
model per process and has no serialized-program story beyond pickled
weights, ``/root/reference/test.py:46-54``).
"""

from __future__ import annotations

import json
import logging
import struct
from typing import Any, Callable, Dict

_log = logging.getLogger(__name__)

MAGIC = b"PMHCAOT1"
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


def save_sampler(service, path: str) -> None:
    with open(path, "wb") as f:
        f.write(export_sampler(service))
    _log.info("exported AOT sampler artifact to %s", path)


def load_sampler(path: str, service=None) -> Callable:
    """Load an artifact; returns the ``(batch, key) -> state`` callable.

    With ``service`` given, the artifact's configuration is checked
    against the service's and the service's ``_run`` is replaced in
    place (so ``dispatch``/``BatchingSampler`` use the AOT program).
    """
    import jax
    from jax import export

    _register_serialization()
    with open(path, "rb") as f:
        data = f.read()
    if data[: len(MAGIC)] != MAGIC:
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
    run = export.deserialize(blob).call
    if service is not None:
        service._run = run
    return run
