"""Production serving: a persistent compiled sampler with request
micro-batching.

The reference's only inference surface is the ``test.py`` CLI
(``/root/reference/test.py:28-84``): one HDF5 in, PDB files out, model
and sampler re-initialized per invocation. For production serving on TPU
the expensive things are (a) the trace + compile of the T-step reverse
diffusion program and (b) per-dispatch latency on small batches. This
module keeps ONE compiled sampler resident at a fixed batch shape and
packs concurrent requests into that shape under a bounded micro-batching
delay, so device utilization approaches the offline pipeline's while
each request keeps bounded latency.

Three layers:

- :class:`SamplerService` — params + configs + the jitted sampler for
  one batch shape; ``sample_entries`` takes up to ``batch_size``
  single-complex entry dicts (the :meth:`PmhcDataset.get_entry` contract
  plus the full-protein ``protein_*`` arrays) and returns PDB bytes per
  entry. Device dispatch and host serialization are split so a driver
  can overlap them.
- :class:`BatchingSampler` — a thread-safe ``submit(entry) -> Future``
  front over a service: a collector thread packs queued requests into
  batches (full batch or ``max_wait_ms``, whichever first) and a
  finisher thread fetches + serializes the PREVIOUS batch's PDBs while
  the device runs the next — the same overlap the sampling CLI uses.
- the HTTP front-end lives in :mod:`pmhc_tpu.cli.serve_cli`.

Randomness: each dispatched batch uses ``fold_in(service_key, counter)``;
a request's trajectory therefore depends on which batch it lands in.
Per-request bit-reproducibility across service instances is not a goal here
(use the offline CLI with an explicit ``--seed``/``--backend`` for
that); per-service-run determinism holds when the arrival order does.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Dict, List, Sequence

import numpy as np

_log = logging.getLogger(__name__)

# Single-entry request contract: PmhcDataset.get_entry fields (minus
# "name", minus the pocket_atom14 arrays the model never reads) plus the
# get_protein_positions full-protein arrays (variable length L).
ENTRY_SPECS: Dict[str, tuple] = {
    # name: (shape-with-None-for-variable, dtypes-accepted-kind)
    "mask": ((16,), "b"),
    "frames": ((16, 7), "f"),
    "features": ((16, 22), "f"),
    "aatype": ((16,), "iu"),
    "torsions": ((16, 7, 2), "f"),
    "torsions_mask": ((16, 7), "b"),
    "pocket_features": ((80, 22), "f"),
    "pocket_mask": ((80,), "b"),
    "pocket_frames": ((80, 7), "f"),
    "protein_aatype": ((None,), "iu"),
    "protein_atom14_positions": ((None, 14, 3), "f"),
    "protein_atom14_exists": ((None, 14), "b"),
}


def validate_entry(entry: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Shape/dtype-check one request entry; returns it with arrays
    coerced to the canonical dtypes. Raises ValueError with an
    actionable message on drift (the serving analogue of
    ``pmhc_tpu.data.validate`` for HDF5 files)."""
    out = {}
    missing = [k for k in ENTRY_SPECS if k not in entry]
    if missing:
        raise ValueError(f"entry missing fields: {missing}")
    n_protein = None
    for k, (shape, kinds) in ENTRY_SPECS.items():
        a = np.asarray(entry[k])
        if a.ndim != len(shape):
            raise ValueError(f"{k}: expected rank {len(shape)}, got shape {a.shape}")
        for d, want in zip(a.shape, shape):
            if want is not None and d != want:
                raise ValueError(f"{k}: expected shape {shape}, got {a.shape}")
        if shape[0] is None:
            if n_protein is None:
                n_protein = a.shape[0]
            elif a.shape[0] != n_protein:
                raise ValueError(
                    f"{k}: protein length {a.shape[0]} != {n_protein} of the "
                    "other protein_* arrays")
        ok_kinds = kinds + ("iu" if kinds == "b" else "")  # ints coerce to bool
        if a.dtype.kind not in ok_kinds:
            raise ValueError(f"{k}: dtype {a.dtype} not allowed (kind {kinds})")
        out[k] = a.astype({"b": np.bool_, "f": np.float32, "iu": np.int32}[kinds])
    return out


def entry_from_dataset(dataset, name: str) -> Dict[str, np.ndarray]:
    """Build a serving request entry from an HDF5 dataset entry (the
    convenience path for clients that hold SwiftMHC files)."""
    e = dict(dataset.get_entry(name))
    e.pop("name", None)
    for k in ("pocket_aatype", "pocket_atom14_positions", "pocket_atom14_exists"):
        e.pop(k, None)
    prot = dataset.get_protein_positions([name])
    for k, v in prot.items():
        e[k] = v[0]
    return e


def dummy_entry(protein_len: int = 8) -> Dict[str, np.ndarray]:
    """A structurally valid request entry (synthetic geometry) — used by
    warmup and by the AOT exporter to pin the compiled shapes."""
    from pmhc_tpu.data.synthetic import synthetic_batch

    sb = synthetic_batch(batch_size=1, peptide_len=9, seed=0, as_jax=False)
    entry = {k: np.asarray(v[0]) for k, v in sb.items()
             if k in ENTRY_SPECS and not k.startswith("protein_")}
    entry["protein_aatype"] = np.zeros((protein_len,), np.int32)
    entry["protein_atom14_positions"] = np.zeros((protein_len, 14, 3),
                                                 np.float32)
    entry["protein_atom14_exists"] = np.zeros((protein_len, 14), np.bool_)
    return entry


def _stack_pad(entries: Sequence[Dict[str, np.ndarray]], batch_size: int):
    """Stack entries into one batch of exactly ``batch_size`` rows
    (short batches repeat row 0 — only real rows are returned) and pad
    the variable-length protein_* arrays to the batch max."""
    n = len(entries)
    rows = list(entries) + [entries[0]] * (batch_size - n)
    batch = {
        k: np.stack([r[k] for r in rows])
        for k in ENTRY_SPECS
        if not k.startswith("protein_")
    }
    max_l = max(r["protein_aatype"].shape[0] for r in rows)

    def pad(a):
        if a.shape[0] == max_l:
            return a
        return np.concatenate(
            (a, np.zeros((max_l - a.shape[0],) + a.shape[1:], dtype=a.dtype)))

    protein = {
        k: np.stack([pad(r[k]) for r in rows])
        for k in ENTRY_SPECS
        if k.startswith("protein_")
    }
    return batch, protein


def make_run_sample(
    params,
    diffusion_config,
    model_config,
    tables,
    precision,
    num_steps: int | None = None,
) -> Callable:
    """The jitted (batch, key) -> denoised-state sampler for the
    configured backend — the same dispatch the sampling CLI builds
    (``cli/sample_cli.py``), packaged for reuse by the serving and AOT
    paths."""
    import jax

    backend = model_config.backend
    if backend in ("pallas_lane", "g8"):
        from pmhc_tpu.diffusion.sampler_lane import sample_lane

        def run(batch, key):
            return sample_lane(
                params, batch, key, diffusion_config, model_config, tables,
                precision=precision, g8=backend == "g8", num_steps=num_steps)
    else:
        from pmhc_tpu.diffusion import sample

        def run(batch, key):
            return sample(
                params, batch, key, diffusion_config, model_config, tables,
                precision=precision, num_steps=num_steps)

    return jax.jit(run)


class SamplerService:
    """A resident compiled sampler for one batch shape.

    ``precision``: None = bf16 matmuls, ``jax.lax.Precision.HIGH`` =
    fast-f32, default = parity-exact HIGHEST (mirrors the CLIs).
    """

    def __init__(
        self,
        params,
        *,
        batch_size: int = 64,
        noise_step_count: int = 1000,
        num_steps: int | None = None,
        backend: str = "auto",
        bf16: bool = False,
        fast_f32: bool = False,
        seed: int = 0,
    ):
        import jax

        from pmhc_tpu.diffusion import DiffusionConfig, ScheduleTables
        from pmhc_tpu.models import ScoreNetworkConfig
        from pmhc_tpu.models.nn import DEFAULT_PRECISION

        if backend == "auto":
            backend = ("g8" if bf16 else "pallas_lane") \
                if jax.default_backend() == "tpu" else "xla"
        self.backend = backend
        self.batch_size = int(batch_size)
        self.model_config = ScoreNetworkConfig(
            noise_step_count=noise_step_count, backend=backend)
        self.diffusion_config = DiffusionConfig(
            noise_step_count=noise_step_count)
        self.tables = ScheduleTables(self.diffusion_config)
        self.precision = (None if bf16
                          else jax.lax.Precision.HIGH if fast_f32
                          else DEFAULT_PRECISION)
        self.params = params
        self.num_steps = num_steps
        self._run = make_run_sample(
            params, self.diffusion_config, self.model_config, self.tables,
            self.precision, num_steps)
        self.base_key = jax.random.key(seed)

    # -- device side -------------------------------------------------------

    def build_model_batch(self, entries, key):
        """Stack request entries into the compiled batch shape with the
        peptide state replaced by pure noise (``test.py:70-74``).
        Returns ``(model_batch, trajectory_key, protein_arrays)`` —
        exactly the ``(batch, key)`` the compiled sampler consumes (the
        AOT exporter uses this to pin shapes)."""
        import jax
        import jax.numpy as jnp

        from pmhc_tpu.diffusion import gen_noise
        from pmhc_tpu.train.trainer import prepare_batch

        if not 0 < len(entries) <= self.batch_size:
            raise ValueError(
                f"{len(entries)} entries for a batch-{self.batch_size} service")
        batch, protein = _stack_pad(entries, self.batch_size)
        model_batch = prepare_batch(batch)
        model_batch["aatype"] = jnp.asarray(batch["aatype"])
        key, noise_key = jax.random.split(key)
        noise = gen_noise(
            noise_key, model_batch["frames"].shape, self.diffusion_config)
        model_batch["frames"] = noise["frames"]
        model_batch["torsions"] = noise["torsions"]
        return model_batch, key, protein

    def dispatch(self, entries: Sequence[Dict[str, np.ndarray]], key):
        """Queue sampling + the PDB-prep conversion for up to
        ``batch_size`` entries on the device; no blocking fetch.
        Returns an opaque handle for :meth:`finalize`."""
        from pmhc_tpu.io.pdb import convert_batch_for_pdb

        model_batch, key, protein = self.build_model_batch(entries, key)
        pred = dict(self._run(model_batch, key))
        pred.update(protein)
        return convert_batch_for_pdb(pred), len(entries)

    # -- host side ---------------------------------------------------------

    @staticmethod
    def finalize(handle) -> List[bytes]:
        """Fetch a :meth:`dispatch` handle and serialize each real
        entry's PDB (host work — overlap it with the next dispatch)."""
        from pmhc_tpu.io.pdb import fetch_pdb_arrays, pdb_bytes

        conv, n = handle
        pc = fetch_pdb_arrays(conv)
        return [pdb_bytes(None, i, precomputed=pc) for i in range(n)]

    def sample_entries(self, entries, key) -> List[bytes]:
        """Blocking dispatch + finalize (the simple single-caller path)."""
        return self.finalize(self.dispatch(entries, key))

    def warmup(self) -> float:
        """Compile the sampler + conversion by running one synthetic
        batch end-to-end; returns elapsed seconds. With the persistent
        compilation cache warm this is fast; cold it pays the one-time
        Mosaic/XLA compile."""
        import jax

        t0 = time.monotonic()
        self.sample_entries([dummy_entry()],
                            jax.random.fold_in(self.base_key, 0))
        return time.monotonic() - t0


class Overloaded(RuntimeError):
    """Raised by :meth:`BatchingSampler.submit` when the pending-request
    queue is at ``max_queue`` — the fail-fast overload signal (the HTTP
    front-end maps it to 503 + Retry-After rather than letting queue
    growth eat memory and blow every later request's latency)."""


class BatchingSampler:
    """Thread-safe micro-batching front over a :class:`SamplerService`.

    ``submit(entry)`` returns a ``concurrent.futures.Future`` resolving
    to that entry's PDB bytes. A collector thread packs the queue into
    batches (dispatching as soon as the batch is full or the oldest
    queued request has waited ``max_wait_ms``); a finisher thread
    fetches + serializes batch k while the device samples batch k+1.

    Overload behavior: at most two dispatched batches are in flight
    (the ``maxsize=2`` done queue blocks the collector until the
    finisher drains), and ``max_queue`` bounds the undispatched backlog
    — beyond it ``submit`` raises :class:`Overloaded` immediately.
    ``close()`` drains: every future already accepted is resolved
    (result or exception) before the worker threads exit.
    """

    def __init__(self, service: SamplerService, max_wait_ms: float = 25.0,
                 max_queue: int | None = None):
        self.service = service
        self.max_queue = max_queue
        self.max_wait = max_wait_ms / 1000.0
        self._q: "queue.Queue" = queue.Queue()
        self._done: "queue.Queue" = queue.Queue(maxsize=2)  # backpressure
        self._closed = threading.Event()
        self._counter = 0
        # Serializes the max_queue headroom check against concurrent
        # submitters (the collector only ever SHRINKS the queue, so a
        # check-then-put under this lock can never overshoot the bound).
        self._submit_lock = threading.Lock()
        self._collector = threading.Thread(
            target=self._collect_loop, name="pmhc-serve-collect", daemon=True)
        self._finisher = threading.Thread(
            target=self._finish_loop, name="pmhc-serve-finish", daemon=True)
        self._collector.start()
        self._finisher.start()

    def submit(self, entry: Dict[str, np.ndarray]) -> Future:
        return self.submit_many([entry])[0]

    def submit_many(self, entries) -> List[Future]:
        """Atomically enqueue a group of entries (all or none).

        Either every entry is accepted (each future resolves to its PDB
        bytes, or to the validation error for that entry) or the whole
        group is rejected with :class:`Overloaded` — a multi-sample
        request can never leave already-queued futures orphaned when
        the bound trips mid-group.
        """
        if self._closed.is_set():
            raise RuntimeError("BatchingSampler is closed")
        futures: List[Future] = [Future() for _ in entries]
        accepted = []
        for entry, fut in zip(entries, futures):
            try:
                accepted.append((validate_entry(entry), fut))
            except ValueError as e:
                fut.set_exception(e)
        with self._submit_lock:
            if (self.max_queue is not None and accepted
                    and self._q.qsize() + len(accepted) > self.max_queue):
                raise Overloaded(
                    f"pending queue at max_queue={self.max_queue}; "
                    f"retry later")
            for item in accepted:
                self._q.put(item)
        return futures

    def close(self) -> None:
        self._closed.set()
        self._collector.join(timeout=30)
        self._finisher.join(timeout=30)

    # -- internals ---------------------------------------------------------

    def _collect_loop(self) -> None:
        import jax

        B = self.service.batch_size
        while True:
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                if self._closed.is_set():
                    self._done.put(None)
                    return
                continue
            batch = [first]
            deadline = time.monotonic() + self.max_wait
            while len(batch) < B:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            entries = [e for e, _ in batch]
            futures = [f for _, f in batch]
            key = jax.random.fold_in(self.service.base_key, self._counter)
            self._counter += 1
            try:
                handle = self.service.dispatch(entries, key)
            except Exception as e:  # noqa: BLE001 — propagate to callers
                for f in futures:
                    f.set_exception(e)
                continue
            self._done.put((handle, futures))

    def _finish_loop(self) -> None:
        while True:
            item = self._done.get()
            if item is None:
                return
            handle, futures = item
            try:
                pdbs = self.service.finalize(handle)
            except Exception as e:  # noqa: BLE001
                for f in futures:
                    f.set_exception(e)
                continue
            for f, p in zip(futures, pdbs):
                f.set_result(p)


def frame_models(pdbs: List[bytes]) -> bytes:
    """Join N conformations of one complex into a single multi-MODEL
    PDB (the standard NMR-style framing; what ``--num-samples`` writes
    as separate files, delivered as one response body)."""
    if len(pdbs) == 1:
        return pdbs[0]
    parts = []
    for i, p in enumerate(pdbs):
        body = p[:-len(b"END\n")] if p.endswith(b"END\n") else p
        parts.append(b"MODEL %8d\n" % (i + 1))
        parts.append(body)
        parts.append(b"ENDMDL\n")
    parts.append(b"END\n")
    return b"".join(parts)
