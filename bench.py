#!/usr/bin/env python
"""Benchmark: pmhc_tpu train steps/sec vs the PyTorch reference in-situ.

Prints ONE JSON line:
  {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": ratio}

- ours: the jitted train step (batch 64, T=1000, reference-equivalent
  model) on the default JAX device (the real TPU chip under the driver).
- baseline: the reference's ``DiffusionModelOptimizer.optimize`` measured
  in-situ on this machine (CPU — the reference has no TPU support; its
  device selection is cuda-or-cpu, ``optimize.py:48-50``). The reference
  publishes no numbers of its own (BASELINE.md).
"""

import json
import os
import sys
import time

BATCH_SIZE = 64
WARMUP = 2
ITERS = 10
# The axon tunnel's dispatch/execute latency fluctuates by 2-3x over the
# course of a session (measured 36-99 steps/s on an idle chip 2026-08-16);
# report the best of several measurement windows — the standard timeit-min
# defense — so the number reflects the hardware, not transient congestion.
REPEATS = 5
# "scan": K steps per dispatch via lax.scan (identical math to sequential
#         steps — tests/unit/test_train_scan.py; amortizes the axon
#         tunnel's dispatch latency, which fluctuates 2-3x). DEFAULT.
# "step": one jitted optimizer step per dispatch; opt-out if the scan
#         program ever fails to compile on a cold cache.
MODE = os.environ.get("PMHC_BENCH_MODE", "scan")
# steps fused into one dispatch in scan mode; K=50 measured 12% faster
# than K=10 (99.4 vs 88.7 steps/s) and cold-compiles in ~390 s, well
# inside DEADLINE. Override with PMHC_BENCH_K.
STEPS_PER_DISPATCH = (
    int(os.environ.get("PMHC_BENCH_K", "50")) if MODE == "scan" else 1
)
# "f32" (default): full-precision matmuls (HIGHEST), the parity-exact
# configuration. "bf16": MXU-native matmul precision for the MLPs (the
# CLI --bf16 mode); measured 1036 steps/s vs 265 at f32 with
# device-resident input — also reported as a secondary metric on every
# default run. "f32x3": the CLI --fast-f32 mode (3-pass f32 XLA stages;
# only helps the XLA backend, 249 vs 195.7 steps/s — the pallas_lane
# primary stays faster, so it is not a default secondary).
PRECISION = os.environ.get("PMHC_BENCH_PRECISION", "f32")
# EGNN backend for the train step: "pallas_lane" trains through the
# hand-written Pallas backward (measured 261.5 steps/s f32 / 667 bf16 vs
# 218.2 / 388 for XLA); bench_ours falls back to "xla" if the Mosaic
# compile ever fails on a future platform.
BACKEND = os.environ.get("PMHC_BENCH_BACKEND", "pallas_lane")
BASELINE_ITERS = 3
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_baseline.json")
# Overall deadline (seconds). This environment's remote-compile helper has
# been observed to wedge for hours; if the measurement cannot complete in
# time, the bench falls back to the LAST VERIFIED measurement below rather
# than hanging the driver. Raise via PMHC_BENCH_DEADLINE.
DEADLINE = int(os.environ.get("PMHC_BENCH_DEADLINE", "2400"))
# measured 2026-08-18 on this chip (v5e via axon), batch 64, T=1000,
# backend pallas_lane (fwd + hand-written bwd kernels), device_get
# barriers, scan mode K=50, device-resident input, best of 5 windows;
# vs_baseline is the CONSERVATIVE ratio against the live-re-measured
# torch baseline in the same session (bench.py run, round 3)
LAST_VERIFIED = {"steps_per_sec": 259.36, "vs_baseline": 400.65}


def bench_ours(precision_name: str = None, backend: str = None,
               batch_size: int = None, steps_per_dispatch: int = None) -> float:
    import jax

    # persistent compile cache: the EGNN train step takes minutes to
    # compile cold; across bench runs the cache makes it seconds
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.diffusion import DiffusionConfig
    from pmhc_tpu.models import ScoreNetworkConfig
    from pmhc_tpu.train import Trainer, TrainConfig

    import numpy as np

    from pmhc_tpu.models.nn import DEFAULT_PRECISION

    pname = precision_name or PRECISION
    if pname == "bf16":
        precision = None
    elif pname == "f32x3":
        precision = jax.lax.Precision.HIGH
    else:
        precision = DEFAULT_PRECISION

    def build_trainer(backend):
        return Trainer(
            ScoreNetworkConfig(backend=backend), DiffusionConfig(),
            TrainConfig(seed=0), precision=precision,
        )

    bsz = batch_size or BATCH_SIZE
    spd = steps_per_dispatch or STEPS_PER_DISPATCH
    trainer = build_trainer(backend or BACKEND)
    batches = [synthetic_batch(batch_size=bsz, seed=s) for s in range(spd)]

    # The metric is TRAIN-STEP throughput, so the input batch lives on
    # device before the timed loop — in production the PrefetchLoader
    # double-buffers uploads behind compute, but trainer.train_batches
    # restacks + re-uploads the host batches on every call, which is
    # loader work, not step work (traced: the device runs 4.5 ms/step
    # while host stack+upload added ~5 ms/step through the tunnel).
    import jax.numpy as jnp

    from pmhc_tpu.train.trainer import make_train_scan, prepare_batch

    if MODE == "scan":
        stacked = jax.device_put(
            jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[prepare_batch(b) for b in batches]
            )
        )
        scan = make_train_scan(
            trainer.model_config, trainer.diffusion_config, trainer.optimizer,
            precision=precision,
        )

        def run_once():
            trainer.params, trainer.opt_state, trainer.key, sums = scan(
                trainer.params, trainer.opt_state, stacked, trainer.key
            )
            return {"total loss": sums["total loss"][-1]}
    else:
        device_batch = jax.device_put(batches[0])

        def run_once():
            return trainer.train_batch(device_batch)

    # NOTE: the timing barrier is a device_get (np.asarray), NOT
    # block_until_ready — the latter returns early under the axon TPU
    # platform (measured: sampler "time" was flat in T with block, linear
    # with device_get). Steps are data-dependent (params chain), so one
    # final fetch bounds the whole pipeline.

    try:
        for _ in range(WARMUP):
            sums = run_once()
        np.asarray(sums["total loss"])
    except Exception:
        if BACKEND == "xla":
            raise
        # Mosaic compile failed: rebuild everything on the XLA backend
        trainer = build_trainer("xla")
        if MODE == "scan":
            scan = make_train_scan(
                trainer.model_config, trainer.diffusion_config,
                trainer.optimizer, precision=precision,
            )
        for _ in range(WARMUP):
            sums = run_once()
        np.asarray(sums["total loss"])
    best = 0.0
    for _ in range(REPEATS):
        start = time.perf_counter()
        for _ in range(ITERS):
            sums = run_once()
        np.asarray(sums["total loss"])
        elapsed = time.perf_counter() - start
        best = max(best, ITERS * spd / elapsed)
    return best


def bench_sampler(batch_size: int = None, bf16: bool = False,
                 num_steps: int = None) -> float:
    """Secondary metric: full T=1000 reverse-diffusion samples/sec.

    Default shape: batch 64, f32, lane-packed fused kernel (measured
    66.7/s vs 49.9 for the XLA backend). With ``bf16=True`` the
    throughput configuration: batch 1024 through the g8 batch-grid
    sampler (measured 336/s — the round-3 sampling headline;
    tools/bench_sampler.py has the full backend x precision matrix).
    Falls back to the XLA backend if the Mosaic compile ever fails on a
    future platform."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.diffusion import DiffusionConfig, gen_noise, sample
    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.models.nn import DEFAULT_PRECISION
    from pmhc_tpu.train.trainer import prepare_batch

    bsz = batch_size or BATCH_SIZE
    dc = DiffusionConfig(noise_step_count=1000)
    batch = prepare_batch(synthetic_batch(batch_size=bsz, seed=0))
    noise = gen_noise(jax.random.key(1), batch["frames"].shape, dc)
    batch["frames"] = noise["frames"]
    batch["torsions"] = noise["torsions"]
    batch = jax.device_put(batch)
    prec = None if bf16 else DEFAULT_PRECISION

    def build(backend):
        mc = ScoreNetworkConfig(noise_step_count=1000, backend=backend)
        params = init_score_network(jax.random.key(0), mc)
        if backend in ("pallas_lane", "g8"):
            # lane-layout scan: carry stays in kernel layout all T steps
            from pmhc_tpu.diffusion.sampler_lane import sample_lane

            fn = lambda p, b, k: sample_lane(
                p, b, k, dc, mc, precision=prec, g8=(backend == "g8"),
                num_steps=num_steps,
            )
        else:
            fn = lambda p, b, k: sample(p, b, k, dc, mc, precision=prec,
                                        num_steps=num_steps)
        return params, jax.jit(fn)

    used = "g8" if bf16 else "pallas_lane"
    try:
        params, run = build(used)
        out = run(params, batch, jax.random.key(2))  # compile + warmup
        np.asarray(out["frames"].quats)
    except Exception:
        used = "xla"
        params, run = build(used)
        out = run(params, batch, jax.random.key(2))
        np.asarray(out["frames"].quats)
    best = 0.0
    for i in range(3):
        start = time.perf_counter()
        out = run(params, batch, jax.random.key(3 + i))
        np.asarray(out["frames"].quats)
        best = max(best, bsz / (time.perf_counter() - start))
    return best, used


def bench_serving() -> dict:
    """Serving metric: sustained requests/s + latency through the REAL
    HTTP path (in-process server, concurrent clients, npz in / PDB out)
    at the production serving config (g8 bf16 --sample-steps 50, batch
    64 — docs/serving.md). The reference has no serving story
    (one test.py process per run); the number stands against the
    offline sampler ceiling."""
    import io
    import statistics
    import tempfile
    import threading

    import http.client

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.cli.serve_cli import build_parser, create_server
    from pmhc_tpu.data import PmhcDataset, write_synthetic_hdf5
    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.models.import_torch import export_torch_checkpoint
    from pmhc_tpu.serve import entry_from_dataset

    tmp = tempfile.mkdtemp(prefix="bench_serving_")
    params = init_score_network(
        jax.random.key(0), ScoreNetworkConfig(backend="xla"))
    model_path = f"{tmp}/model.pth"
    export_torch_checkpoint(params, model_path)
    backend = "g8" if jax.default_backend() == "tpu" else "xla"
    server = create_server(build_parser().parse_args(
        [model_path, "--port", "0", "--batch-size", "64", "-T", "1000",
         "--backend", backend, "--bf16", "--sample-steps", "50",
         "--max-wait-ms", "25"]))
    host, port = server.server_address
    threading.Thread(target=server.serve_forever, daemon=True).start()

    data_path = f"{tmp}/entries.hdf5"
    write_synthetic_hdf5(data_path, n_entries=4,
                         peptide_lengths=(9, 10), seed=11)
    ds = PmhcDataset(data_path)
    bodies = []
    for name in ds.entry_names:
        buf = io.BytesIO()
        np.savez(buf, **entry_from_dataset(ds, name))
        bodies.append(buf.getvalue())

    lat, errors = [], {}
    lock = threading.Lock()
    REQUESTS, CONC = 256, 96

    def post(i):
        t0 = time.perf_counter()
        conn = http.client.HTTPConnection(host, port, timeout=600)
        conn.request("POST", "/sample", bodies[i % len(bodies)])
        resp = conn.getresponse()
        resp.read()
        conn.close()
        if resp.status != 200:
            raise RuntimeError(f"HTTP {resp.status}")
        return time.perf_counter() - t0

    counter = iter(range(REQUESTS))

    def client():
        while True:
            with lock:
                i = next(counter, None)
            if i is None:
                return
            try:
                dt = post(i)
                with lock:
                    lat.append(dt)
            except Exception as e:  # noqa: BLE001
                # bucket by kind so failures are characterized, not just
                # counted: "HTTP 503" (overload) vs transport errors
                # (ConnectionResetError = accept-backlog overflow, ...)
                kind = (str(e) if str(e).startswith("HTTP ")
                        else type(e).__name__)
                with lock:
                    errors[kind] = errors.get(kind, 0) + 1

    post(0)  # warmup: compiles on a cold cache
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(CONC)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    server.shutdown()
    server.batcher.close()
    server.server_close()
    if not lat:
        raise RuntimeError(f"no successful requests (errors: {errors})")
    lat.sort()
    return {
        "requests_per_sec": len(lat) / wall,
        "p50_s": statistics.median(lat) if lat else None,
        "p99_s": lat[min(len(lat) - 1, int(0.99 * len(lat)))] if lat else None,
        "errors": sum(errors.values()),
        "error_buckets": errors,
    }


# Fastest torch-reference step rate ever observed on this machine
# (quiet host, 2026-08-16). The live re-measurement below is taken in the
# SAME window as the pmhc_tpu measurement, and the ratio uses the FASTEST
# baseline available (live vs this floor vs the cache), so a congested
# host can only make vs_baseline SMALLER, never inflate it
# (VERDICT r2 "Next round" #9).
BASELINE_QUIET_HOST_FLOOR = 0.444


def bench_end_to_end() -> float:
    """Third metric: END-TO-END examples/s including the data pipeline —
    the fused device pipeline the train CLI selects with
    ``--device-data --steps-per-dispatch K`` (batches gathered from the
    device-resident dataset INSIDE the training scan; only the [K, B]
    index matrix crosses the host->device link per dispatch). bf16,
    batch 1024, backend g8 — the CLI's `--backend auto --bf16`
    production configuration (batch-grid backward + w2all; the 56.9k
    examples/s round-2 claim used pallas_lane)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.diffusion import DiffusionConfig
    from pmhc_tpu.models import ScoreNetworkConfig
    from pmhc_tpu.train import Trainer, TrainConfig

    N_ENTRIES, B, K = 4096, 1024, 8
    trainer = Trainer(
        ScoreNetworkConfig(backend=os.environ.get("PMHC_E2E_BACKEND", "g8")),
        DiffusionConfig(),
        TrainConfig(seed=0), precision=None,  # bf16 MXU matmuls
    )
    host = synthetic_batch(batch_size=N_ENTRIES, seed=0, as_jax=False)
    data = jax.device_put({k: v for k, v in host.items() if k != "name"})

    rng = np.random.default_rng(0)

    def epoch_indices(epoch):
        return rng.permutation(N_ENTRIES)[: (N_ENTRIES // B) * B].reshape(-1, B)

    # warmup (compiles the K-step fused scan)
    idx = np.concatenate([epoch_indices(0), epoch_indices(1)])[:K]
    trainer.train_indices(data, idx)
    np.asarray(trainer.params["gnn1"]["message"]["lin1"]["b"])

    # Same window length as the compute-ceiling metric (bench_ours:
    # ITERS=10 dispatches x K steps, ONE fetch barrier at the end):
    # round 4 timed a single 8-step dispatch (~0.11 s), so the ~25 ms
    # tunnel dispatch + fetch barrier read as a fake 28% "input
    # pipeline" gap (VERDICT r4 next #2). The loader work — epoch
    # shuffle, index-chunk staging, per-dispatch Python — stays inside
    # the timed loop; only the window is now long enough to amortize
    # the one-off barrier, exactly as the ceiling's window does.
    n_steps = ITERS * K
    best = 0.0
    for rep in range(3):
        start = time.perf_counter()
        rows, e, done = [], 100 * (rep + 1), 0
        while done < n_steps:
            if not rows:
                rows = list(epoch_indices(e))
                e += 1
            chunk, rows = rows[:K], rows[K:]
            while len(chunk) < K:
                rows = list(epoch_indices(e))
                e += 1
                take = K - len(chunk)
                chunk, rows = chunk + rows[:take], rows[take:]
            trainer.train_indices(data, np.stack(chunk))
            done += len(chunk)
        np.asarray(trainer.params["gnn1"]["message"]["lin1"]["b"])
        elapsed = time.perf_counter() - start
        best = max(best, done * B / elapsed)
    return best


def bench_reference() -> float:
    """Measure the torch reference train step on this machine, live, in
    the same window as the pmhc_tpu measurement. Returns the most
    favorable-to-the-reference rate seen (live, cache, quiet-host floor);
    the cache keeps the best across rounds."""
    cached = 0.0
    if os.path.isfile(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                cached = float(json.load(f)["steps_per_sec"])
        except Exception:
            cached = 0.0

    import numpy as np
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests._reference import install

    install()
    from diffusion.model import Model
    from diffusion.optimizer import DiffusionModelOptimizer
    from diffusion.tools.metrics import MetricsRecord

    from pmhc_tpu.data import synthetic_batch

    torch.manual_seed(0)
    model = Model(16, 22, 1000)
    dm = DiffusionModelOptimizer(1000, model, lr=1e-3)

    np_batch = synthetic_batch(batch_size=BATCH_SIZE, seed=0, as_jax=False)
    keys = ("frames", "torsions", "features", "mask", "torsions_mask",
            "pocket_frames", "pocket_mask", "pocket_features")

    def fresh_batch():
        return {k: torch.tensor(np.asarray(np_batch[k])) for k in keys}

    dm.optimize(fresh_batch(), MetricsRecord())  # warmup
    start = time.perf_counter()
    for _ in range(BASELINE_ITERS):
        dm.optimize(fresh_batch(), MetricsRecord())
    elapsed = time.perf_counter() - start
    live = BASELINE_ITERS / elapsed

    steps_per_sec = max(live, cached, BASELINE_QUIET_HOST_FLOOR)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"steps_per_sec": steps_per_sec, "live": live}, f)
    return steps_per_sec


def _measure_child(queue):
    """Measure phase by phase, queueing a CUMULATIVE result after each
    phase — a deadline mid-secondary can never wipe an already-measured
    primary (the parent keeps the last dict received)."""
    result = {}
    try:
        result["value"] = bench_ours()
        try:
            result["vs_baseline"] = result["value"] / bench_reference()
        except Exception:
            result["vs_baseline"] = None
        queue.put(dict(result))
        try:
            result["sampler"], result["sampler_backend"] = bench_sampler()
        except Exception:
            result["sampler"] = None
        queue.put(dict(result))
        try:
            # the sampling-throughput configuration (round-3 headline):
            # batch 1024 bf16 through the g8 batch-grid sampler
            result["sampler_bf16"], result["sampler_bf16_backend"] = (
                bench_sampler(batch_size=1024, bf16=True))
        except Exception:
            result["sampler_bf16"] = None
        queue.put(dict(result))
        try:
            # strided few-step sampling (--sample-steps 50): the serving
            # throughput mode (quality flat to K=25, docs/parity.md)
            result["sampler_strided"], _ = bench_sampler(
                batch_size=1024, bf16=True, num_steps=50)
        except Exception:
            result["sampler_strided"] = None
        queue.put(dict(result))
        try:
            # secondary axes (skipped silently if a compile ever fails):
            # the bf16 train config on the g8 backend (the fastest bf16
            # trainer) and the 3-pass-f32 config on pallas_lane
            result["bf16"] = (bench_ours("bf16", backend="g8")
                              if PRECISION != "bf16" else None)
        except Exception:
            result["bf16"] = None
        queue.put(dict(result))
        try:
            # --fast-f32 (in-kernel 3-pass f32): the recommended
            # f32-grade throughput mode (quality-equivalent in the
            # 26-run study, docs/parity.md)
            result["fast_f32"] = (bench_ours("f32x3")
                                  if PRECISION == "f32" else None)
        except Exception:
            result["fast_f32"] = None
        queue.put(dict(result))
        try:
            # loader-inclusive throughput (fused device pipeline)
            result["end_to_end"] = bench_end_to_end()
        except Exception:
            result["end_to_end"] = None
        queue.put(dict(result))
        try:
            # compute-ceiling training examples/s: B=1024 bf16 g8 with
            # device-resident input (the 94.2k-class headline, VERDICT r3
            # next #6 — driver-captured instead of hand-picked windows)
            result["train_ex_bf16"] = 1024 * bench_ours(
                "bf16", backend="g8", batch_size=1024, steps_per_dispatch=8)
        except Exception:
            result["train_ex_bf16"] = None
        queue.put(dict(result))
        try:
            # serving: requests/s through the real HTTP path (VERDICT r3
            # next #2 — driver-captured serving metric)
            result["serving"] = bench_serving()
        except Exception:
            result["serving"] = None
        queue.put(dict(result))
    except Exception as exc:  # surfaced by the parent as a fallback
        if "value" not in result:
            queue.put({"error": repr(exc)})


def main():
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    queue = ctx.Queue()
    proc = ctx.Process(target=_measure_child, args=(queue,), daemon=True)
    proc.start()
    # drain cumulative phase results until the child exits or the
    # deadline passes; keep the LAST dict received
    import time as _time

    deadline_at = _time.monotonic() + DEADLINE
    result = None
    while True:
        remaining = deadline_at - _time.monotonic()
        if remaining <= 0:
            break
        try:
            result = queue.get(timeout=min(remaining, 5.0))
        except Exception:
            if not proc.is_alive():
                # child done: grab any final queued result
                try:
                    while True:
                        result = queue.get_nowait()
                except Exception:
                    pass
                break
    if proc.is_alive():
        proc.terminate()

    if result and "value" in result:
        if result.get("sampler") is not None:
            # secondary axes, printed BEFORE the primary so a driver that
            # parses the last JSON line still sees train_steps_per_sec
            print(json.dumps({
                "metric": "sample_throughput",
                "value": round(result["sampler"], 2),
                "unit": "samples/s (T=1000, f32, batch 64, backend "
                        f"{result.get('sampler_backend', '?')})",
            }))
        if result.get("sampler_bf16") is not None:
            print(json.dumps({
                "metric": "sample_throughput_bf16",
                "value": round(result["sampler_bf16"], 2),
                "unit": "samples/s (T=1000, bf16, batch 1024, backend "
                        f"{result.get('sampler_bf16_backend', '?')})",
            }))
        if result.get("sampler_strided") is not None:
            print(json.dumps({
                "metric": "sample_throughput_strided_k50",
                "value": round(result["sampler_strided"], 2),
                "unit": "samples/s (--sample-steps 50 of T=1000, bf16, "
                        "batch 1024, backend g8)",
            }))
        if result.get("bf16") is not None:
            print(json.dumps({
                "metric": "train_steps_per_sec_bf16",
                "value": round(result["bf16"], 3),
                "unit": "steps/s (--bf16 MXU precision, batch 64)",
            }))
        if result.get("fast_f32") is not None:
            print(json.dumps({
                "metric": "train_steps_per_sec_fast_f32",
                "value": round(result["fast_f32"], 3),
                "unit": "steps/s (--fast-f32 in-kernel 3-pass f32, batch 64)",
            }))
        if result.get("end_to_end") is not None:
            print(json.dumps({
                "metric": "end_to_end_examples_per_sec",
                "value": round(result["end_to_end"], 1),
                "unit": "examples/s (loader-inclusive fused device "
                        "pipeline, bf16, batch 1024)",
            }))
        if result.get("train_ex_bf16") is not None:
            print(json.dumps({
                "metric": "train_examples_per_sec_bf16",
                "value": round(result["train_ex_bf16"], 1),
                "unit": "examples/s (compute ceiling: device-resident "
                        "input, bf16, batch 1024, backend g8)",
            }))
        if result.get("serving") is not None:
            s = result["serving"]
            print(json.dumps({
                "metric": "serving_requests_per_sec",
                "value": round(s["requests_per_sec"], 2),
                "unit": "requests/s (HTTP npz->PDB, g8 bf16 "
                        "--sample-steps 50, batch 64, 96 clients; "
                        f"p50 {round(s['p50_s'], 3)}s "
                        f"p99 {round(s['p99_s'], 3)}s "
                        f"errors {s['errors']}"
                        + (f" {s['error_buckets']}" if s["errors"] else "")
                        + ")",
            }))
        out = {
            "metric": "train_steps_per_sec",
            "value": round(result["value"], 3),
            "unit": "steps/s",
            "vs_baseline": round(result["vs_baseline"], 2)
            if result.get("vs_baseline") is not None
            else None,
        }
    else:
        # measurement could not complete (remote-compile helper wedged or
        # child error): report the last verified measurement, explicitly
        # marked stale so BENCH_r*.json can never silently pass off an old
        # number as a live one (VERDICT.md round-1 weak #3)
        out = {
            "metric": "train_steps_per_sec",
            "value": LAST_VERIFIED["steps_per_sec"],
            "unit": "steps/s",
            "vs_baseline": LAST_VERIFIED["vs_baseline"],
            "stale": True,
            "note": "STALE: last verified measurement (live run failed: "
                    f"{(result or {}).get('error', 'compile helper unavailable')})",
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
