"""AOT deployment story on the real chip (VERDICT r3 next #4).

Exports the serving sampler as a ``jax.export`` artifact ON TPU, loads
it in a FRESH process, verifies the AOT program's output is
bit-identical to the jitted path on the same inputs, and measures the
startup saving (trace + lower skipped; compile served from the
persistent cache either way).

Two modes:

- ``--mode export``: build a SamplerService, warm it (compiles), save
  the artifact + a reference output npz for the bit-identity check.
- ``--mode load``: in a fresh process, load the artifact, run it on the
  pinned inputs, assert bit-identity vs the saved npz, and report
  time-to-first-result. ``--jit`` instead rebuilds the jitted path
  (the non-AOT baseline) in the fresh process.

Driver mode (default): runs export in-process, then both fresh-process
arms via subprocess, and prints a JSON summary.

Usage (real chip):
    python tools/bench_aot.py --backend g8 --bf16 --sample-steps 50
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_service(args):
    import jax

    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.serve import SamplerService

    params = init_score_network(
        jax.random.key(0),
        ScoreNetworkConfig(noise_step_count=args.T, backend="xla"))
    return SamplerService(
        params, batch_size=args.batch_size, noise_step_count=args.T,
        num_steps=args.sample_steps, backend=args.backend, bf16=args.bf16,
        fast_f32=args.fast_f32, seed=0)


def pinned_inputs(service):
    """The fixed (batch, key) both arms consume: dummy entry, key(7)."""
    import jax

    from pmhc_tpu.serve import dummy_entry

    mb, key, _ = service.build_model_batch([dummy_entry()], jax.random.key(7))
    return mb, key


def fetch_state(state) -> dict:
    return {
        "quats": np.asarray(state["frames"].quats),
        "trans": np.asarray(state["frames"].trans),
        "torsions": np.asarray(state["torsions"]),
    }


def run_export(args) -> None:
    t_import = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.aot import save_sampler

    service = build_service(args)
    t0 = time.perf_counter()
    mb, key = pinned_inputs(service)
    out = fetch_state(service._run(mb, key))  # compiles (or cache hit)
    t_first = time.perf_counter() - t0
    save_sampler(service, args.artifact, fmt=args.fmt)
    np.savez(args.expected, **out)
    print(json.dumps({
        "mode": "export", "fmt": args.fmt,
        "platform": jax.default_backend(),
        "first_result_s": round(t_first, 2),
        "artifact_bytes": os.path.getsize(args.artifact),
        "setup_s": round(t0 - t_import, 2),
    }), flush=True)


def run_fresh(args) -> None:
    """Fresh-process arm: time import -> first result, check bit-identity."""
    t_start = time.perf_counter()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    service = build_service(args)
    mb, key = pinned_inputs(service)
    t0 = time.perf_counter()
    if args.jit:
        run = service._run
    else:
        from pmhc_tpu.aot import load_sampler

        run = load_sampler(args.artifact, service)
    out = fetch_state(run(mb, key))
    t_first = time.perf_counter() - t0

    expected = np.load(args.expected)
    for k, v in out.items():
        np.testing.assert_array_equal(
            v, expected[k], err_msg=f"{k}: AOT output differs from jitted")
    print(json.dumps({
        "mode": "jit" if args.jit else f"aot-{args.fmt}",
        "first_result_s": round(t_first, 2),
        "total_from_start_s": round(time.perf_counter() - t_start, 2),
        "bit_identical": True,
    }), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("driver", "export", "load"),
                    default="driver")
    ap.add_argument("--jit", action="store_true",
                    help="(load mode) rebuild the jitted path instead")
    ap.add_argument("--batch-size", "-b", type=int, default=64)
    ap.add_argument("-T", type=int, default=1000)
    ap.add_argument("--sample-steps", type=int, default=None)
    ap.add_argument("--backend", default="g8")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fast-f32", action="store_true")
    ap.add_argument("--fmt", default="executable",
                    choices=("executable", "stablehlo"),
                    help="artifact format (executable = serialized PJRT "
                         "executable, no compile at load; stablehlo = "
                         "jax.export, loader recompiles)")
    ap.add_argument("--artifact", default=None)
    ap.add_argument("--expected", default=None)
    args = ap.parse_args(argv)

    tmp = None
    if args.artifact is None:
        tmp = tempfile.mkdtemp(prefix="bench_aot_")
        args.artifact = os.path.join(tmp, "sampler.aot")
        args.expected = os.path.join(tmp, "expected.npz")

    if args.mode == "export":
        return run_export(args)
    if args.mode == "load":
        return run_fresh(args)

    # driver: export here, then two fresh subprocesses
    run_export(args)
    base = [sys.executable, os.path.abspath(__file__),
            "--batch-size", str(args.batch_size), "-T", str(args.T),
            "--backend", args.backend, "--fmt", args.fmt,
            "--artifact", args.artifact, "--expected", args.expected,
            "--mode", "load"]
    if args.sample_steps:
        base += ["--sample-steps", str(args.sample_steps)]
    if args.bf16:
        base.append("--bf16")
    if args.fast_f32:
        base.append("--fast-f32")
    for extra in ([], ["--jit"]):
        proc = subprocess.run(base + extra, capture_output=True, text=True,
                              timeout=3600)
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"fresh-process arm {extra} failed")


if __name__ == "__main__":
    main()
