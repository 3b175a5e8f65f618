#!/usr/bin/env python
"""Reverse-diffusion sampling benchmark: XLA vs Pallas EGNN backends.

Reports samples/sec for the full T-step scan-compiled sampler on the
default device (the reference runs 1000 sequential host-dispatched model
forwards, SURVEY.md §3.2). Secondary benchmark to bench.py's train metric
(BASELINE.md "Reverse-diffusion samples/sec").
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("-T", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backends", default="xla,lane_scan,g8_scan")
    ap.add_argument("--sample-steps", type=int, default=None,
                    help="strided few-step sampling (default: full T)")
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 MXU matmuls for the MLPs (geometry stays f32)")
    ap.add_argument("--fast-f32", action="store_true",
                    help="3-pass f32 matmuls (lax HIGH in XLA stages; "
                         "bf16 hi/lo split dots inside the kernels) "
                         "instead of the parity-exact ~6-pass HIGHEST")
    ap.add_argument("--inner-size", type=int, default=64,
                    help="I: scaled-model probes (reference 64)")
    ap.add_argument("--message-size", type=int, default=64,
                    help="M: scaled-model probes (reference 64)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.diffusion import DiffusionConfig, gen_noise, sample
    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.train.trainer import prepare_batch

    dc = DiffusionConfig(noise_step_count=args.T)
    batch = prepare_batch(synthetic_batch(batch_size=args.batch_size, seed=0))
    noise = gen_noise(jax.random.key(1), batch["frames"].shape, dc)
    batch["frames"] = noise["frames"]
    batch["torsions"] = noise["torsions"]

    results = {}
    for backend in args.backends.split(","):
        # "lane_scan" = the lane-layout sampler (scan carry stays in the
        # fused kernel's layout; pmhc_tpu/diffusion/sampler_lane.py);
        # "g8_scan" = the same sampler running the geom8 group kernel
        mc = ScoreNetworkConfig(
            noise_step_count=args.T,
            backend="pallas_lane"
            if backend in ("lane_scan", "g8_scan") else backend,
            inner_size=args.inner_size,
            message_size=args.message_size,
        )
        params = init_score_network(jax.random.key(0), mc)
        from pmhc_tpu.models.nn import DEFAULT_PRECISION

        from jax import lax

        prec = (None if args.bf16
                else lax.Precision.HIGH if args.fast_f32
                else DEFAULT_PRECISION)
        if backend in ("lane_scan", "g8_scan"):
            from pmhc_tpu.diffusion.sampler_lane import sample_lane

            # PMHC_G8_FWD_UNROLL: probe knob for the g8 group-loop
            # unroll (swept 1/2/4 on chip: 325.9/324.8/297.7 samples/s
            # at bf16 batch 256 — default 1 is right)
            g8u = int(os.environ.get("PMHC_G8_FWD_UNROLL", "1"))
            run = jax.jit(
                lambda p, b, k, _g8=(backend == "g8_scan"): sample_lane(
                    p, b, k, dc, mc, precision=prec, g8=_g8, g8_unroll=g8u,
                    num_steps=args.sample_steps)
            )
        else:
            run = jax.jit(
                lambda p, b, k: sample(p, b, k, dc, mc, precision=prec,
                                       num_steps=args.sample_steps)
            )

        import numpy as np

        # device_get as the barrier: block_until_ready returns early on
        # the axon platform (see bench.py note)
        t0 = time.perf_counter()
        out = run(params, batch, jax.random.key(2))
        np.asarray(out["frames"].quats)
        compile_time = time.perf_counter() - t0

        t0 = time.perf_counter()
        for i in range(args.iters):
            out = run(params, batch, jax.random.key(3 + i))
            np.asarray(out["frames"].quats)
        dt = (time.perf_counter() - t0) / args.iters
        results[backend] = {
            "seconds_per_batch": round(dt, 4),
            "samples_per_sec": round(args.batch_size / dt, 2),
            "compile_seconds": round(compile_time, 1),
        }
        print(json.dumps({"backend": backend, **results[backend]}), flush=True)

    names = list(results)
    if len(names) == 2:
        a, b = results[names[0]], results[names[1]]
        print(json.dumps({
            f"{names[1]}_speedup_vs_{names[0]}": round(
                a["seconds_per_batch"] / b["seconds_per_batch"], 2
            )
        }))


if __name__ == "__main__":
    main()
