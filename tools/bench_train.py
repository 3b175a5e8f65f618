"""Train-step throughput at configurable batch/backend/precision.

Measures the scan-amortized jitted train step (device-resident stacked
batches, device-fetch barrier — see bench.py timing notes: on the axon
platform ``block_until_ready`` returns early, so the barrier is a
``np.asarray`` fetch over a data-dependent step chain).

Usage (real chip):
    python tools/bench_train.py --batches 64,1024 \
        --backends pallas_lane,g8 --bf16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,1024")
    ap.add_argument("--backends", default="xla,pallas_lane,g8")
    ap.add_argument("--scan", type=int, default=20,
                    help="steps per dispatch (lax.scan)")
    ap.add_argument("--iters", type=int, default=3,
                    help="dispatches per timed window")
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed windows (best wins)")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fast-f32", action="store_true")
    ap.add_argument("--inner-size", type=int, default=64,
                    help="I: scaled-model probes (reference 64)")
    ap.add_argument("--message-size", type=int, default=64,
                    help="M: scaled-model probes (reference 64)")
    args = ap.parse_args()

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.diffusion import DiffusionConfig
    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.models.nn import DEFAULT_PRECISION
    import optax

    from pmhc_tpu.train import TrainConfig
    from pmhc_tpu.train.trainer import make_train_scan, prepare_batch

    precision = (None if args.bf16
                 else jax.lax.Precision.HIGH if args.fast_f32
                 else DEFAULT_PRECISION)
    pname = "bf16" if args.bf16 else ("f32x3" if args.fast_f32 else "f32")
    dc = DiffusionConfig()
    tc = TrainConfig(seed=0)

    for bs in [int(b) for b in args.batches.split(",")]:
        batches = [synthetic_batch(batch_size=bs, seed=s)
                   for s in range(args.scan)]
        stacked = jax.device_put(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[prepare_batch(b) for b in batches]
        ))
        for backend in args.backends.split(","):
            mc = ScoreNetworkConfig(backend=backend,
                                    inner_size=args.inner_size,
                                    message_size=args.message_size)
            params = init_score_network(jax.random.key(0), mc)
            opt = optax.adam(tc.learning_rate)
            opt_state = opt.init(params)
            key = jax.random.key(1)
            scan = make_train_scan(mc, dc, opt, precision=precision)
            # the jitted scan DONATES params/opt_state/key — never reuse
            # an input after a call; thread the outputs forward instead
            try:
                p, o, k = params, opt_state, key
                for _ in range(2):  # warmup/compile
                    p, o, k, sums = scan(p, o, stacked, k)
                np.asarray(sums["total loss"])
            except Exception as e:  # noqa: BLE001
                print(f"batch {bs} {backend} {pname}: FAILED {type(e).__name__}: {e}")
                continue
            best = 0.0
            for _ in range(args.repeats):
                start = time.perf_counter()
                for _ in range(args.iters):
                    p, o, k, sums = scan(p, o, stacked, k)
                np.asarray(sums["total loss"])
                dt = time.perf_counter() - start
                best = max(best, args.iters * args.scan / dt)
            print(f"batch {bs} {backend} {pname}: "
                  f"{best:.1f} steps/s = {best * bs:.0f} examples/s")


if __name__ == "__main__":
    main()
