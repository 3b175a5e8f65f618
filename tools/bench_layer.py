#!/usr/bin/env python
"""EGNN layer-forward benchmark: XLA vs Pallas backends on the real chip.

Measures ONE layer forward (the unit VERDICT r1 compared: XLA 2.76 ms/step
sampler cost at batch 64, 21.3 ms/layer at batch 1024) with device-resident
inputs and device-fetch barriers (block_until_ready lies on axon).

Prints one JSON line per (backend, batch) with ms per layer forward.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,1024")
    ap.add_argument("--backends", default="xla,pallas,pallas_lane")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--lane-block", type=int, default=1024)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--g8-unroll", type=int, default=1)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--scan", type=int, default=0,
                    help="chain the layer K times inside one lax.scan "
                         "(H=64 chainable config) — measures steady-state "
                         "device cost with per-dispatch overhead amortized, "
                         "like the sampler's scan does")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.models.egnn import egnn_forward
    from pmhc_tpu.models.score import relpos_edge_pre
    from pmhc_tpu.ops.egnn_pallas import egnn_forward_pallas
    from pmhc_tpu.ops.egnn_pallas_lane import egnn_forward_pallas_lane
    from pmhc_tpu.ops.egnn_pallas_lane_g8 import egnn_forward_pallas_lane_g8
    from pmhc_tpu.train.trainer import prepare_batch

    config = ScoreNetworkConfig()
    if args.scan:
        # chainable layer: node features 64 -> 64 (the gnn2 shape but with
        # O=64 so outputs feed back as inputs)
        from pmhc_tpu.models.egnn import init_egnn_layer

        params = init_egnn_layer(
            jax.random.key(0), 64, config.relposenc_depth, 64,
            config.message_size,
        )
    else:
        params = init_score_network(jax.random.key(0), config)["gnn1"]

    for B in [int(b) for b in args.batches.split(",")]:
        batch = prepare_batch(synthetic_batch(batch_size=B, seed=1))
        N = batch["mask"].shape[1]
        Pk = batch["pocket_mask"].shape[1]
        if args.scan:
            h = jax.random.normal(jax.random.key(2), (B, N, 64), jnp.float32)
        else:
            h = jnp.concatenate(
                (batch["features"], jnp.full((B, N, 1), 0.5, jnp.float32)),
                axis=-1,
            )
        pocket_feats = batch["pocket_features"]
        if args.scan:
            # pocket features zero-padded to the layer width (the same
            # thing score.py does between layers)
            pocket_feats = jnp.pad(
                pocket_feats, ((0, 0), (0, 0), (0, 64 - pocket_feats.shape[-1]))
            )
        pocket_h = pocket_feats if args.scan else jnp.concatenate(
            (batch["pocket_features"], jnp.zeros((B, Pk, 1), jnp.float32)),
            axis=-1,
        )
        edge_pre = relpos_edge_pre(params, config.max_len)
        layer_args = jax.device_put((
            params, batch["frames"], batch["torsions"], h, edge_pre,
            batch["mask"].astype(jnp.float32), pocket_h,
            batch["pocket_frames"], batch["pocket_mask"].astype(jnp.float32),
        ))

        from pmhc_tpu.models.nn import DEFAULT_PRECISION

        xla_prec = None if args.bf16 else DEFAULT_PRECISION
        fns = {
            "xla": lambda *a: egnn_forward(*a, xla_prec),
            "pallas": lambda *a: egnn_forward_pallas(*a, batch_block=4),
            "pallas_lane": lambda *a: egnn_forward_pallas_lane(
                *a, lane_block=args.lane_block, unroll=args.unroll,
                bf16=args.bf16),
            "g8": lambda *a: egnn_forward_pallas_lane_g8(
                *a, lane_block=args.lane_block, bf16=args.bf16,
                unroll=args.g8_unroll),
        }
        ref = None
        for backend in args.backends.split(","):
            if args.scan:
                inner = fns[backend]
                K = args.scan

                def scanned(params, frames, torsions, h, edge_pre, mask,
                            pk_h, pk_frames, pk_mask):
                    from pmhc_tpu.geometry import RigidArray

                    def body(carry, _):
                        fr, tor, hh = carry
                        fr, tor, hh = inner(params, fr, tor, hh, edge_pre,
                                            mask, pk_h, pk_frames, pk_mask)
                        # keep the chain numerically bounded so 50 chained
                        # random layers don't overflow (cheap VPU ops,
                        # identical for every backend)
                        fr = RigidArray(fr.quats, jnp.tanh(fr.trans * 0.1) * 10.0)
                        hh = jnp.tanh(hh)
                        return (fr, tor, hh), None

                    (fr, tor, hh), _ = jax.lax.scan(
                        body, (frames, torsions, h), None, length=K)
                    return fr, tor, hh

                fn = jax.jit(scanned)
                scale = 1.0 / K
            else:
                fn = jax.jit(fns[backend])
                scale = 1.0
            t0 = time.perf_counter()
            out = fn(*layer_args)
            np.asarray(out[0].trans)
            compile_s = time.perf_counter() - t0

            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                o = None
                for _ in range(args.iters):
                    o = fn(*layer_args)
                np.asarray(o[0].trans)
                best = min(best, (time.perf_counter() - t0) / args.iters)

            err = None
            if ref is None:
                ref = np.asarray(out[0].trans)
            else:
                err = float(np.abs(np.asarray(out[0].trans) - ref).max())
            print(json.dumps({
                "backend": backend, "batch": B,
                "ms_per_layer": round(best * scale * 1e3, 3),
                "scan": args.scan or None,
                "compile_s": round(compile_s, 1),
                "trans_err_vs_first": err,
            }), flush=True)


if __name__ == "__main__":
    main()
