#!/usr/bin/env python
"""Per-stage cycle budget of the g8 Pallas BACKWARD (the train-step cost
center: 72% of device time at batch 1024, docs/status.md).

Methodology: the backward loop kernel is rebuilt with one named stage
ablated at trace time (egnn_pallas_lane_vjp.ABLATE_STAGES — timing-only,
gradients are wrong under ablation) and the full fwd+bwd layer step is
re-timed on the chip. full - ablated = that stage's device cost,
including everything Mosaic dead-code-eliminates with it (the stage's
exclusive producers). A forward-only run gives the recompute+fold share.

Stages (see egnn_pallas_lane_vjp.ABLATE_STAGES):
  rotcm    component-major quaternion adjoint chains + layout crossings
  dw       all weight-gradient accumulations (dW outer products, rowsums)
  head2mm  the fused head-lin2 backward matmul ([32,4T]^T d_out)
  headmm   the fused head-lin1 backward matmul ([4T,T]^T d_pre; the
           message lin2 backward is folded in — whm = wheads @ wm2)
  nbr      per-neighbour collapse/output block (daj/dqj/dtj/dedge)

Prints one JSON line per variant with ms/step and delta vs full.

Usage (on the real chip):
    python tools/bench_bwd_stages.py --batch 1024 --bf16 --scan 20
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
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--fast-f32", action="store_true")
    ap.add_argument("--scan", type=int, default=20,
                    help="grad steps chained per dispatch")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--stages", default="fwdonly,full,rotcm,dw,head2mm,"
                                        "headmm,nbr")
    ap.add_argument("--interpret", action="store_true",
                    help="interpret-mode smoke run (CPU): checks every "
                         "ablation variant traces, not for timing")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.models import ScoreNetworkConfig
    from pmhc_tpu.models.egnn import init_egnn_layer
    from pmhc_tpu.models.score import relpos_edge_pre
    from pmhc_tpu.ops import egnn_pallas_lane_vjp as vjp_mod
    from pmhc_tpu.train.trainer import prepare_batch

    config = ScoreNetworkConfig()
    B = args.batch
    params = init_egnn_layer(
        jax.random.key(0), 64, config.relposenc_depth, 64,
        config.message_size,
    )
    batch = prepare_batch(synthetic_batch(batch_size=B, seed=1))
    N = batch["mask"].shape[1]
    h = jax.random.normal(jax.random.key(2), (B, N, 64), jnp.float32)
    pk_h = jnp.pad(batch["pocket_features"],
                   ((0, 0), (0, 0),
                    (0, 64 - batch["pocket_features"].shape[-1])))
    edge_pre = relpos_edge_pre(params, config.max_len)
    mm_mode = (True if args.bf16
               else "high" if args.fast_f32 else False)

    layer_args = jax.device_put((
        params, batch["frames"], batch["torsions"], h, edge_pre,
        batch["mask"].astype(jnp.float32), pk_h,
        batch["pocket_frames"], batch["pocket_mask"].astype(jnp.float32),
    ))

    def build(fwdonly):
        def layer(p, frames, torsions, hh, edge, mask, pkh, pkf, pkm):
            return vjp_mod.egnn_forward_pallas_lane_vjp(
                p, frames, torsions, hh, edge, mask, pkh, pkf, pkm,
                bf16=mm_mode, g8=True, interpret=args.interpret)

        def loss(p, frames, torsions, hh, edge, mask, pkh, pkf, pkm):
            fr, tor, out_h = layer(p, frames, torsions, hh, edge, mask,
                                   pkh, pkf, pkm)
            return (jnp.sum(fr.trans ** 2) * 1e-6
                    + jnp.sum(fr.quats * 0.7) * 1e-3
                    + jnp.sum(tor ** 2) * 1e-4
                    + jnp.sum(out_h * 0.3) * 1e-5)

        def scanned(p, frames, torsions, hh, edge, mask, pkh, pkf, pkm):
            def body(carry, _):
                # data-dependent chain: each iteration perturbs h by the
                # previous value so steps can't be CSE'd or overlapped away
                if fwdonly:
                    v = loss(p, frames, torsions, hh + carry, edge, mask,
                             pkh, pkf, pkm)
                else:
                    # grads wrt params AND the inter-layer inputs
                    # (frames/torsions/h), matching what the 2-layer train
                    # step backprops through layer 2; every grad leaf is
                    # folded into the carry so NOTHING is dead-code
                    # eliminated (an unused _g lets XLA drop the whole
                    # backward — fwdonly would equal full).
                    v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
                        p, frames, torsions, hh + carry, edge, mask,
                        pkh, pkf, pkm)
                    v = v + jax.tree_util.tree_reduce(
                        lambda a, x: a + jnp.sum(x) * 1e-20, g,
                        jnp.float32(0.0))
                return v * 1e-9, None

            out, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=args.scan)
            return out

        return jax.jit(scanned)

    results = {}
    try:
        for name in args.stages.split(","):
            vjp_mod.ABLATE_STAGES = (
                frozenset() if name in ("full", "fwdonly")
                else frozenset([name]))
            vjp_mod._loop_fn.cache_clear()
            fn = build(fwdonly=name == "fwdonly")
            t0 = time.perf_counter()
            out = fn(*layer_args)
            np.asarray(out)
            compile_s = time.perf_counter() - t0

            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                o = None
                for _ in range(args.iters):
                    o = fn(*layer_args)
                np.asarray(o)
                best = min(best, (time.perf_counter() - t0) / args.iters)
            ms = best / args.scan * 1e3
            results[name] = ms
            row = {"stage": name, "batch": B,
                   "mode": ("bf16" if args.bf16
                            else "fast-f32" if args.fast_f32 else "f32"),
                   "ms_per_step": round(ms, 4),
                   "compile_s": round(compile_s, 1)}
            if "full" in results and name not in ("full", "fwdonly"):
                row["stage_ms"] = round(results["full"] - ms, 4)
                row["share_of_full"] = round(
                    (results["full"] - ms) / results["full"], 3)
            print(json.dumps(row), flush=True)
    finally:
        # ablated kernels compute WRONG gradients — never leave the
        # module in that state for a caller that imported this script
        vjp_mod.ABLATE_STAGES = frozenset()
        vjp_mod._loop_fn.cache_clear()
    if "full" in results and "fwdonly" in results:
        print(json.dumps({
            "bwd_ms": round(results["full"] - results["fwdonly"], 4),
            "note": "full - fwdonly = backward-pass device cost "
                    "(bwd loop kernel + XLA finalize)",
        }), flush=True)


if __name__ == "__main__":
    main()
