#!/usr/bin/env python
"""On-chip parity probe for the Pallas kernels at SCALED model dims.

The scaled-dims parity tests (tests/unit/test_kernels_scaled_dims.py)
run in interpret mode under the CPU suite; this probe executes the SAME
comparisons on the real TPU (interpret=False, real Mosaic lowering) at
M = I = 128 and 256 — the correctness companion to the MFU campaign
(tools/mfu_campaign.sh), so the scale story isn't speed-only.

Compares, per dims: lane + g8 forward (f32 and bf16) and the custom-VJP
gradients (both loop variants) against the dense XLA layer on the same
device. One JSON line per comparison; exits non-zero on any mismatch.

Usage:  python tools/probe_scaled_parity.py --dims 128,256 --batch 128
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", default="128,256")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--fwd-atol", type=float, default=5e-4)
    ap.add_argument("--bf16-rtol", type=float, default=6e-2,
                    help="bf16 fwd checks are RELATIVE (err / max(1, "
                         "max|dense|) per output). The binding leaf is "
                         "angle-valued (unit magnitude): bf16's 2^-8 "
                         "matmul roundoff amplifies through the "
                         "25-neighbour reduction and the trig/Hamilton "
                         "composition to ~5e-2 worst-case at batch 128. "
                         "This probe guards DRIFT; the authoritative bf16 "
                         "quality evidence is the 26-run study "
                         "(docs/parity.md), not bit tolerance")
    ap.add_argument("--grad-atol", type=float, default=5e-4)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network
    from pmhc_tpu.models.egnn import egnn_forward
    from pmhc_tpu.models.score import relpos_edge_pre
    from pmhc_tpu.ops.egnn_pallas_lane import (
        egnn_forward_pallas_lane, egnn_forward_pallas_lane_trainable)
    from pmhc_tpu.ops.egnn_pallas_lane_g8 import egnn_forward_pallas_lane_g8
    from pmhc_tpu.ops.egnn_pallas_lane_vjp import egnn_forward_pallas_lane_vjp
    from pmhc_tpu.train.trainer import prepare_batch

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    failures = []

    def emit(name, dims, err, atol, secs):
        ok = bool(err < atol)
        print(json.dumps({"probe": name, "dims": dims,
                          "max_abs_err": float(err), "atol": atol,
                          "ok": ok, "seconds": round(secs, 1)}), flush=True)
        if not ok:
            failures.append((name, dims, err))

    def max_err(a, b, relative=False):
        errs = []
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            e = float(np.abs(np.asarray(x) - np.asarray(y)).max())
            if relative:
                e /= max(1.0, float(np.abs(np.asarray(y)).max()))
            errs.append(e)
        return max(errs)

    for dims in [int(d) for d in args.dims.split(",")]:
        cfg = ScoreNetworkConfig(inner_size=dims, message_size=dims)
        batch = prepare_batch(synthetic_batch(batch_size=args.batch, seed=9))
        params = init_score_network(jax.random.key(0), cfg)["gnn1"]
        B, N = batch["mask"].shape
        Pk = batch["pocket_mask"].shape[-1]
        h = jnp.concatenate(
            (batch["features"], jnp.full((B, N, 1), 0.5, jnp.float32)),
            axis=-1)
        pocket_h = jnp.concatenate(
            (batch["pocket_features"], jnp.zeros((B, Pk, 1), jnp.float32)),
            axis=-1)
        edge_pre = relpos_edge_pre(params, cfg.max_len)
        layer_args = (batch["frames"], batch["torsions"], h, edge_pre,
                      batch["mask"].astype(jnp.float32), pocket_h,
                      batch["pocket_frames"],
                      batch["pocket_mask"].astype(jnp.float32))

        t0 = time.time()
        dense = jax.jit(egnn_forward)(params, *layer_args)
        dense = jax.block_until_ready(dense)
        print(json.dumps({"probe": "dense_xla_compile", "dims": dims,
                          "seconds": round(time.time() - t0, 1)}), flush=True)

        for name, fn, tol, rel in [
            ("lane_fwd_f32", egnn_forward_pallas_lane, args.fwd_atol, False),
            ("g8_fwd_f32", egnn_forward_pallas_lane_g8, args.fwd_atol, False),
            ("lane_fwd_bf16",
             lambda p, *a: egnn_forward_pallas_lane(p, *a, bf16=True),
             args.bf16_rtol, True),
            ("g8_fwd_bf16",
             lambda p, *a: egnn_forward_pallas_lane_g8(p, *a, bf16=True),
             args.bf16_rtol, True),
        ]:
            t0 = time.time()
            out = jax.block_until_ready(jax.jit(fn)(params, *layer_args))
            emit(name, dims, max_err(out, dense, relative=rel), tol,
                 time.time() - t0)

        def scalar(fwd):
            def loss(p):
                f, t, hh = fwd(p)
                return (jnp.sum(f.trans ** 2) * 1e-3
                        + jnp.sum(hh ** 2) * 1e-4 + jnp.sum(t ** 2) * 1e-3)
            return loss

        t0 = time.time()
        g_dense = jax.block_until_ready(
            jax.jit(jax.grad(scalar(lambda p: egnn_forward(p, *layer_args))))
            (params))
        print(json.dumps({"probe": "dense_grad_compile", "dims": dims,
                          "seconds": round(time.time() - t0, 1)}), flush=True)

        for name, fwd in [
            ("vjp_loop_grads",
             lambda p: egnn_forward_pallas_lane_vjp(p, *layer_args)),
            ("vjp_g8_grads",
             lambda p: egnn_forward_pallas_lane_vjp(p, *layer_args, g8=True)),
            ("trainable_remat_grads",
             lambda p: egnn_forward_pallas_lane_trainable(p, *layer_args)),
        ]:
            t0 = time.time()
            g = jax.block_until_ready(jax.jit(jax.grad(scalar(fwd)))(params))
            emit(name, dims, max_err(g, g_dense), args.grad_atol,
                 time.time() - t0)

    if failures:
        print(json.dumps({"result": "FAIL", "failures": [
            {"probe": n, "dims": d, "err": e} for n, d, e in failures]}),
            flush=True)
        return 1
    print(json.dumps({"result": "PASS"}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
