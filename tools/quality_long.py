#!/usr/bin/env python
"""Long-horizon training-quality study: f32/pallas_lane vs bf16/g8.

Decides the training default with data (VERDICT r2 #7): train both
configurations for N steps (default 10k) from the SAME init on the SAME
realistic data with the SAME batch order, then compare

  1. held-out diffusion loss, evaluated identically for both (xla
     backend, f32 HIGHEST) — isolates what training precision/backend
     did to the weights from how the loss is measured;
  2. sampled backbone-RMSD distribution at full T on held-out entries,
     sampled identically for both (xla f32, same key) — the end-user
     quality metric (reference: RMSD in ``diffusion/optimizer.py``'s
     metrics and BASELINE.md).

Run on the real chip (the g8 arm needs Mosaic). One JSON document out.

Usage:
    python tools/quality_long.py --steps 10000 --batch-size 64 \
        --train-entries 2048 --test-entries 128
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
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--batch-size", "-b", type=int, default=64)
    ap.add_argument("--train-entries", type=int, default=2048)
    ap.add_argument("--test-entries", type=int, default=128)
    ap.add_argument("-T", type=int, default=1000)
    ap.add_argument("--sample-T", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-dir", default="/tmp/quality_long_data",
                    help="realistic HDF5s are cached here across runs")
    ap.add_argument("--arms", default="f32:pallas_lane,bf16:g8")
    ap.add_argument("--clip", type=float, default=None,
                    help="apply optax.clip_by_global_norm to every arm "
                         "(mirrors the CLI's opt-in --clip-grad-norm)")
    ap.add_argument("--ema", type=float, default=None,
                    help="also track an EMA of the params (train/ema.py) "
                         "and evaluate heldout/RMSD for BOTH weight sets")
    ap.add_argument("--untrained-anchor", action="store_true",
                    help="also evaluate heldout/RMSD at the INIT params")
    ap.add_argument("--out", default=None, help="also write the JSON here")
    ap.add_argument("--eval-backend", default="xla",
                    help="backend for the held-out eval + sampling passes "
                         "(xla = reference-equivalent default; the Pallas "
                         "backends are parity-tested and compile far "
                         "faster at scaled dims)")
    ap.add_argument("--inner-size", type=int, default=64,
                    help="I: scaled-model stability probes (reference 64)")
    ap.add_argument("--message-size", type=int, default=64,
                    help="M: scaled-model stability probes (reference 64)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    import optax

    from pmhc_tpu.data import (DeviceDataset, PackedDataset,
                               write_realistic_hdf5)
    from pmhc_tpu.data.loader import collate
    from pmhc_tpu.diffusion import (DiffusionConfig, ScheduleTables,
                                    diffusion_loss, add_noise, gen_noise,
                                    sample)
    from pmhc_tpu.models import (ScoreNetworkConfig, init_score_network,
                                 score_network_forward)
    from pmhc_tpu.models.nn import DEFAULT_PRECISION
    from pmhc_tpu.train.trainer import make_train_scan_device, prepare_batch

    B = args.batch_size
    train_h5 = os.path.join(args.data_dir, f"train_{args.train_entries}.hdf5")
    test_h5 = os.path.join(args.data_dir, f"test_{args.test_entries}.hdf5")
    os.makedirs(args.data_dir, exist_ok=True)
    if not os.path.exists(train_h5):
        write_realistic_hdf5(train_h5, n_entries=args.train_entries,
                             seed=args.seed)
    if not os.path.exists(test_h5):
        write_realistic_hdf5(test_h5, n_entries=args.test_entries,
                             seed=args.seed + 99991)

    dataset = DeviceDataset(PackedDataset(train_h5))
    n = len(dataset)
    test_ds = PackedDataset(test_h5)
    test_batch = collate([test_ds[i] for i in range(len(test_ds))])
    test_batch.pop("name", None)

    dc = DiffusionConfig(noise_step_count=args.T)
    tables = ScheduleTables(dc)

    # identical batch order for every arm: default_rng(seed+epoch)
    # per-epoch permutations (the PrefetchLoader convention), full
    # batches only, concatenated then truncated to exactly --steps
    rows = []
    epoch = 0
    while len(rows) * 1 < args.steps * 1 and len(rows) < args.steps:
        perm = np.random.default_rng(args.seed + epoch).permutation(n)
        nfull = n // B
        rows.extend(perm[: nfull * B].reshape(nfull, B))
        epoch += 1
    idx_all = np.stack(rows[: args.steps]).astype(np.int32)  # [steps, B]

    # ---- identical held-out evaluation for every arm (xla, f32) ----
    dims = dict(inner_size=args.inner_size, message_size=args.message_size)
    eval_mc = ScoreNetworkConfig(noise_step_count=args.T,
                                 backend=args.eval_backend, **dims)
    eval_prepared = prepare_batch(dict(test_batch))

    @jax.jit
    def heldout_loss(params, key):
        key_t, key_eps = jax.random.split(key)
        bshape = eval_prepared["frames"].shape
        t = jax.random.randint(key_t, (bshape[0],), 0, args.T)
        eps = gen_noise(key_eps, bshape, dc)
        zt = add_noise(eval_prepared, eps, t, tables)
        pred = score_network_forward(params, zt, t, eval_mc,
                                     DEFAULT_PRECISION)
        losses = diffusion_loss(
            eps, pred, eval_prepared["mask"],
            eval_prepared["torsions_mask"],
            dc.position_loss_weight, dc.rotation_loss_weight,
            dc.torsion_loss_weight)
        return {k: jnp.mean(v) for k, v in losses.items()}

    def heldout_mean(params, n_draws=32):
        acc = None
        for i in range(n_draws):
            out = heldout_loss(params, jax.random.key(args.seed + 7000 + i))
            out = {k: float(v) for k, v in out.items()}
            acc = out if acc is None else {
                k: acc[k] + out[k] for k in out}
        return {k: v / n_draws for k, v in acc.items()}

    # ---- identical sampling for every arm (xla, f32, same key) ----
    mask = np.asarray(test_batch["mask"], dtype=np.float32)
    gt_trans = np.asarray(test_batch["frames"])[..., 4:]

    def backbone_rmsd(pred_trans):
        d2 = ((np.asarray(pred_trans) - gt_trans) ** 2).sum(-1)
        return np.sqrt((d2 * mask).sum(-1) / mask.sum(-1))

    sample_dc = DiffusionConfig(noise_step_count=args.sample_T)
    sample_mc = ScoreNetworkConfig(noise_step_count=args.sample_T,
                                   backend=args.eval_backend, **dims)
    sample_jit = jax.jit(lambda p, b, k: sample(
        p, b, k, sample_dc, sample_mc, precision=DEFAULT_PRECISION))

    def sampled_rmsd(params):
        mb = prepare_batch(dict(test_batch))
        noise = gen_noise(jax.random.key(args.seed + 31),
                          mb["frames"].shape, sample_dc)
        mb["frames"] = noise["frames"]
        mb["torsions"] = noise["torsions"]
        out = sample_jit(params, mb, jax.random.key(args.seed + 32))
        return backbone_rmsd(out["frames"].trans)

    results = {"steps": args.steps, "batch_size": B,
               "train_entries": n, "test_entries": len(test_ds),
               "sample_T": args.sample_T, "arms": {},
               "inner_size": args.inner_size,
               "message_size": args.message_size}
    K = 100  # steps per fused dispatch
    assert args.steps % K == 0

    if args.untrained_anchor:
        # "noise level" anchor: heldout loss + sampled RMSD of the INIT
        # params — any trained arm should beat this decisively
        mc0 = ScoreNetworkConfig(noise_step_count=args.T,
                                 backend=args.eval_backend, **dims)
        p0 = init_score_network(jax.random.key(args.seed), mc0)
        rmsd0 = sampled_rmsd(p0)
        results["untrained"] = {
            "heldout": {kk: round(vv, 6)
                        for kk, vv in heldout_mean(p0, n_draws=8).items()},
            "sampled_rmsd_mean": round(float(rmsd0.mean()), 4),
            "sampled_rmsd_std": round(float(rmsd0.std()), 4),
        }
        print(json.dumps({"untrained": results["untrained"]}), flush=True)

    for spec in args.arms.split(","):
        prec_name, backend = spec.split(":")
        # f32 = parity default (HIGHEST); f32x3 = --fast-f32
        # (lax.Precision.HIGH / in-kernel 3-pass); bf16 = --bf16
        precision = (None if prec_name == "bf16"
                     else jax.lax.Precision.HIGH if prec_name == "f32x3"
                     else DEFAULT_PRECISION)
        mc = ScoreNetworkConfig(noise_step_count=args.T, backend=backend,
                                **dims)
        params = init_score_network(jax.random.key(args.seed), mc)
        parts = [optax.adam(args.lr)]
        if args.clip:
            parts.insert(0, optax.clip_by_global_norm(args.clip))
        if args.ema:
            from pmhc_tpu.train.ema import ema_of_params

            parts.append(ema_of_params(args.ema))
        opt = parts[0] if len(parts) == 1 else optax.chain(*parts)
        opt_state = opt.init(params)
        key = jax.random.key(args.seed + 1)
        scan = make_train_scan_device(mc, dc, opt, precision=precision)
        curve = []
        t0 = time.perf_counter()
        p, o, k = params, opt_state, key
        for start in range(0, args.steps, K):
            idx = jnp.asarray(idx_all[start:start + K])
            p, o, k, sums = scan(p, o, dataset.arrays, idx, k)
            curve.append(float(np.asarray(sums["total loss"]).mean()) / B)
        train_secs = time.perf_counter() - t0
        nan_window = next((i * K for i, c in enumerate(curve)
                           if not np.isfinite(c)), None)
        ema_row = {}
        if nan_window is None:
            held = heldout_mean(p)
            rmsd = sampled_rmsd(p)
            if args.ema:
                from pmhc_tpu.train.ema import extract_ema_params

                pe = extract_ema_params(o)
                held_e = heldout_mean(pe, n_draws=8)
                rmsd_e = sampled_rmsd(pe)
                ema_row = {
                    "ema_decay": args.ema,
                    "ema_heldout_total": round(held_e["total loss"], 6),
                    "ema_sampled_rmsd_mean": round(float(rmsd_e.mean()), 4),
                    "ema_sampled_rmsd_std": round(float(rmsd_e.std()), 4),
                }
        else:  # diverged: skip the (meaningless) eval/sampling passes
            held = {"total loss": float("nan")}
            rmsd = np.full(1, np.nan)
        results["arms"][spec] = {
            "train_seconds": round(train_secs, 1),
            "train_steps_per_sec": round(args.steps / train_secs, 1),
            "loss_curve_per100": [round(c, 5) for c in curve],
            "final_train_loss": round(curve[-1], 5),
            "nan_onset_step": nan_window,
            "heldout": {kk: round(vv, 6) for kk, vv in held.items()},
            "sampled_rmsd_mean": round(float(rmsd.mean()), 4),
            "sampled_rmsd_std": round(float(rmsd.std()), 4),
            **ema_row,
        }
        print(json.dumps({spec: results["arms"][spec]["heldout"],
                          "rmsd": results["arms"][spec]["sampled_rmsd_mean"]}),
              flush=True)

    arms = list(results["arms"])
    if len(arms) == 2:
        a, b = (results["arms"][x] for x in arms)
        ha, hb = a["heldout"]["total loss"], b["heldout"]["total loss"]
        results["heldout_gap_pct"] = round(100.0 * (hb - ha) / ha, 3)
        results["rmsd_gap_pct"] = round(
            100.0 * (b["sampled_rmsd_mean"] - a["sampled_rmsd_mean"])
            / a["sampled_rmsd_mean"], 3)
    doc = json.dumps(results, indent=1)
    print(doc)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc)


if __name__ == "__main__":
    main()
