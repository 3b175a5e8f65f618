#!/usr/bin/env python
"""Root-cause harness for the pallas_lane f32 long-horizon NaN.

tools/quality_long.py found that training from scratch with the
pallas_lane backend at f32 diverges (loss 2.45 -> 3.9 -> NaN around step
2800) while the xla backend on IDENTICAL init/data/noise trains cleanly
to a sampling-quality model. This tool replays that exact trajectory
with the lane backend and, every --probe steps, evaluates loss + grads
with BOTH backends at the SAME params, same batch, same injected
noise — so the first step where the two backends' gradients part ways
(or the lane one goes non-finite) is pinned down, together with which
gradient leaf and what the activation magnitudes were.

Usage (real chip):
    python tools/diag_lane_nan.py --to 3000 --probe 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000, help="idx table len")
    ap.add_argument("--to", type=int, default=3000, help="train this far")
    ap.add_argument("--start-probe", type=int, default=2000,
                    help="probe from this step on")
    ap.add_argument("--probe", type=int, default=50)
    ap.add_argument("--batch-size", "-b", type=int, default=64)
    ap.add_argument("--train-entries", type=int, default=2048)
    ap.add_argument("-T", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-dir", default="/tmp/quality_long_data")
    ap.add_argument("--backend", default="pallas_lane")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pmhc_tpu.data import (DeviceDataset, PackedDataset,
                               write_realistic_hdf5)
    from pmhc_tpu.diffusion import (DiffusionConfig, ScheduleTables,
                                    add_noise, diffusion_loss, gen_noise)
    from pmhc_tpu.models import (ScoreNetworkConfig, init_score_network,
                                 score_network_forward)
    from pmhc_tpu.models.nn import DEFAULT_PRECISION
    from pmhc_tpu.train.trainer import prepare_batch

    B = args.batch_size
    train_h5 = os.path.join(args.data_dir, f"train_{args.train_entries}.hdf5")
    os.makedirs(args.data_dir, exist_ok=True)
    if not os.path.exists(train_h5):
        write_realistic_hdf5(train_h5, n_entries=args.train_entries,
                             seed=args.seed)
    dataset = DeviceDataset(PackedDataset(train_h5))
    n = len(dataset)

    dc = DiffusionConfig(noise_step_count=args.T)
    tables = ScheduleTables(dc)

    # identical batch order to quality_long.py
    rows = []
    epoch = 0
    while len(rows) < args.steps:
        perm = np.random.default_rng(args.seed + epoch).permutation(n)
        nfull = n // B
        rows.extend(perm[: nfull * B].reshape(nfull, B))
        epoch += 1
    idx_all = np.stack(rows[: args.steps]).astype(np.int32)

    lane_mc = ScoreNetworkConfig(noise_step_count=args.T,
                                 backend=args.backend)
    xla_mc = ScoreNetworkConfig(noise_step_count=args.T, backend="xla")
    params = init_score_network(jax.random.key(args.seed), lane_mc)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    key = jax.random.key(args.seed + 1)

    def make_step(mc):
        # mirrors trainer._build_step_fn's draw structure exactly
        # (key -> (key, key_t, key_eps); one t per batch)
        def step(params, opt_state, data, ib, key):
            batch = prepare_batch(
                jax.tree_util.tree_map(lambda x: x[ib], data))
            key, key_t, key_eps = jax.random.split(key, 3)
            t = jax.random.randint(key_t, (), 0, args.T)
            epsilon = gen_noise(key_eps, batch["frames"].shape, dc)

            def loss_fn(p):
                zt = add_noise(batch, epsilon, t, tables)
                pred = score_network_forward(p, zt, t, mc,
                                             DEFAULT_PRECISION)
                losses = diffusion_loss(
                    epsilon, pred, batch["mask"], batch["torsions_mask"],
                    dc.position_loss_weight, dc.rotation_loss_weight,
                    dc.torsion_loss_weight)
                return jnp.mean(losses["total loss"]), losses

            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, key,
                    loss, grads)

        return jax.jit(step)

    lane_step = make_step(lane_mc)
    xla_step = make_step(xla_mc)

    def leafstats(tree):
        flat, _ = jax.tree_util.tree_flatten(
            jax.tree_util.tree_map(
                lambda x: (jnp.max(jnp.abs(x)), jnp.all(jnp.isfinite(x))),
                tree))
        mx = jnp.max(jnp.stack(flat[0::2]))
        fin = jnp.all(jnp.stack(flat[1::2]))
        return mx, fin

    @jax.jit
    def grad_compare(lane_grads, xla_grads):
        def rel(a, b):
            return jnp.max(jnp.abs(a - b)) / (
                jnp.max(jnp.abs(b)) + 1e-20)
        rels = jax.tree_util.tree_map(rel, lane_grads, xla_grads)
        return rels

    timeline = []
    data = dataset.arrays
    leaf_names = None
    for s in range(args.to):
        ib = jnp.asarray(idx_all[s])
        new_params, new_opt, new_key, loss_l, grads_l = lane_step(
            params, opt_state, data, ib, key)
        row = None
        if s >= args.start_probe and (s % args.probe == 0
                                      or not np.isfinite(float(loss_l))):
            _, _, _, loss_x, grads_x = xla_step(
                params, opt_state, data, ib, key)
            rels = grad_compare(grads_l, grads_x)
            rels_flat = {
                "/".join(str(kk.key) if hasattr(kk, "key") else str(kk)
                         for kk in path): float(v)
                for path, v in jax.tree_util.tree_flatten_with_path(rels)[0]
            }
            worst = sorted(rels_flat.items(), key=lambda kv: -kv[1])[:5]
            gmax_l, gfin_l = leafstats(grads_l)
            gmax_x, _ = leafstats(grads_x)
            pmax, _ = leafstats(params)
            row = {
                "step": s,
                "loss_lane": float(loss_l),
                "loss_xla": float(loss_x),
                "gmax_lane": float(gmax_l),
                "gmax_xla": float(gmax_x),
                "grads_finite_lane": bool(gfin_l),
                "pmax": float(pmax),
                "worst_rel_grad": worst,
            }
            timeline.append(row)
            print(json.dumps(row), flush=True)
        if not np.isfinite(float(loss_l)):
            print(json.dumps({"first_nonfinite_loss_step": s}), flush=True)
            break
        params, opt_state, key = new_params, new_opt, new_key

    if args.out:
        with open(args.out, "w") as f:
            json.dump(timeline, f, indent=1)


if __name__ == "__main__":
    main()
