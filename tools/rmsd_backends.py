#!/usr/bin/env python
"""Cross-backend sampling distribution check (VERDICT r1 weak #6).

Round 1 documented that individual trajectories diverge between backends
(float reduction order is amplified by the reverse diffusion, up to ~5 A
over 20 steps) — which is fine iff the SAMPLING DISTRIBUTIONS agree. This
tool runs the full sampler for every backend x precision on the same
entries with the same key and asserts each backbone-RMSD distribution
matches the xla-f32 baseline within tolerance.

Run on the real chip (pallas backends) or CPU (they fall back to the
pallas interpreter — slow but correct). One JSON line per config.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-T", type=int, default=200)
    ap.add_argument("--entries", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rtol", type=float, default=0.1,
                    help="relative tolerance on the mean RMSD vs xla-f32")
    ap.add_argument("--configs",
                    default="xla:f32,xla:bf16,blockwise:f32,pallas:f32,pallas_lane:f32")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np
    from jax import lax

    from pmhc_tpu.data import PmhcDataset, write_synthetic_hdf5
    from pmhc_tpu.data.loader import collate
    from pmhc_tpu.diffusion import DiffusionConfig, gen_noise, sample
    from pmhc_tpu.models import ScoreNetworkConfig, import_torch_checkpoint
    from pmhc_tpu.train.trainer import prepare_batch

    ckpt = "/root/reference/model.pth"
    with tempfile.TemporaryDirectory() as d:
        h5 = os.path.join(d, "test.hdf5")
        write_synthetic_hdf5(h5, n_entries=args.entries, seed=args.seed)
        ds = PmhcDataset(h5)
        batch = collate([ds[i] for i in range(len(ds))])
    batch.pop("name", None)

    mask = np.asarray(batch["mask"], dtype=np.float32)
    gt_trans = np.asarray(batch["frames"])[..., 4:]

    def rmsd(pred):
        d2 = ((pred - gt_trans) ** 2).sum(-1)
        return np.sqrt((d2 * mask).sum(-1) / mask.sum(-1))

    params = import_torch_checkpoint(ckpt)
    dc = DiffusionConfig(noise_step_count=args.T)
    mb0 = prepare_batch(batch)
    noise = gen_noise(jax.random.key(args.seed + 1), mb0["frames"].shape, dc)
    mb0["frames"] = noise["frames"]
    mb0["torsions"] = noise["torsions"]
    key = jax.random.key(args.seed + 2)

    baseline = None
    failures = []
    for spec in args.configs.split(","):
        backend, prec_name = spec.split(":")
        prec = None if prec_name == "bf16" else lax.Precision.HIGHEST
        mc = ScoreNetworkConfig(noise_step_count=args.T, backend=backend)
        out = jax.jit(
            lambda p, b, k: sample(p, b, k, dc, mc, precision=prec)
        )(params, dict(mb0), key)
        r = rmsd(np.asarray(out["frames"].trans))
        row = {"backend": backend, "precision": prec_name,
               "rmsd_mean": round(float(r.mean()), 3),
               "rmsd_std": round(float(r.std()), 3)}
        if baseline is None:
            baseline = float(r.mean())
            row["role"] = "baseline"
        else:
            rel = abs(float(r.mean()) - baseline) / baseline
            row["rel_gap_vs_baseline"] = round(rel, 4)
            row["ok"] = bool(rel <= args.rtol)
            if not row["ok"]:
                failures.append(spec)
        print(json.dumps(row), flush=True)

    print(json.dumps({"verdict": "MATCH" if not failures else "MISMATCH",
                      "rtol": args.rtol, "failures": failures}))
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
