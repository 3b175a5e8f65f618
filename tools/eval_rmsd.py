#!/usr/bin/env python
"""Sampling quality evaluation: backbone RMSD of sampled peptides vs the
dataset's ground-truth frames (BASELINE.md: "Sampled peptide backbone RMSD
vs atom14_gt_positions").

Runs the full reverse diffusion on every entry of a SwiftMHC HDF5 file and
reports per-entry and mean RMSD between sampled and ground-truth backbone
translations (the reference's ``tools/frame.py`` RMSD, masked to real
residues), plus the same metric for PURE NOISE as the no-skill baseline.

Usage: python tools/eval_rmsd.py model.pth test.hdf5 [-T 1000] [-b 16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model")
    ap.add_argument("hdf5")
    ap.add_argument("-T", type=int, default=1000)
    ap.add_argument("--batch-size", "-b", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sample-steps", type=int, default=None,
                    help="strided few-step sampling (default: full T)")
    ap.add_argument("--backend", default="xla",
                    choices=("xla", "pallas_lane", "g8"))
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from pmhc_tpu.data import PmhcDataset, PrefetchLoader
    from pmhc_tpu.diffusion import DiffusionConfig, ScheduleTables, gen_noise, sample
    from pmhc_tpu.models import ScoreNetworkConfig, import_torch_checkpoint
    from pmhc_tpu.train.trainer import prepare_batch

    mc = ScoreNetworkConfig(
        noise_step_count=args.T,
        backend="pallas_lane" if args.backend == "g8" else args.backend,
    )
    dc = DiffusionConfig(noise_step_count=args.T)
    tables = ScheduleTables(dc)
    params = import_torch_checkpoint(args.model)

    dataset = PmhcDataset(args.hdf5)
    loader = PrefetchLoader(dataset, batch_size=args.batch_size)

    from pmhc_tpu.models.nn import DEFAULT_PRECISION

    prec = None if args.bf16 else DEFAULT_PRECISION
    if args.backend in ("pallas_lane", "g8"):
        from pmhc_tpu.diffusion.sampler_lane import sample_lane

        run = jax.jit(lambda b, k: sample_lane(
            params, b, k, dc, mc, tables, precision=prec,
            g8=args.backend == "g8", num_steps=args.sample_steps))
    else:
        run = jax.jit(lambda b, k: sample(
            params, b, k, dc, mc, tables, precision=prec,
            num_steps=args.sample_steps))

    def masked_rmsd(pred_trans, true_trans, mask):
        sq = np.sum((pred_trans - true_trans) ** 2, axis=-1) * mask
        return np.sqrt(sq.sum(axis=-1) / mask.sum(axis=-1))

    key = jax.random.key(args.seed)
    names, rmsds, noise_rmsds = [], [], []
    for batch in loader:
        batch_names = batch.pop("name")
        model_batch = prepare_batch(batch)
        true_trans = np.asarray(model_batch["frames"].trans)
        mask = np.asarray(model_batch["mask"], dtype=np.float64)

        key, nk, sk = jax.random.split(key, 3)
        noise = gen_noise(nk, model_batch["frames"].shape, dc)
        model_batch["frames"] = noise["frames"]
        model_batch["torsions"] = noise["torsions"]

        out = run(model_batch, sk)
        pred_trans = np.asarray(out["frames"].trans)

        names.extend(batch_names)
        rmsds.extend(masked_rmsd(pred_trans, true_trans, mask).tolist())
        noise_rmsds.extend(
            masked_rmsd(np.asarray(noise["frames"].trans), true_trans, mask).tolist()
        )

    report = {
        "entries": len(names),
        "T": args.T,
        "sample_steps": args.sample_steps or args.T,
        "backend": args.backend + (" bf16" if args.bf16 else " f32"),
        "mean_backbone_rmsd": round(float(np.mean(rmsds)), 3),
        "mean_pure_noise_rmsd": round(float(np.mean(noise_rmsds)), 3),
        "per_entry": {n: round(r, 3) for n, r in zip(names, rmsds)},
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
