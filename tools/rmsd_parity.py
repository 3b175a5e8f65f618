#!/usr/bin/env python
"""Sampled-RMSD distribution parity: ours vs the torch reference.

BASELINE.md's fourth target: "sampled peptide backbone RMSD vs
``atom14_gt_positions`` within tolerance of reference". Per-sample RMSD
cannot be compared (the two frameworks' RNGs cannot be synchronized, and
per-coordinate chain parity is bounded by the reference's eigh quat-sign
convention — docs/parity.md), so this compares the DISTRIBUTION: both
implementations sample the same entries with the same shipped weights and
their own RNGs; report mean/std of backbone (frame-translation) RMSD vs
the stored ground-truth frames, plus the pure-noise baseline.

Runs everything on CPU (the reference's only mode) so the comparison is
apples-to-apples; one JSON line per implementation plus a verdict line.
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rmsd(pred, gt, mask):
    import numpy as np

    d2 = ((pred - gt) ** 2).sum(-1)
    return np.sqrt((d2 * mask).sum(-1) / mask.sum(-1))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-T", type=int, default=200)
    ap.add_argument("--entries", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--rtol", type=float, default=0.25,
                    help="relative tolerance on the mean sampled RMSD")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    from tests._reference import install

    install()
    from diffusion.model import Model as RefModel
    from diffusion.optimizer import DiffusionModelOptimizer

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

    mask = np.asarray(batch["mask"], dtype=np.float32)
    gt_trans = np.asarray(batch["frames"])[..., 4:]  # tensor-7 -> translations

    # ---- ours: one lax.scan sampler, jax RNG -------------------------------
    mb = prepare_batch(batch)
    dc = DiffusionConfig(noise_step_count=args.T)
    noise = gen_noise(jax.random.key(args.seed + 1), mb["frames"].shape, dc)
    noise_rmsd = float(rmsd(np.asarray(noise["frames"].trans), gt_trans, mask).mean())
    mb["frames"] = noise["frames"]
    mb["torsions"] = noise["torsions"]
    out = sample(
        import_torch_checkpoint(ckpt), mb, jax.random.key(args.seed + 2), dc,
        ScoreNetworkConfig(noise_step_count=args.T),
    )
    ours = rmsd(np.asarray(out["frames"].trans), gt_trans, mask)

    # ---- reference: torch loop, torch RNG ----------------------------------
    from openfold.utils.rigid_utils import Rigid

    torch.manual_seed(args.seed + 3)
    model = RefModel(16, 22, args.T)
    model.load_state_dict(torch.load(ckpt, map_location="cpu"))
    model.eval()
    dmo = DiffusionModelOptimizer(args.T, model, lr=0.0)
    # the reference's sample() converts frames/pocket_frames from
    # tensor-7 itself (optimizer.py:231-232), so pass raw tensors with the
    # peptide state replaced by pure noise (test.py:70-74)
    zt = {k: torch.tensor(np.asarray(v)) for k, v in batch.items() if k != "name"}
    rnd = DiffusionModelOptimizer.gen_noise(tuple(zt["mask"].shape), "cpu")
    zt["frames"] = rnd["frames"].to_tensor_7()
    zt["torsions"] = rnd["torsions"]
    with torch.no_grad():
        res = dmo.sample(zt)
    theirs = rmsd(res["frames"].get_trans().numpy(), gt_trans, mask)

    print(json.dumps({"impl": "pmhc_tpu", "rmsd_mean": round(float(ours.mean()), 3),
                      "rmsd_std": round(float(ours.std()), 3),
                      "pure_noise_rmsd": round(noise_rmsd, 3)}))
    print(json.dumps({"impl": "reference", "rmsd_mean": round(float(theirs.mean()), 3),
                      "rmsd_std": round(float(theirs.std()), 3)}))
    rel = abs(float(ours.mean()) - float(theirs.mean())) / float(theirs.mean())
    verdict = "MATCH" if rel <= args.rtol else "MISMATCH"
    print(json.dumps({"relative_mean_gap": round(rel, 3), "rtol": args.rtol,
                      "verdict": verdict}))
    if verdict != "MATCH":
        raise SystemExit(1)


if __name__ == "__main__":
    main()
