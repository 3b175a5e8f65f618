#!/usr/bin/env python
"""Long-horizon torch-REFERENCE training run on the realistic dataset.

Companion to tools/quality_long.py (VERDICT r2 #7): runs the actual
reference training loop (``/root/reference/optimize.py:67-82`` epoch
structure, ``diffusion/optimizer.py:195-224`` step) on the SAME
realistic HDF5 the pmhc_tpu arms train on, recording the per-100-step
mean loss curve, any loss spikes, and — critically — whether the
reference's own NaN-loss abort (``optimizer.py:217-218``) fires. The
pmhc_tpu f32 quality study found one arm diverging to NaN near step
2800 while another seed/backend trained cleanly; this run establishes
whether such blowups are inherent to the reference's training dynamics
(plain Adam lr=1e-3, no gradient clipping, loss spikes >100x) or a
framework regression.

CPU-only and slow (~0.3-0.5 steps/s): run in the background.

Usage:
    nohup python tools/ref_long_train.py --steps 3000 \
        --out /tmp/ref_long.json > /tmp/ref_long.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch-size", "-b", type=int, default=64)
    ap.add_argument("--train-entries", type=int, default=2048)
    ap.add_argument("-T", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-dir", default="/tmp/quality_long_data")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import torch

    torch.manual_seed(args.seed)

    from tests._reference import install

    install()

    from diffusion.data import MhcpDataset
    from diffusion.model import Model
    from diffusion.optimizer import DiffusionModelOptimizer
    from diffusion.tools.metrics import MetricsRecord

    from pmhc_tpu.data import write_realistic_hdf5

    train_h5 = os.path.join(args.data_dir, f"train_{args.train_entries}.hdf5")
    os.makedirs(args.data_dir, exist_ok=True)
    if not os.path.exists(train_h5):
        write_realistic_hdf5(train_h5, n_entries=args.train_entries,
                             seed=args.seed)

    device = torch.device("cpu")
    model = Model(16, 22, args.T).to(device)
    dm = DiffusionModelOptimizer(args.T, model, lr=args.lr)
    dataset = MhcpDataset(train_h5, device)
    loader = torch.utils.data.DataLoader(
        dataset, batch_size=args.batch_size, shuffle=True, num_workers=0)

    curve, spikes = [], []
    acc, nacc = 0.0, 0
    nan_step = None
    step = 0
    t0 = time.perf_counter()
    try:
        while step < args.steps:
            for batch in loader:
                metrics = MetricsRecord()
                # reference step: optimizer.py:195-224 (raises on NaN loss)
                dm.optimize(batch, metrics)
                loss = metrics.mean()["total loss"]
                acc += loss
                nacc += 1
                if loss > 25.0:
                    spikes.append({"step": step, "loss": round(loss, 3)})
                if nacc == 100:
                    curve.append(round(acc / nacc, 5))
                    acc, nacc = 0.0, 0
                    el = time.perf_counter() - t0
                    print(json.dumps({
                        "step": step + 1, "mean100": curve[-1],
                        "steps_per_sec": round((step + 1) / el, 3)}),
                        flush=True)
                step += 1
                if step >= args.steps:
                    break
    except RuntimeError as e:
        # the reference's NaN abort (optimizer.py:217-218)
        nan_step = step
        print(json.dumps({"nan_abort_step": step, "error": str(e)}),
              flush=True)

    out = {
        "steps_run": step,
        "steps_per_sec": round(step / (time.perf_counter() - t0), 3),
        "loss_curve_per100": curve,
        "spikes_gt25": spikes,
        "nan_abort_step": nan_step,
    }
    doc = json.dumps(out, indent=1)
    print(doc)
    if args.out:
        with open(args.out, "w") as f:
            f.write(doc)


if __name__ == "__main__":
    main()
