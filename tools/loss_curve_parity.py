#!/usr/bin/env python
"""Loss-curve parity: train pmhc_tpu and the torch reference side by side
with IDENTICAL data, timesteps, and injected noise; compare the per-step
loss curves (BASELINE.md: "matching denoising-loss curves ... on identical
HDF5 inputs and fixed noise seeds").

Both sides start from the SAME initial weights (the shipped model.pth),
use Adam(lr) with default betas/eps, draw the same t_k per step (the
reference's one-t-per-batch quirk), and consume the same epsilon_k noise
tensors (generated once in numpy, injected into both RNG sites). Remaining
divergence is float32 accumulation through two different-but-equivalent
compute graphs.

Usage: python tools/loss_curve_parity.py [--steps 30] [--batch-size 8]
Prints a JSON report and exits nonzero if curves diverge beyond tolerance.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHECKPOINT = "/root/reference/model.pth"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("-T", type=int, default=1000)
    # Irreducible deviation source: the reference derives z_t quaternions by
    # eigendecomposition with implementation-defined SIGNS; this framework is
    # quat-native with algebraically determined signs. The rotation loss is
    # sign-sensitive through the network, so curves track but do not match
    # bitwise even at step 0 with identical weights (measured: ~1% mean,
    # ~3% max over 30 steps). See docs/parity.md "Deliberate deviations".
    ap.add_argument("--rtol", type=float, default=0.05)
    ap.add_argument("--window", type=int, default=0,
                    help="compare WINDOWED-MEAN curves with this window "
                         "(long-horizon mode: per-step deviation compounds "
                         "chaotically through Adam, so convergence parity "
                         "is about trajectory statistics, not per-step "
                         "bit-tracking; 0 = per-step max, the short-horizon "
                         "default)")
    ap.add_argument("--csv", default=None,
                    help="write the two loss curves to this CSV")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import random as pyrandom

    import torch

    from tests._reference import install

    install()

    import jax.numpy as jnp
    import optax
    from diffusion.model import Model as RefModel
    from diffusion.optimizer import DiffusionModelOptimizer
    from diffusion.tools.metrics import MetricsRecord as RefMetrics
    from openfold.utils.rigid_utils import Rigid, Rotation

    from pmhc_tpu.data import synthetic_batch
    from pmhc_tpu.diffusion import DiffusionConfig, ScheduleTables, add_noise, diffusion_loss
    from pmhc_tpu.geometry import RigidArray
    from pmhc_tpu.models import ScoreNetworkConfig, import_torch_checkpoint, score_network_forward
    from pmhc_tpu.train.trainer import prepare_batch

    rng = np.random.default_rng(0)
    B = args.batch_size
    raw = synthetic_batch(batch_size=B, seed=1, as_jax=False)

    # shared injected sequences
    ts = rng.integers(0, args.T, size=args.steps)

    def draw_noise():
        q = rng.uniform(size=(B, 16, 3)).astype(np.float32)  # shoemake triples
        return {
            "trans": (rng.standard_normal((B, 16, 3)) * 5.0).astype(np.float32),
            "shoemake": q,
            "angles": (rng.uniform(size=(B, 16, 7)) * 2 * np.pi).astype(np.float32),
        }

    noises = [draw_noise() for _ in range(args.steps)]

    # ---- torch reference ---------------------------------------------------
    model = RefModel(16, 22, args.T)
    model.load_state_dict(torch.load(CHECKPOINT, map_location="cpu"))
    dmo = DiffusionModelOptimizer(args.T, model, lr=args.lr)

    from diffusion.tools import angle as ref_angle

    def make_ref_noise(n):
        quats = ref_angle.shoemake_quat(torch.tensor(n["shoemake"]))
        torsions = ref_angle.angle_to_sin_cos(torch.tensor(n["angles"]))
        return {
            "frames": Rigid(Rotation(quats=quats, normalize_quats=False),
                            torch.tensor(n["trans"])),
            "torsions": torsions,
        }

    step_iter = iter(range(args.steps))
    ref_losses = []

    noise_iter = iter(noises)
    t_iter = iter(ts)
    dmo_gen_noise = DiffusionModelOptimizer.gen_noise
    DiffusionModelOptimizer.gen_noise = staticmethod(
        lambda shape, device: make_ref_noise(next(noise_iter))
    )
    pyrandom_randint = pyrandom.randint
    pyrandom.randint = lambda a, b: int(next(t_iter))
    try:
        for k in range(args.steps):
            batch = {
                key: torch.tensor(np.asarray(raw[key]))
                for key in ("frames", "torsions", "features", "mask", "torsions_mask",
                            "pocket_frames", "pocket_mask", "pocket_features")
            }
            metrics = RefMetrics()
            dmo.optimize(batch, metrics)
            ref_losses.append(metrics.mean()["total loss"])
    finally:
        DiffusionModelOptimizer.gen_noise = dmo_gen_noise
        pyrandom.randint = pyrandom_randint

    # ---- pmhc_tpu ------------------------------------------------------------
    from pmhc_tpu.geometry import angle_to_sin_cos, shoemake_quat

    mc = ScoreNetworkConfig(noise_step_count=args.T)
    dc = DiffusionConfig(noise_step_count=args.T)
    tables = ScheduleTables(dc)
    params = import_torch_checkpoint(CHECKPOINT)
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)
    model_batch = prepare_batch({k: jnp.asarray(np.asarray(v)) for k, v in raw.items()})

    @jax.jit
    def train_step(params, opt_state, epsilon, t):
        def loss_fn(p):
            zt = add_noise(model_batch, epsilon, t, tables)
            pred = score_network_forward(p, zt, t, mc)
            L = diffusion_loss(epsilon, pred, model_batch["mask"],
                               model_batch["torsions_mask"])
            return jnp.mean(L["total loss"]), L

        (loss, L), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    our_losses = []
    for k in range(args.steps):
        n = noises[k]
        epsilon = {
            "frames": RigidArray(
                shoemake_quat(jnp.asarray(n["shoemake"])), jnp.asarray(n["trans"])
            ),
            "torsions": angle_to_sin_cos(jnp.asarray(n["angles"])),
        }
        params, opt_state, loss = train_step(params, opt_state, epsilon, int(ts[k]))
        our_losses.append(float(loss))

    ref_losses = np.asarray(ref_losses)
    our_losses = np.asarray(our_losses)
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("step,reference,pmhc_tpu\n")
            for k in range(args.steps):
                f.write(f"{k},{ref_losses[k]:.6f},{our_losses[k]:.6f}\n")
    rel = np.abs(ref_losses - our_losses) / np.maximum(np.abs(ref_losses), 1e-6)
    report = {
        "steps": args.steps,
        "reference_first_last": [float(ref_losses[0]), float(ref_losses[-1])],
        "pmhc_tpu_first_last": [float(our_losses[0]), float(our_losses[-1])],
        "max_rel_deviation": float(rel.max()),
        "mean_rel_deviation": float(rel.mean()),
        "tolerance": args.rtol,
    }
    if args.window:
        w = args.window
        k = args.steps // w
        ref_w = ref_losses[: k * w].reshape(k, w).mean(1)
        our_w = our_losses[: k * w].reshape(k, w).mean(1)
        rel_w = np.abs(ref_w - our_w) / np.maximum(np.abs(ref_w), 1e-6)
        report.update({
            "window": w,
            "windowed_rel_deviation_max": float(rel_w.max()),
            "windowed_rel_deviation_final": float(rel_w[-1]),
            "reference_windowed_first_last": [float(ref_w[0]), float(ref_w[-1])],
            "pmhc_tpu_windowed_first_last": [float(our_w[0]), float(our_w[-1])],
        })
        report["pass"] = bool(rel_w.max() < args.rtol)
    else:
        report["pass"] = bool(rel.max() < args.rtol)
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["pass"] else 1)


if __name__ == "__main__":
    main()
