#!/usr/bin/env python
"""Numerical parity report: pmhc_tpu vs the mounted PyTorch reference.

Runs identical inputs (and identical injected noise, bypassing both RNGs)
through both implementations and prints a JSON report of max absolute
differences per subsystem — the consolidated, runnable form of the golden
test suite (SURVEY.md §7 step 9 "loss-curve and RMSD parity reports").

Usage: python tools/parity_report.py  (CPU; needs /root/reference mounted)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from tests._reference import install

    install()

    import jax.numpy as jnp
    from diffusion.data import MhcpDataset
    from diffusion.optimizer import DiffusionModelOptimizer
    from openfold.utils.rigid_utils import Rigid, Rotation

    from pmhc_tpu.data import PmhcDataset, write_synthetic_hdf5
    from pmhc_tpu.diffusion import (
        DiffusionConfig,
        ScheduleTables,
        add_noise,
        diffusion_loss,
    )
    from pmhc_tpu.geometry import RigidArray, quat_to_rot

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    from tests.golden.test_model_vs_reference import make_batch, run_ours, run_reference

    report = {}
    rng = np.random.default_rng(0)

    # ---- model forward with shipped weights ------------------------------
    data = make_batch()
    for t in (0, 500, 1000):
        ref = run_reference(data, t)
        ours = run_ours(data, t)
        report[f"model_forward_t{t}"] = {
            "trans_max_diff": float(np.abs(ours["trans"] - ref["trans"]).max()),
            "torsions_max_diff": float(
                np.abs(ours["torsions"] - ref["torsions"]).max()
            ),
            "rot_matrix_max_diff": float(
                np.abs(
                    np.asarray(quat_to_rot(jnp.asarray(ours["quats"])))
                    - np.asarray(quat_to_rot(jnp.asarray(ref["quats"])))
                ).max()
            ),
        }

    # ---- diffusion processes with injected noise --------------------------
    cfg = DiffusionConfig()
    tables = ScheduleTables(cfg)
    dmo = DiffusionModelOptimizer(1000, torch.nn.Linear(1, 1), lr=0.0)

    def rand_state(shape=(4, 16)):
        q = rng.normal(size=shape + (4,)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        a = rng.uniform(-np.pi, np.pi, size=shape + (7,)).astype(np.float32)
        return {
            "quats": q,
            "trans": rng.normal(size=shape + (3,)).astype(np.float32) * 5,
            "torsions": np.stack((np.sin(a), np.cos(a)), axis=-1),
        }

    def to_ref(s):
        return {
            "frames": Rigid(
                Rotation(quats=torch.tensor(s["quats"]), normalize_quats=False),
                torch.tensor(s["trans"]),
            ),
            "torsions": torch.tensor(s["torsions"]),
        }

    def to_ours(s):
        return {
            "frames": RigidArray(jnp.asarray(s["quats"]), jnp.asarray(s["trans"])),
            "torsions": jnp.asarray(s["torsions"]),
        }

    signal, noise = rand_state(), rand_state()
    for t in (1, 500, 999):
        o = add_noise(to_ours(signal), to_ours(noise), t, tables)
        r = dmo.add_noise(to_ref(signal), to_ref(noise), t)
        report[f"add_noise_t{t}"] = {
            "trans_max_diff": float(
                np.abs(np.asarray(o["frames"].trans) - r["frames"].get_trans().numpy()).max()
            ),
            "rot_matrix_max_diff": float(
                np.abs(
                    np.asarray(quat_to_rot(o["frames"].quats))
                    - r["frames"].get_rots().get_rot_mats().numpy()
                ).max()
            ),
            "torsions_max_diff": float(
                np.abs(np.asarray(o["torsions"]) - r["torsions"].numpy()).max()
            ),
        }

    # loss parity
    true_s, pred_s = rand_state(), rand_state()
    mask = np.zeros((4, 16), dtype=bool)
    for b, L in enumerate((9, 10, 11, 16)):
        mask[b, :L] = True
    tmask = rng.uniform(size=(4, 16, 7)) > 0.5
    tmask[..., 0] = True
    ours_l = diffusion_loss(
        to_ours(true_s), to_ours(pred_s), jnp.asarray(mask), jnp.asarray(tmask)
    )
    ref_l = DiffusionModelOptimizer.get_loss(
        to_ref(true_s), to_ref(pred_s), torch.tensor(mask), torch.tensor(tmask)
    )
    report["loss"] = {
        k: float(np.abs(np.asarray(ours_l[k]) - ref_l[k].numpy()).max())
        for k in ours_l
    }

    # ---- dataset parity on a synthetic file -------------------------------
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "synth.hdf5")
        write_synthetic_hdf5(path, n_entries=3, peptide_lengths=(9, 11, 16), seed=5)
        ours_ds, ref_ds = PmhcDataset(path), MhcpDataset(path)
        worst = 0.0
        for i in range(3):
            a, b = ours_ds[i], ref_ds[i]
            for k in ("mask", "features", "torsions", "torsions_mask", "pocket_mask"):
                worst = max(
                    worst,
                    float(
                        np.abs(
                            np.asarray(a[k], np.float64) - b[k].numpy().astype(np.float64)
                        ).max()
                    ),
                )
        report["dataset_max_field_diff"] = worst

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
