"""End-to-end smoke: train CLI then sample CLI on a tiny synthetic HDF5
(SURVEY.md §4 tier 3, the BASELINE.json "Smoke" config shape)."""

import os

import numpy as np
import pytest

from pmhc_tpu.data import write_synthetic_hdf5


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    write_synthetic_hdf5(
        str(d / "train.hdf5"), n_entries=6, peptide_lengths=(9, 10), seed=0
    )
    write_synthetic_hdf5(
        str(d / "test.hdf5"), n_entries=2, peptide_lengths=(9,), seed=1
    )
    return d


def test_train_cli_smoke(data_dir):
    from pmhc_tpu.cli.train_cli import main

    model_path = str(data_dir / "model.pth")
    main([
        str(data_dir / "train.hdf5"), "2", model_path,
        "-T", "8", "--batch-size", "3", "--num-workers", "2",
    ])
    assert os.path.isfile(model_path)
    csv_path = model_path.replace(".pth", ".csv")
    assert os.path.isfile(csv_path)
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0].startswith("epoch,")  # reference CSV schema
    assert len(lines) == 3  # header + 2 epochs

    # auto-resume path: running again must load the existing .pth
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "3",
    ])
    assert len(open(csv_path).read().strip().splitlines()) == 4


def test_train_cli_steps_per_dispatch(data_dir, tmp_path):
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_k.pth")
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "2", "--steps-per-dispatch", "2",
    ])
    assert os.path.isfile(model_path)


def test_train_cli_dp_mesh(data_dir, tmp_path):
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_dp.pth")
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "6", "--mesh-data", "2",
    ])
    assert os.path.isfile(model_path)


def test_train_cli_tp_mesh(data_dir, tmp_path):
    # DP x TP: batch sharded 2-way, every MLP hidden dim sharded 4-way
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_tp.pth")
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "6", "--mesh-data", "2", "--mesh-model", "4",
    ])
    assert os.path.isfile(model_path)


def test_sample_cli_smoke(data_dir):
    from pmhc_tpu.cli.sample_cli import main

    model_path = str(data_dir / "model.pth")
    assert os.path.isfile(model_path), "train smoke must run first"
    out_dir = str(data_dir / "sampled")
    main([
        model_path, str(data_dir / "test.hdf5"),
        "-T", "8", "--batch-size", "2", "--output-dir", out_dir,
    ])
    pdbs = sorted(os.listdir(out_dir))
    assert pdbs == ["SYN0000.pdb", "SYN0001.pdb"]

    text = open(os.path.join(out_dir, pdbs[0])).read()
    atom_lines = [l for l in text.splitlines() if l.startswith("ATOM")]
    assert len(atom_lines) > 50
    chains = {l[21] for l in atom_lines}
    assert chains == {"P", "M"}
    # peptide chain must contain backbone + terminal oxygens
    p_names = [l[12:16].strip() for l in atom_lines if l[21] == "P"]
    for required in ("N", "CA", "C", "O", "OXT"):
        assert required in p_names
    # coordinates parse and are finite
    coords = np.array(
        [[float(l[30:38]), float(l[38:46]), float(l[46:54])] for l in atom_lines]
    )
    assert np.isfinite(coords).all()


def test_sample_cli_multibatch_pipeline(data_dir, tmp_path):
    """batch-size 1 over 2 entries -> 2 batches: exercises the
    write/sample pipeline (previous batch's PDBs written while the
    next batch samples; final batch flushed after the loop)."""
    from pmhc_tpu.cli.sample_cli import main

    model_path = str(data_dir / "model.pth")
    assert os.path.isfile(model_path), "train smoke must run first"
    out_dir = str(tmp_path / "sampled_pipe")
    main([
        model_path, str(data_dir / "test.hdf5"),
        "-T", "4", "--batch-size", "1", "--output-dir", out_dir,
    ])
    pdbs = sorted(os.listdir(out_dir))
    assert pdbs == ["SYN0000.pdb", "SYN0001.pdb"]
    for p in pdbs:
        atom_lines = [
            l for l in open(os.path.join(out_dir, p)).read().splitlines()
            if l.startswith("ATOM")
        ]
        coords = np.array(
            [[float(l[30:38]), float(l[38:46]), float(l[46:54])]
             for l in atom_lines]
        )
        assert len(atom_lines) > 50 and np.isfinite(coords).all()


def test_sample_cli_num_samples(data_dir, tmp_path):
    """--num-samples N writes N distinct conformations per entry as
    <name>.1.pdb ... <name>.N.pdb."""
    from pmhc_tpu.cli.sample_cli import main

    model_path = str(data_dir / "model.pth")
    assert os.path.isfile(model_path), "train smoke must run first"
    out_dir = str(tmp_path / "sampled_multi")
    main([
        model_path, str(data_dir / "test.hdf5"),
        "-T", "4", "--batch-size", "2", "--num-samples", "2",
        "--output-dir", out_dir,
    ])
    pdbs = sorted(os.listdir(out_dir))
    assert pdbs == ["SYN0000.1.pdb", "SYN0000.2.pdb",
                    "SYN0001.1.pdb", "SYN0001.2.pdb"]

    def coords(p):
        lines = [l for l in open(os.path.join(out_dir, p)).read().splitlines()
                 if l.startswith("ATOM")]
        return np.array([[float(l[30:38]), float(l[38:46]), float(l[46:54])]
                         for l in lines])

    c1, c2 = coords(pdbs[0]), coords(pdbs[1])
    assert np.isfinite(c1).all() and np.isfinite(c2).all()
    # independent noise -> distinct conformations of the same entry
    assert not np.allclose(c1, c2)


def test_sample_cli_strided_steps(data_dir, tmp_path):
    """--sample-steps K < T: the strided few-step sampler writes valid,
    finite PDBs end-to-end."""
    from pmhc_tpu.cli.sample_cli import main

    model_path = str(data_dir / "model.pth")
    assert os.path.isfile(model_path), "train smoke must run first"
    out_dir = str(tmp_path / "sampled_strided")
    main([
        model_path, str(data_dir / "test.hdf5"),
        "-T", "16", "--sample-steps", "4", "--batch-size", "2",
        "--output-dir", out_dir,
    ])
    pdbs = sorted(os.listdir(out_dir))
    assert pdbs == ["SYN0000.pdb", "SYN0001.pdb"]
    for p in pdbs:
        atom_lines = [
            l for l in open(os.path.join(out_dir, p)).read().splitlines()
            if l.startswith("ATOM")
        ]
        coords = np.array(
            [[float(l[30:38]), float(l[38:46]), float(l[46:54])]
             for l in atom_lines]
        )
        assert len(atom_lines) > 50 and np.isfinite(coords).all()


def test_train_cli_bf16(data_dir, tmp_path):
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_bf16.pth")
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "3", "--bf16",
    ])
    assert os.path.isfile(model_path)


@pytest.mark.parametrize("backend", ["blockwise", "pallas", "g8"])
def test_train_cli_backend(data_dir, tmp_path, backend):
    # alternative EGNN layer implementations train end-to-end; on CPU the
    # pallas backends auto-fall-back to the pallas interpreter
    # (pmhc_tpu/models/score.py) and train through their custom VJPs
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / f"model_{backend}.pth")
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "2", "--backend", backend,
    ])
    assert os.path.isfile(model_path)


def test_train_cli_fast_f32(data_dir, tmp_path):
    # --fast-f32: XLA-stage matmuls at lax.Precision.HIGH
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_ff32.pth")
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "2", "--fast-f32",
    ])
    assert os.path.isfile(model_path)


def test_sample_cli_bf16(data_dir, tmp_path):
    from pmhc_tpu.cli.sample_cli import main

    model_path = str(data_dir / "model.pth")
    out_dir = str(tmp_path / "sampled_bf16")
    main([
        model_path, str(data_dir / "test.hdf5"),
        "-T", "8", "--batch-size", "2", "--bf16", "--output-dir", out_dir,
    ])
    pdbs = sorted(os.listdir(out_dir))
    assert pdbs == ["SYN0000.pdb", "SYN0001.pdb"]
    coords = np.array([
        [float(l[30:38]), float(l[38:46]), float(l[46:54])]
        for l in open(os.path.join(out_dir, pdbs[0]))
        if l.startswith("ATOM")
    ])
    assert np.isfinite(coords).all()


def test_sample_cli_pads_short_batch(data_dir, tmp_path):
    # 2 entries sampled with batch size 4: the CLI pads to a single full
    # batch (one compile) and writes only the real entries
    from pmhc_tpu.cli.sample_cli import main

    model_path = str(data_dir / "model.pth")
    out_dir = str(tmp_path / "sampled_pad")
    main([
        model_path, str(data_dir / "test.hdf5"),
        "-T", "8", "--batch-size", "4", "--output-dir", out_dir,
    ])
    assert sorted(os.listdir(out_dir)) == ["SYN0000.pdb", "SYN0001.pdb"]


def test_train_cli_cp_mesh(data_dir, tmp_path):
    # DP(2) x CP(4): batch sharded 2-way, EGNN neighbour axis sharded
    # 4-way through the manual shard_map trainer path
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_cp.pth")
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "6", "--mesh-data", "2",
        "--mesh-context", "4",
    ])
    assert os.path.isfile(model_path)


def test_sample_cli_cp_mesh(data_dir, tmp_path):
    # context-parallel sampling: the whole reverse-diffusion scan inside
    # shard_map with the neighbour axis sharded over 4 devices
    from pmhc_tpu.cli.sample_cli import main

    model_path = str(data_dir / "model.pth")
    out_dir = str(tmp_path / "sampled_cp")
    main([
        model_path, str(data_dir / "test.hdf5"),
        "-T", "8", "--batch-size", "2", "--mesh-context", "4",
        "--output-dir", out_dir,
    ])
    pdbs = sorted(os.listdir(out_dir))
    assert pdbs == ["SYN0000.pdb", "SYN0001.pdb"]
    coords = np.array([
        [float(l[30:38]), float(l[38:46]), float(l[46:54])]
        for l in open(os.path.join(out_dir, pdbs[0]))
        if l.startswith("ATOM")
    ])
    assert np.isfinite(coords).all()


def test_sample_cli_maxlen_peptide(data_dir, tmp_path):
    """A peptide of exactly maxlen=16 samples and writes a valid PDB.

    The REFERENCE writer has a latent IndexError here (pdb.py:145 reads
    mask[b, r+1] before the bounds check — SURVEY.md 3.5.8); ours fixes
    it deliberately, so the full-length case needs explicit coverage."""
    from pmhc_tpu.cli.sample_cli import main
    from pmhc_tpu.data import write_synthetic_hdf5

    model_path = str(data_dir / "model.pth")
    assert os.path.isfile(model_path), "train smoke must run first"
    h5 = str(tmp_path / "full.hdf5")
    write_synthetic_hdf5(h5, n_entries=2, peptide_lengths=(16,), seed=6)
    out_dir = str(tmp_path / "sampled16")
    main([
        model_path, h5,
        "-T", "4", "--batch-size", "2", "--output-dir", out_dir,
    ])
    pdb = os.path.join(out_dir, sorted(os.listdir(out_dir))[0])
    atom_lines = [l for l in open(pdb).read().splitlines()
                  if l.startswith("ATOM")]
    p_res = {int(l[22:26]) for l in atom_lines if l[21] == "P"}
    assert max(p_res) == 16  # all 16 residues present
    p_names = [l[12:16].strip() for l in atom_lines if l[21] == "P"]
    assert "OXT" in p_names  # terminal oxygen placed on residue 16
    coords = np.array(
        [[float(l[30:38]), float(l[38:46]), float(l[46:54])]
         for l in atom_lines]
    )
    assert np.isfinite(coords).all()


def test_train_cli_dp_tp_cp_mesh(data_dir, tmp_path):
    # DP(2) x TP(2) x CP(2): one GSPMD jit — xla backend with
    # neighbour-axis sharding constraints + Megatron TP layout
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_3ax.pth")
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "4", "--mesh-data", "2",
        "--mesh-model", "2", "--mesh-context", "2",
    ])
    assert os.path.isfile(model_path)


def test_train_cli_restart_on_nan(data_dir, tmp_path, caplog):
    """Elastic NaN recovery (--restart-on-nan): an absurd lr drives the
    params to NaN within an epoch; the default (reference) behavior is
    the hard abort, while a recovery budget restores the last .pth,
    re-folds the RNG key, and finishes the run."""
    import logging

    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_nan.pth")
    # seed a valid checkpoint to restart from
    main([
        str(data_dir / "train.hdf5"), "1", model_path,
        "-T", "8", "--batch-size", "3",
    ])
    # reference behavior: abort (optimizer.py:217-218)
    with pytest.raises(RuntimeError, match="NaN loss"):
        main([
            str(data_dir / "train.hdf5"), "1", model_path,
            "-T", "8", "--batch-size", "3", "--lr", "1e18",
        ])
    # recovery budget: the same blowup restores + continues to completion
    with caplog.at_level(logging.WARNING):
        main([
            str(data_dir / "train.hdf5"), "2", model_path,
            "-T", "8", "--batch-size", "3", "--lr", "1e18",
            "--restart-on-nan", "4",
        ])
    assert any("re-folded RNG" in r.message for r in caplog.records)
    assert os.path.isfile(model_path)


def test_train_cli_ema(data_dir, tmp_path):
    """--ema-decay exports the averaged weights as <model>.ema.pth
    alongside every checkpoint; the sampling CLI consumes that file."""
    import torch

    from pmhc_tpu.cli.sample_cli import main as sample_main
    from pmhc_tpu.cli.train_cli import main as train_main

    model_path = str(tmp_path / "model_ema.pth")
    train_main([
        str(data_dir / "train.hdf5"), "2", model_path,
        "-T", "8", "--batch-size", "3", "--ema-decay", "0.9",
    ])
    ema_path = model_path.replace(".pth", ".ema.pth")
    assert os.path.isfile(ema_path)
    raw = torch.load(model_path, map_location="cpu")
    ema = torch.load(ema_path, map_location="cpu")
    assert set(raw) == set(ema)
    assert max(float((raw[k] - ema[k]).abs().max()) for k in raw) > 1e-6

    sample_main([
        ema_path, str(data_dir / "test.hdf5"), "-T", "4", "--batch-size", "2",
    ])
    out_dir = str(data_dir / "test-sampled")
    assert any(f.endswith(".pdb") for f in os.listdir(out_dir))


def test_train_cli_val_and_grad_accum(data_dir, tmp_path):
    """--val-hdf5 writes a per-epoch held-out CSV (same schema as the
    train CSV, deterministic across epochs at fixed params) and
    --grad-accum trains through optax.MultiSteps end-to-end."""
    from pmhc_tpu.cli.train_cli import main

    model_path = str(tmp_path / "model_val.pth")
    main([
        str(data_dir / "train.hdf5"), "2", model_path,
        "-T", "8", "--batch-size", "3", "--num-workers", "2",
        "--val-hdf5", str(data_dir / "test.hdf5"),
        "--grad-accum", "2", "--lr", "0.0",  # lr 0: params frozen
    ])
    val_csv = model_path.replace(".pth", ".val.csv")
    assert os.path.isfile(val_csv)
    lines = open(val_csv).read().strip().splitlines()
    assert lines[0].startswith("epoch,total loss,")
    assert len(lines) == 3  # header + 2 epochs
    # frozen params + fixed per-batch-index eval keys -> identical rows
    assert lines[1].split(",")[1:] == lines[2].split(",")[1:]

    # and with a real lr the val rows move
    model2 = str(tmp_path / "model_val2.pth")
    main([
        str(data_dir / "train.hdf5"), "2", model2,
        "-T", "8", "--batch-size", "3",
        "--val-hdf5", str(data_dir / "test.hdf5"),
        "--ema-decay", "0.99",
    ])
    lines = open(model2.replace(".pth", ".val.csv")).read().strip().splitlines()
    assert lines[1].split(",")[1:] != lines[2].split(",")[1:]
    assert os.path.isfile(model2.replace(".pth", ".val.ema.csv"))
