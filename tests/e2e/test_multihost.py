"""Multi-HOST (multi-process) execution, for real.

The reference has no distributed code at all (SURVEY.md §2.3); this is the
framework's own first-class subsystem, and everything else in the suite
exercises it only as a single-process virtual mesh. Here we launch 2 (and
4) SEPARATE processes with ``jax.distributed.initialize`` (coordinator on
localhost), each owning one CPU device, run the real entry points —
``initialize_multihost`` + ``loader_shard_args`` per-host entry sharding +
``make_array_from_process_local_data`` + a jitted GSPMD grad/Adam step —
and assert the global loss/gradients/updated params equal a
single-process computation on the identical global batch.

Each child pays ~10 s importing jax (sitecustomize), so this module is one
of the slowest in the suite; it covers the only SURVEY §2.3/§5 row that
round 2 left unexecuted.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
WORKER = os.path.join(REPO, "tests", "e2e", "_multihost_worker.py")
GLOBAL_B = 8  # must match the worker


@pytest.fixture(scope="module")
def train_h5(tmp_path_factory):
    from pmhc_tpu.data import write_synthetic_hdf5

    d = tmp_path_factory.mktemp("mh")
    path = str(d / "train.hdf5")
    write_synthetic_hdf5(path, n_entries=16, peptide_lengths=(9, 10), seed=0)
    return path


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_reference(h5_path: str, nproc: int):
    """The same step computed in ONE process: global batch assembled in
    host order (host k's loader shard occupies rows k*b:(k+1)*b, exactly
    the per-device layout of make_array_from_process_local_data)."""
    import optax

    from pmhc_tpu.data import PmhcDataset, PrefetchLoader
    from pmhc_tpu.diffusion import (
        DiffusionConfig, ScheduleTables, add_noise, diffusion_loss, gen_noise,
    )
    from pmhc_tpu.models import (
        ScoreNetworkConfig, init_score_network, score_network_forward,
    )
    from pmhc_tpu.train.trainer import prepare_batch

    dataset = PmhcDataset(h5_path)
    locals_ = []
    for k in range(nproc):
        loader = PrefetchLoader(
            dataset, batch_size=GLOBAL_B // nproc, shuffle=True, seed=0,
            num_workers=2, device_put=False,
            process_index=k, process_count=nproc,
        )
        part = next(iter(loader))
        part.pop("name", None)
        locals_.append(part)
    batch = {
        k: np.concatenate([p[k] for p in locals_]) for k in locals_[0]
    }

    model_config = ScoreNetworkConfig()
    diffusion_config = DiffusionConfig(noise_step_count=10)
    tables = ScheduleTables(diffusion_config)
    optimizer = optax.adam(1e-3)
    params = init_score_network(jax.random.key(10), model_config)
    epsilon = gen_noise(
        jax.random.key(11), (GLOBAL_B, dataset.peptide_maxlen), diffusion_config
    )
    opt_state = optimizer.init(params)

    def loss_fn(p, raw, eps):
        mb = prepare_batch(raw)
        zt = add_noise(mb, eps, 5, tables)
        pred = score_network_forward(p, zt, 5, model_config)
        losses = diffusion_loss(eps, pred, mb["mask"], mb["torsions_mask"])
        return jnp.mean(losses["total loss"])

    def step(p, o, raw, eps):
        loss, grads = jax.value_and_grad(loss_fn)(p, raw, eps)
        updates, o = optimizer.update(grads, o, p)
        return loss, grads, optax.apply_updates(p, updates)

    loss, grads, new_params = jax.jit(step)(params, opt_state, batch, epsilon)
    return (
        float(loss),
        [np.asarray(x) for x in jax.tree_util.tree_leaves(grads)],
        [np.asarray(x) for x in jax.tree_util.tree_leaves(new_params)],
    )


def _run_workers(nproc: int, h5_path: str, out_npz: str):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port),
             h5_path, out_npz],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    return outs


@pytest.mark.parametrize("nproc", [2, 4])
def test_multihost_step_matches_single_process(train_h5, tmp_path, nproc):
    out_npz = str(tmp_path / f"mh{nproc}.npz")
    _run_workers(nproc, train_h5, out_npz)
    assert os.path.isfile(out_npz), "process 0 did not write results"
    got = np.load(out_npz)

    ref_loss, ref_grads, ref_params = _single_process_reference(train_h5, nproc)

    np.testing.assert_allclose(float(got["loss"]), ref_loss, rtol=1e-5)
    for i, g in enumerate(ref_grads):
        np.testing.assert_allclose(got[f"g{i}"], g, atol=2e-5)
    # Adam amplifies 1-ulp grad differences into O(lr)-scale param moves;
    # params compare loosely, losses/grads are the tight check
    for i, p in enumerate(ref_params):
        np.testing.assert_allclose(got[f"p{i}"], p, atol=2e-3)
