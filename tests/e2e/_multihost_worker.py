"""Worker process for the multi-host e2e test (test_multihost.py).

Each process is one "host": it calls the REAL multi-host entry points —
``initialize_multihost`` (``pmhc_tpu/parallel/distributed.py:20``) and the
loader's per-host entry sharding (``loader_shard_args``) — builds the same
global ``Mesh('data', ...)`` as single-process code, assembles its local
loader shard into a global array with
``jax.make_array_from_process_local_data``, and runs one jitted
grad + Adam step of the global-mean diffusion loss with injected noise.
Process 0 saves the (replicated) outputs for the parent test to compare
against a single-process computation.

Argv: pid nproc port hdf5_path out_npz
"""

import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import jax

# must run BEFORE any backend initialization (sitecustomize imports jax
# at interpreter start, but does not initialize a backend)
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(pid: int, nproc: int, port: str, hdf5_path: str, out_npz: str):
    from pmhc_tpu.parallel.distributed import initialize_multihost, loader_shard_args

    initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc  # 1 CPU device per host

    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pmhc_tpu.data import PmhcDataset, PrefetchLoader
    from pmhc_tpu.diffusion import (
        DiffusionConfig, ScheduleTables, add_noise, diffusion_loss, gen_noise,
    )
    from pmhc_tpu.models import ScoreNetworkConfig, init_score_network, score_network_forward
    from pmhc_tpu.parallel import make_mesh
    from pmhc_tpu.train.trainer import prepare_batch

    GLOBAL_B = 8
    mesh = make_mesh(n_data=nproc)

    # per-host entry shard through the real loader path
    dataset = PmhcDataset(hdf5_path)
    loader = PrefetchLoader(
        dataset, batch_size=GLOBAL_B // nproc, shuffle=True, seed=0,
        num_workers=2, device_put=False, **loader_shard_args(),
    )
    local = next(iter(loader))
    local.pop("name", None)

    sh_data = NamedSharding(mesh, P("data"))
    global_batch = {
        k: jax.make_array_from_process_local_data(sh_data, np.asarray(v))
        for k, v in local.items()
    }

    model_config = ScoreNetworkConfig()
    diffusion_config = DiffusionConfig(noise_step_count=10)
    tables = ScheduleTables(diffusion_config)
    optimizer = optax.adam(1e-3)

    # identical on every host: same keys -> same values (local arrays);
    # each host shards out its rows and reassembles the global epsilon
    params_local = init_score_network(jax.random.key(10), model_config)
    epsilon_local = gen_noise(
        jax.random.key(11), (GLOBAL_B, dataset.peptide_maxlen), diffusion_config
    )
    b = GLOBAL_B // nproc
    epsilon = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh_data, np.asarray(x)[pid * b:(pid + 1) * b]
        ),
        epsilon_local,
    )
    repl = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        params_local,
    )
    opt_state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        optimizer.init(params_local),
    )

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

    shard = lambda tree: jax.tree_util.tree_map(lambda _: sh_data, tree)
    loss, grads, new_params = jax.jit(
        step,
        in_shardings=(repl, repl, shard(global_batch), shard(epsilon)),
        out_shardings=repl,
    )(params, opt_state, global_batch, epsilon)

    if pid == 0:
        flat_g, _ = jax.tree_util.tree_flatten(grads)
        flat_p, _ = jax.tree_util.tree_flatten(new_params)
        np.savez(
            out_npz,
            loss=np.asarray(loss),
            **{f"g{i}": np.asarray(x) for i, x in enumerate(flat_g)},
            **{f"p{i}": np.asarray(x) for i, x in enumerate(flat_p)},
        )
    print(f"worker {pid}/{nproc}: loss={float(loss):.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])
