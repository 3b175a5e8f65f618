"""Sampling CLI — drop-in for the reference command
(``README.md:45-48``): ``python test.py model.pth test.hdf5``.

Mirrors the reference flow (``test.py:28-84``): load the checkpoint,
replace every peptide's frames and torsions with pure noise, run the full
T-step reverse diffusion, merge the stored full-protein atoms, and write
one PDB per entry into ``<hdf5 stem>-sampled/``.

TPU-native: the entire 1000-step trajectory is ONE jitted lax.scan per
batch shape (the reference dispatches 1000 model forwards from a Python
loop, ``optimizer.py:236-249``).
"""

from __future__ import annotations

import logging
import os
import sys
from argparse import ArgumentParser

_log = logging.getLogger(__name__)


def build_parser() -> ArgumentParser:
    p = ArgumentParser(description=__doc__)
    p.add_argument("model", help="model parameters file (.pth or orbax dir)")
    p.add_argument("test_hdf5", help="test data")
    p.add_argument("--debug", "-d", action="store_const", const=True, default=False)
    p.add_argument("-T", type=int, default=1000, help="number of noise steps")
    p.add_argument("--batch-size", "-b", type=int, default=64, help="data batch size")
    p.add_argument("--num-workers", "-w", type=int, default=4,
                   help="number of batch loading threads")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default=None,
                   help="override the default <stem>-sampled output directory")
    p.add_argument("--backend", default="auto",
                   choices=("auto", "xla", "pallas", "pallas_lane", "g8",
                            "blockwise", "cp", "ring"),
                   help="EGNN layer implementation. 'auto' (default) "
                        "picks the fastest measured config for the "
                        "platform: on TPU the fused Pallas kernels "
                        "(g8 with --bf16, pallas_lane at f32 — the "
                        "sampler scan stays in kernel layout end-to-end; "
                        "all sampling distributions match xla within "
                        "tolerance, tools/rmsd_backends.py), elsewhere "
                        "xla. Explicit choices: XLA block-matmuls, the "
                        "fused kernels, online-softmax neighbour "
                        "streaming, or context parallelism (cp/ring "
                        "shard the neighbour axis over --mesh-context "
                        "devices)")
    p.add_argument("--mesh-context", type=int, default=1,
                   help="devices on the context-parallel axis (the rest go "
                        "to the data axis); selects backend 'cp' unless "
                        "--backend is already cp/ring")
    p.add_argument("--bf16", action="store_true",
                   help="run MLP matmuls in backend-default (bf16 MXU) "
                        "precision — ~1.7x faster on v5e; geometry stays f32")
    p.add_argument("--fast-f32", action="store_true",
                   help="run matmuls as 3-pass f32 instead of the "
                        "parity-exact ~6-pass HIGHEST: XLA stages use "
                        "lax.Precision.HIGH (~1e-6 rel err), Pallas kernels "
                        "emulate it with bf16 hi/lo split dots "
                        "(~1.5e-5 rel err)")
    p.add_argument("--validate-data", action="store_true",
                   help="check the HDF5 against the SwiftMHC schema before "
                        "sampling and abort with actionable messages on "
                        "drift (pmhc_tpu.data.validate)")
    p.add_argument("--num-samples", type=int, default=1,
                   help="conformations to sample per entry (default 1, the "
                        "reference behavior). N > 1 re-runs the compiled "
                        "sampler with independent noise per sample and "
                        "writes <name>.1.pdb ... <name>.N.pdb — amortizes "
                        "the HDF5 decode and jit setup across samples")
    p.add_argument("--sample-steps", type=int, default=None,
                   help="reverse-diffusion jumps per trajectory (default: "
                        "T, the reference's full chain). Fewer steps run "
                        "the same ancestral update over a strided t-grid "
                        "(the reference's remove_noise math generalized "
                        "to arbitrary (t, s) jumps — golden-tested) for a "
                        "~T/K sampling speedup; quality vs K measured in "
                        "docs/parity.md")
    p.add_argument("--profile-dir", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the run "
                        "to DIR (TensorBoard xplane + Chrome trace). The "
                        "WHOLE run is traced — use a small batch count")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        stream=sys.stdout, level=logging.DEBUG if args.debug else logging.INFO
    )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.profile_dir:
        from pmhc_tpu.utils.profiling import profile_trace

        _log.info("capturing a device trace to %s (view with TensorBoard; "
                  "the whole run is traced)", args.profile_dir)
        with profile_trace(args.profile_dir):
            return _run(args)
    return _run(args)


def _run(args) -> None:
    import jax
    import jax.numpy as jnp

    from pmhc_tpu.data import PmhcDataset, PrefetchLoader
    from pmhc_tpu.diffusion import (
        DiffusionConfig, ScheduleTables, gen_noise, sample, sample_sharded,
    )
    from pmhc_tpu.io import save_pdb
    from pmhc_tpu.models import ScoreNetworkConfig, import_torch_checkpoint
    from pmhc_tpu.train.trainer import prepare_batch

    if args.validate_data:
        from pmhc_tpu.data.validate import validate_hdf5

        checked, problems = validate_hdf5(args.test_hdf5)
        for prob in problems:
            _log.error("schema: %s", prob)
        if problems:
            raise SystemExit(
                f"{args.test_hdf5}: {len(problems)} schema problems in "
                f"{checked} entries (see above)")
        _log.info("schema: %d entries validated clean", checked)

    backend = args.backend
    context_parallel = args.mesh_context > 1 or backend in ("cp", "ring")
    if context_parallel and backend not in ("cp", "ring"):
        backend = "cp"
        _log.info("--mesh-context %d: selecting backend 'cp'", args.mesh_context)
    elif backend == "auto":
        # fastest measured config per platform (docs/status.md tables);
        # distribution-equivalent to xla (tools/rmsd_backends.py)
        if jax.default_backend() == "tpu":
            backend = "g8" if args.bf16 else "pallas_lane"
        else:
            backend = "xla"
        _log.info(
            "backend 'auto' -> %s. Note: individual sampled TRAJECTORIES "
            "differ across backends/platforms (reverse diffusion amplifies "
            "float reduction-order differences); the sample DISTRIBUTIONS "
            "match (tools/rmsd_backends.py). Pass an explicit --backend for "
            "cross-machine reproducibility.", backend,
        )

    model_config = ScoreNetworkConfig(noise_step_count=args.T, backend=backend)
    diffusion_config = DiffusionConfig(noise_step_count=args.T)
    tables = ScheduleTables(diffusion_config)

    if os.path.isdir(args.model):
        # Orbax checkpoint directory (full training state; params extracted)
        import optax

        from pmhc_tpu.models import init_score_network
        from pmhc_tpu.train.checkpoints import CheckpointManager

        params_like = init_score_network(jax.random.key(0), model_config)
        opt_like = optax.adam(1e-3).init(params_like)
        mgr = CheckpointManager(args.model)
        params, _, _, step = mgr.restore(params_like, opt_like)
        _log.info("restored orbax checkpoint at step %d", step)
    else:
        params = import_torch_checkpoint(args.model)

    dataset = PmhcDataset(args.test_hdf5)
    loader = PrefetchLoader(
        dataset, batch_size=args.batch_size, num_workers=args.num_workers
    )

    output_path = args.output_dir or os.path.splitext(args.test_hdf5)[0] + "-sampled"
    os.makedirs(output_path, exist_ok=True)

    from pmhc_tpu.models.nn import DEFAULT_PRECISION

    precision = (None if args.bf16
                 else jax.lax.Precision.HIGH if args.fast_f32
                 else DEFAULT_PRECISION)

    if context_parallel:
        from pmhc_tpu.parallel import make_mesh

        mesh = make_mesh(n_context=max(1, args.mesh_context))

        def run_sample(batch, key):
            return sample_sharded(
                params, batch, key, diffusion_config, model_config, mesh,
                tables, precision=precision, num_steps=args.sample_steps,
            )
    elif backend in ("pallas_lane", "g8"):
        # lane-layout sampler: the scan carry stays in the fused kernel's
        # lane layout for all T steps (no per-step transposes)
        from pmhc_tpu.diffusion.sampler_lane import sample_lane

        @jax.jit
        def run_sample(batch, key):
            return sample_lane(
                params, batch, key, diffusion_config, model_config, tables,
                precision=precision, g8=backend == "g8",
                num_steps=args.sample_steps,
            )
    else:
        @jax.jit
        def run_sample(batch, key):
            return sample(
                params, batch, key, diffusion_config, model_config, tables,
                precision=precision, num_steps=args.sample_steps,
            )

    from pmhc_tpu.io.pdb import convert_batch_for_pdb, fetch_pdb_arrays

    def write_batch(conv, names):
        # one blocking fetch per batch (the conversion was dispatched
        # right after that batch's sampler, so by now the device has
        # moved on to the NEXT batch and this returns early)
        pc = fetch_pdb_arrays(conv)
        for i, name in enumerate(names):
            save_pdb(None, i, f"{output_path}/{name}.pdb", precomputed=pc)
            _log.debug("saved %s.pdb", name)

    key = jax.random.key(args.seed)
    pending = None  # (conversion outputs on device, entry names)
    for batch in loader:
        names = batch.pop("name")
        # pad a short final batch up to the full batch size (repeat row 0)
        # so the sampler compiles exactly once; only the real rows are saved
        n_real = len(names)
        if n_real < args.batch_size:
            pad = args.batch_size - n_real
            batch = {
                k: jnp.concatenate(
                    (jnp.asarray(v),) + (jnp.asarray(v[:1]),) * pad, axis=0
                )
                for k, v in batch.items()
            }
        base_batch = prepare_batch(batch)
        base_batch["aatype"] = jnp.asarray(batch["aatype"])
        protein = dataset.get_protein_positions(names)

        for si in range(args.num_samples):
            # replace the peptide state by pure noise (test.py:70-74);
            # each sample gets an independent init + trajectory key
            key, noise_key, sample_key = jax.random.split(key, 3)
            model_batch = dict(base_batch)
            noise = gen_noise(
                noise_key, base_batch["frames"].shape, diffusion_config
            )
            model_batch["frames"] = noise["frames"]
            model_batch["torsions"] = noise["torsions"]

            pred_batch = dict(run_sample(model_batch, sample_key))
            pred_batch.update(protein)
            # queue the batch-level atom conversion behind this batch's
            # sampler, then write the PREVIOUS batch's PDBs while the
            # device works — host serialization overlaps device sampling
            conv = convert_batch_for_pdb(pred_batch)
            if pending is not None:
                write_batch(*pending)
            out_names = (names if args.num_samples == 1
                         else [f"{n}.{si + 1}" for n in names])
            pending = (conv, out_names)
    if pending is not None:
        write_batch(*pending)
    _log.info("wrote PDB files to %s", output_path)


if __name__ == "__main__":
    main()
