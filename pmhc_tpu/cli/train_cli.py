"""Training CLI — drop-in for the reference command
(``README.md:40-43``): ``python optimize.py train.hdf5 100 model.pth``.

Mirrors the reference argparse surface (``optimize.py:24-32``) and
semantics: auto-resume from the output model if it exists, checkpoint
every 100 batches and at epoch end, per-epoch CSV metrics next to the
model file. TPU-native additions: ``--mesh-data`` for data-parallel
sharding over a device mesh, ``--orbax-dir`` for full-state (params +
optimizer + RNG) checkpointing, ``--bf16`` to run MLP matmuls at the MXU's
native precision.
"""

from __future__ import annotations

import logging
import os
import sys
from argparse import ArgumentParser

_log = logging.getLogger(__name__)


def build_parser() -> ArgumentParser:
    p = ArgumentParser(description=__doc__)
    p.add_argument("train_hdf5", help="train data")
    p.add_argument("epoch_count", type=int, help="number of epochs over the data")
    p.add_argument("output_model", help="output model parameters file (.pth)")
    p.add_argument("--debug", "-d", action="store_const", const=True, default=False,
                   help="run in debug mode (enables jax_debug_nans)")
    p.add_argument("-T", type=int, default=1000, help="number of noise steps")
    p.add_argument("--batch-size", "-b", type=int, default=64, help="data batch size")
    p.add_argument("--num-workers", "-w", type=int, default=4,
                   help="number of batch loading threads")
    p.add_argument("--lr", type=float, default=0.001, help="learning rate")
    p.add_argument("--pack", action="store_true",
                   help="decode the HDF5 once into RAM-packed arrays "
                        "(native C++ decoder when available) so epochs "
                        "stream at memory speed — the per-entry h5py "
                        "decode tops out ~140 examples/s, 135x short of "
                        "the chip (tools/bench_loader.py)")
    p.add_argument("--device-data", action="store_true",
                   help="additionally keep the packed dataset RESIDENT on "
                        "device and gather batches on-device (implies "
                        "--pack; ~34 KB/entry of HBM) — removes bulk "
                        "host->device uploads from the hot path entirely")
    # TPU-native extensions
    p.add_argument("--mesh-data", type=int, default=0,
                   help="devices on the data axis (0 = single device)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="devices on the model (tensor-parallel) axis: "
                        "shards every MLP hidden dim in the Megatron "
                        "column/row layout (docs/scaling.md)")
    p.add_argument("--mesh-context", type=int, default=1,
                   help="devices on the context-parallel axis: shards the "
                        "EGNN neighbour axis via shard_map (backend 'cp' "
                        "or 'ring'; selects 'cp' if --backend is not one "
                        "of them). Combined with --mesh-model it instead "
                        "runs DP x TP x CP as one GSPMD jit (xla backend "
                        "with neighbour-axis sharding constraints).")
    p.add_argument("--orbax-dir", default=None,
                   help="directory for full-state Orbax checkpoints")
    p.add_argument("--bf16", action="store_true",
                   help="run MLP matmuls in backend-default (bf16 MXU) precision")
    p.add_argument("--fast-f32", action="store_true",
                   help="run matmuls as 3-pass f32 instead of the "
                        "parity-exact ~6-pass HIGHEST: XLA stages use "
                        "lax.Precision.HIGH (~1e-6 rel err, +27%% on the "
                        "xla backend), Pallas kernels emulate it with bf16 "
                        "hi/lo split dots (~1.5e-5 rel err)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ema-decay", type=float, default=None,
                   help="opt-in EMA of the parameters (standard diffusion "
                        "practice, e.g. 0.999; the reference saves raw "
                        "weights only). The averaged weights are exported "
                        "alongside every checkpoint as <model>.ema.pth — "
                        "pass THAT file to the sampling CLI")
    p.add_argument("--restart-on-nan", type=int, default=0,
                   help="elastic NaN recovery: instead of the reference's "
                        "hard abort, restore the last checkpoint (Orbax "
                        "full state if --orbax-dir, else the .pth params), "
                        "re-fold the RNG key onto a fresh noise trajectory "
                        "and continue — at most this many times (0 = "
                        "reference abort behavior). Motivated by the "
                        "measured ~1/3 per-seed divergence rate of the "
                        "reference recipe (docs/parity.md)")
    p.add_argument("--clip-grad-norm", type=float, default=None,
                   help="opt-in global-norm gradient clipping (off by "
                        "default, matching the reference, whose only "
                        "guard is the NaN-loss abort; the measured "
                        "dynamics spike >100x and can diverge on long "
                        "horizons — see docs/parity.md)")
    p.add_argument("--lr-warmup-steps", type=int, default=0,
                   help="opt-in linear LR warmup (0 -> --lr over this many "
                        "optimizer steps; off by default, matching the "
                        "reference's constant Adam lr). The schedule "
                        "counter checkpoints through --orbax-dir")
    p.add_argument("--lr-decay-steps", type=int, default=None,
                   help="opt-in cosine LR decay to --lr-final over this "
                        "TOTAL horizon in optimizer steps (warmup "
                        "included); off by default")
    p.add_argument("--lr-final", type=float, default=0.0,
                   help="final LR for --lr-decay-steps (default 0)")
    p.add_argument("--val-hdf5", default=None, metavar="PATH",
                   help="held-out HDF5 evaluated after every epoch (no "
                        "gradient); per-epoch means append to "
                        "<model>.val.csv (same schema as the train CSV). "
                        "Noise/timestep draws are FIXED per batch index, "
                        "so the curve is comparable across epochs. With "
                        "--ema-decay the EMA weights are evaluated too "
                        "(<model>.val.ema.csv)")
    p.add_argument("--grad-accum", type=int, default=1, metavar="K",
                   help="average gradients over K consecutive batches "
                        "per optimizer update (effective batch K*B at "
                        "the HBM footprint of B; optax.MultiSteps — the "
                        "accumulator checkpoints through --orbax-dir; "
                        "LR schedules count optimizer steps). Default 1 "
                        "= off, matching the reference")
    p.add_argument("--per-sample-t", action="store_true",
                   help="draw one timestep per sample instead of per batch "
                        "(deviates from the reference quirk)")
    p.add_argument("--validate-data", action="store_true",
                   help="check the HDF5 against the SwiftMHC schema before "
                        "training and abort with actionable messages on "
                        "drift (pmhc_tpu.data.validate)")
    p.add_argument("--profile-dir", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the run "
                        "to DIR (TensorBoard xplane + Chrome trace). The "
                        "WHOLE run is traced — use a short run (small "
                        "epoch count / tiny dataset) to keep it readable")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="scan this many optimizer steps inside one device "
                        "dispatch (amortizes host->TPU latency; identical "
                        "math to sequential steps)")
    p.add_argument("--backend", default="auto",
                   choices=("auto", "xla", "pallas", "pallas_lane", "g8",
                            "blockwise", "cp", "ring"),
                   help="EGNN layer implementation. 'auto' (default) "
                        "picks the fastest measured config: on TPU the "
                        "fused Pallas kernels with hand-written "
                        "backwards (g8 with --bf16 at 1036 steps/s, "
                        "pallas_lane at f32 at 261 / 364 with "
                        "--fast-f32; per-step gradient parity with xla "
                        "is tested to <=2e-4 and 10k-step converged "
                        "quality is backend-indistinguishable — "
                        "docs/parity.md), elsewhere xla. pallas trains "
                        "via Pallas "
                        "forward + XLA-remat backward; blockwise streams "
                        "neighbour blocks with an online softmax; cp/ring "
                        "shard the neighbour axis over --mesh-context "
                        "devices")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    logging.basicConfig(
        stream=sys.stdout, level=logging.DEBUG if args.debug else logging.INFO
    )

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.debug:
        jax.config.update("jax_debug_nans", True)

    if args.profile_dir:
        from pmhc_tpu.utils.profiling import profile_trace

        _log.info("capturing a device trace to %s (view with TensorBoard; "
                  "keep the run short — the whole run is traced)",
                  args.profile_dir)
        with profile_trace(args.profile_dir):
            return _run(args)
    return _run(args)


def _run(args) -> None:
    import jax

    from pmhc_tpu.data import PmhcDataset, PrefetchLoader
    from pmhc_tpu.diffusion import DiffusionConfig
    from pmhc_tpu.models import ScoreNetworkConfig, import_torch_checkpoint
    from pmhc_tpu.models.import_torch import export_torch_checkpoint
    from pmhc_tpu.models.nn import DEFAULT_PRECISION
    from pmhc_tpu.parallel import batch_sharding, make_mesh
    from pmhc_tpu.train import MetricsRecord, Trainer, TrainConfig

    if args.validate_data:
        from pmhc_tpu.data.validate import validate_hdf5

        checked, problems = validate_hdf5(args.train_hdf5)
        for prob in problems:
            _log.error("schema: %s", prob)
        if problems:
            raise SystemExit(
                f"{args.train_hdf5}: {len(problems)} schema problems in "
                f"{checked} entries (see above)")
        _log.info("schema: %d entries validated clean", checked)

    backend = args.backend
    three_axis = args.mesh_context > 1 and args.mesh_model > 1
    context_parallel = args.mesh_context > 1 or backend in ("cp", "ring")
    if three_axis:
        # DP x TP x CP composes as ONE GSPMD jit over the xla backend
        # (neighbour-axis sharding constraints + Megatron param layout)
        if backend not in ("auto", "xla"):
            raise SystemExit(
                "--mesh-model with --mesh-context (DP x TP x CP) runs the "
                f"GSPMD xla backend; --backend {backend} is incompatible"
            )
        backend = "xla"
        _log.info(
            "--mesh-model %d x --mesh-context %d: GSPMD DP x TP x CP "
            "(backend 'xla')", args.mesh_model, args.mesh_context,
        )
    elif context_parallel and backend not in ("cp", "ring"):
        backend = "cp"
        _log.info("--mesh-context %d: selecting backend 'cp'", args.mesh_context)
    elif backend == "auto":
        # fastest measured config per platform (docs/status.md tables);
        # per-step gradient parity with xla tested to <=2e-4, 500-step
        # held-out quality neutral (docs/parity.md) — pass --backend xla
        # for the bit-conservative reference-parity configuration
        if jax.default_backend() == "tpu":
            backend = "g8" if args.bf16 else "pallas_lane"
        else:
            backend = "xla"
        _log.info("backend 'auto' -> %s", backend)

    model_config = ScoreNetworkConfig(noise_step_count=args.T, backend=backend)
    diffusion_config = DiffusionConfig(
        noise_step_count=args.T, t_per_batch=not args.per_sample_t
    )
    train_config = TrainConfig(
        learning_rate=args.lr, batch_size=args.batch_size, seed=args.seed,
        grad_clip_norm=args.clip_grad_norm, ema_decay=args.ema_decay,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_decay_steps=args.lr_decay_steps, lr_final=args.lr_final,
        grad_accum=max(1, args.grad_accum),
    )

    # --mesh-model / --mesh-context without --mesh-data: the data axis
    # auto-sizes to (devices // other axes) inside make_mesh
    mesh = (
        make_mesh(n_data=args.mesh_data or None, n_model=args.mesh_model,
                  n_context=max(1, args.mesh_context))
        if args.mesh_data or args.mesh_model > 1 or context_parallel
        else None
    )

    params = None
    if os.path.isfile(args.output_model):
        _log.info("resuming from %s", args.output_model)
        params = import_torch_checkpoint(args.output_model)

    trainer = Trainer(
        model_config,
        diffusion_config,
        train_config,
        mesh=mesh,
        params=params,
        precision=(None if args.bf16
                   else jax.lax.Precision.HIGH if args.fast_f32
                   else DEFAULT_PRECISION),
        tensor_parallel=args.mesh_model > 1,
        context_parallel=context_parallel,
    )

    ckpt_mgr = None
    if args.orbax_dir:
        from pmhc_tpu.train.checkpoints import CheckpointManager

        ckpt_mgr = CheckpointManager(args.orbax_dir)
        if ckpt_mgr.latest_step() is not None:
            try:
                trainer.params, trainer.opt_state, trainer.key, step = (
                    ckpt_mgr.restore(trainer.params, trainer.opt_state))
            except (ValueError, TypeError, KeyError) as e:
                # the opt_state PYTREE SHAPE depends on the optimizer-chain
                # flags (--grad-accum wraps the chain in MultiSteps,
                # --ema-decay / --clip-grad-norm / --lr-schedule add links),
                # so resuming with different flags fails deep inside orbax
                # with a raw tree-structure mismatch
                raise SystemExit(
                    f"orbax restore from {args.orbax_dir} failed with a "
                    f"checkpoint-structure mismatch: {e}\n"
                    "Likely cause: this run's optimizer-chain flags "
                    "(--grad-accum, --ema-decay, --clip-grad-norm, "
                    "--lr-schedule) differ from the run that wrote the "
                    "checkpoint. Re-run with the original flags, or point "
                    "--orbax-dir at a fresh directory (resume params only "
                    "via the .pth path)."
                ) from e
            trainer.global_step = step
            _log.info("restored orbax checkpoint at step %d", step)

    if args.pack or args.device_data:
        from pmhc_tpu.data import PackedDataset

        dataset = PackedDataset(args.train_hdf5, num_workers=args.num_workers)
        _log.info("packed %d entries (%.0f MB RAM)", len(dataset),
                  dataset.nbytes / 1e6)
        if args.device_data:
            from pmhc_tpu.data import DeviceDataset
            from pmhc_tpu.parallel.mesh import replicated_sharding

            dataset = DeviceDataset(
                dataset,
                sharding=replicated_sharding(mesh) if mesh else None,
            )
            _log.info("dataset resident on device (%.0f MB HBM)",
                      dataset.nbytes / 1e6)
    else:
        dataset = PmhcDataset(args.train_hdf5)
    loader = PrefetchLoader(
        dataset,
        batch_size=args.batch_size,
        shuffle=True,
        seed=args.seed,
        num_workers=args.num_workers,
        sharding=batch_sharding(mesh) if mesh else None,
    )

    def save_model():
        export_torch_checkpoint(trainer.params, args.output_model)
        if args.ema_decay:
            export_torch_checkpoint(
                trainer.ema_params,
                args.output_model.replace(".pth", ".ema.pth"))
        if ckpt_mgr is not None:
            # the EMA rides inside opt_state, so it checkpoints/restores
            # with the Adam moments automatically
            ckpt_mgr.save(trainer.global_step, trainer.params, trainer.opt_state, trainer.key)
        _log.debug("saved %s", args.output_model)

    metrics_path = args.output_model.replace(".pth", ".csv")
    K = max(1, args.steps_per_dispatch)

    if args.val_hdf5:
        val_loader = PrefetchLoader(
            PmhcDataset(args.val_hdf5),
            batch_size=args.batch_size,
            shuffle=False,
            num_workers=args.num_workers,
            sharding=batch_sharding(mesh) if mesh else None,
        )
        # fixed per-batch-index keys: every epoch evaluates the SAME
        # (t, noise) draws, so the val curve isolates parameter movement
        val_key = jax.random.key(args.seed + 104729)

    def run_validation(epoch_index):
        if not args.val_hdf5:
            return
        val_metrics = MetricsRecord()
        ema_metrics = MetricsRecord() if args.ema_decay else None
        for j, batch in enumerate(val_loader):
            k = jax.random.fold_in(val_key, j)
            trainer.eval_batch(batch, k, val_metrics)
            if ema_metrics is not None:
                trainer.eval_batch(batch, k, ema_metrics,
                                   params=trainer.ema_params)
        val_metrics.save(
            args.output_model.replace(".pth", ".val.csv"), epoch_index)
        _log.info("epoch %d val: %s", epoch_index, val_metrics.mean())
        if ema_metrics is not None:
            ema_metrics.save(
                args.output_model.replace(".pth", ".val.ema.csv"),
                epoch_index)
            _log.info("epoch %d val (ema): %s", epoch_index,
                      ema_metrics.mean())

    nan_state = {"retries": 0}

    def check_nan(metrics):
        """NaN guard. Reference behavior (default) is the hard abort
        (``optimizer.py:217-218``). With --restart-on-nan N, restore
        the last checkpoint, re-fold the RNG key onto a fresh noise
        trajectory, and hand back a clean metrics record — up to N
        times."""
        if not metrics.has_nan():
            return metrics
        if nan_state["retries"] >= args.restart_on_nan:
            raise RuntimeError("NaN loss")
        nan_state["retries"] += 1
        if ckpt_mgr is not None and ckpt_mgr.latest_step() is not None:
            trainer.params, trainer.opt_state, trainer.key, step = (
                ckpt_mgr.restore(trainer.params, trainer.opt_state))
            trainer.global_step = step
            src = f"orbax step {step}"
        elif os.path.isfile(args.output_model):
            trainer.params = import_torch_checkpoint(args.output_model)
            trainer.opt_state = trainer.optimizer.init(trainer.params)
            # opt_state re-init wipes EVERYTHING riding in it: Adam
            # moments, the --grad-accum MultiSteps accumulator, and the
            # --ema-decay average (reset to the restored params)
            src = (f"{args.output_model} (params only; Adam moments, "
                   "grad-accum accumulator and EMA average reset)")
        else:
            raise RuntimeError("NaN loss (no checkpoint to restart from)")
        # a fresh noise trajectory: replaying the saved key over the
        # same upcoming batches could diverge identically
        trainer.key = jax.random.fold_in(trainer.key,
                                         7919 + nan_state["retries"])
        _log.warning(
            "NaN loss: restored %s, re-folded RNG (retry %d/%d); "
            "epoch CSV means now cover post-restart batches only",
            src, nan_state["retries"], args.restart_on_nan)
        return MetricsRecord()

    if args.device_data and K > 1 and mesh is None:
        # fully fused device pipeline: the scan body gathers each batch
        # from the resident dataset, so K steps + K gathers = ONE
        # dispatch; only the [K, B] index matrix crosses the link
        # (make_train_scan_device). Leftover rows fall back to the
        # regular per-batch path.
        import numpy as np

        n = len(dataset.entry_names)
        B = args.batch_size
        for epoch_index in range(args.epoch_count):
            _log.debug("starting epoch %d (fused device pipeline)", epoch_index)
            metrics = MetricsRecord()
            # one shuffle implementation: the epoch order comes from the
            # loader (default_rng(seed + epoch) permutation), exactly what
            # iterating it would produce
            perm = np.asarray(loader._epoch_indices())
            loader._epoch += 1
            nfull = n // B
            idx_full = perm[: nfull * B].reshape(nfull, B)
            nk = (nfull // K) * K  # full K-groups only: a shorter final
            # group would retrace the whole K-step scan (minutes)
            done = 0
            for start in range(0, nk, K):
                trainer.train_indices(
                    dataset.arrays, idx_full[start:start + K], metrics)
                done += K
                if done % 100 < K and done >= 100:
                    metrics = check_nan(metrics)
                    save_model()
            for row in idx_full[nk:]:  # leftover batches, one at a time
                trainer.train_batch(dataset.get_batch(list(row)), metrics)
            if nfull * B < n:  # partial final batch
                trainer.train_batch(dataset.get_batch(
                    list(perm[nfull * B:])), metrics)
            metrics = check_nan(metrics)
            save_model()
            if len(metrics):  # empty after an epoch-end NaN recovery
                metrics.save(metrics_path, epoch_index)
                _log.info("epoch %d: %s", epoch_index, metrics.mean())
            run_validation(epoch_index)
        if ckpt_mgr is not None:
            ckpt_mgr.wait()
        return

    for epoch_index in range(args.epoch_count):
        _log.debug("starting epoch %d", epoch_index)
        metrics = MetricsRecord()
        pending = []
        for i, batch in enumerate(loader):
            if K > 1 and batch["mask"].shape[0] == args.batch_size:
                pending.append(batch)
                if len(pending) == K:
                    trainer.train_batches(pending, metrics)
                    pending = []
            else:
                trainer.train_batch(batch, metrics)
            if i > 0 and i % 100 == 0:
                metrics = check_nan(metrics)  # abort or recover
                save_model()
        for batch in pending:  # leftover batches (< K) run one at a time
            trainer.train_batch(batch, metrics)
        metrics = check_nan(metrics)
        save_model()
        if len(metrics):  # empty after an epoch-end NaN recovery
            metrics.save(metrics_path, epoch_index)
            _log.info("epoch %d: %s", epoch_index, metrics.mean())
        run_validation(epoch_index)
    if ckpt_mgr is not None:
        ckpt_mgr.wait()


if __name__ == "__main__":
    main()
