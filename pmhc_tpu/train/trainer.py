"""The training engine: one jitted, donated, mesh-sharded train step.

Twin of the reference's ``DiffusionModelOptimizer.optimize`` + the epoch
loop in ``optimize.py:67-82``, re-architected for TPU:

- the whole step (timestep draw, noise generation, forward process, model
  forward, loss, backward, Adam update) is ONE compiled XLA program;
  params/opt_state buffers are donated, so updates are in-place in HBM;
- data parallelism is GSPMD: the step jits with NamedSharding annotations
  (batch sharded on the 'data' mesh axis, params/opt replicated); XLA
  partitions the batch-mean gradient into per-shard sums + an ICI
  all-reduce — no hand-written collectives, no NCCL (SURVEY.md §2.3);
- RNG is a carried jax.random key; the timestep is drawn ONCE PER BATCH
  (reference quirk, ``optimizer.py:197``, SURVEY.md §3.5.2) unless
  ``DiffusionConfig.t_per_batch=False``;
- metrics leave the device as per-batch sums, no per-step host sync
  (the reference syncs every step, ``tools/metrics.py:17``);
- the NaN-loss abort (``optimizer.py:217-218``) is preserved as a
  periodic host-side check (every ``nan_check_every`` steps), since a
  per-step device->host sync would serialize the pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from pmhc_tpu.diffusion.loss import diffusion_loss
from pmhc_tpu.diffusion.noise import add_noise, gen_noise
from pmhc_tpu.diffusion.schedule import DiffusionConfig, ScheduleTables
from pmhc_tpu.geometry import RigidArray
from pmhc_tpu.models import ScoreNetworkConfig, score_network_forward
from pmhc_tpu.models.nn import DEFAULT_PRECISION
from pmhc_tpu.parallel.mesh import replicated_sharding


@dataclass(frozen=True)
class TrainConfig:
    """Defaults mirror the reference CLI (``optimize.py:29-32``)."""

    learning_rate: float = 1e-3
    batch_size: int = 64
    checkpoint_every_batches: int = 100  # reference optimize.py:75
    nan_check_every: int = 100
    seed: int = 0
    # Opt-in global-norm gradient clipping (None = off, matching the
    # reference, which has NO clipping and simply aborts on NaN loss,
    # ``optimizer.py:217-218``). The measured dynamics genuinely spike
    # (per-batch grad-norm excursions >100x; the 10k-step quality study
    # recorded one f32 arm diverging to NaN near step 2800 while
    # sibling seeds/backends trained cleanly), so a bound is offered as
    # a deliberate, documented extension — see docs/parity.md.
    grad_clip_norm: float | None = None
    # Opt-in EMA of the parameters (None = off, matching the reference).
    # Standard diffusion practice (sample from the averaged weights,
    # decay ~0.999); maintained inside the optimizer state
    # (train/ema.py) so it flows through every trainer path and Orbax.
    ema_decay: float | None = None
    # Opt-in learning-rate schedule (defaults = off: the reference runs
    # constant Adam lr, ``optimize.py:32``). ``lr_warmup_steps`` ramps
    # 0 -> learning_rate linearly; ``lr_decay_steps`` (a TOTAL horizon
    # in optimizer steps, warmup included) then cosine-decays to
    # ``lr_final``. The schedule's step counter lives inside the optax
    # state, so it checkpoints/restores through Orbax and is correct
    # under the K-step scan and fused device pipelines.
    lr_warmup_steps: int = 0
    lr_decay_steps: int | None = None
    lr_final: float = 0.0
    # Opt-in gradient accumulation (1 = off, matching the reference):
    # every optimizer update averages the gradients of this many
    # consecutive micro-batches (optax.MultiSteps), so an effective
    # batch of K*B trains within the HBM footprint of B. The
    # accumulator lives inside the optimizer state, so it flows through
    # every trainer path (GSPMD DP, TP-sharded moments, shard_map CP,
    # the K-step device scans) and Orbax checkpoint/restore unchanged.
    grad_accum: int = 1


def make_learning_rate(config: TrainConfig):
    """The optax learning rate for a TrainConfig: a float when no
    schedule is requested (bit-identical to the pre-schedule optimizer),
    else an optax schedule (linear warmup, optional cosine decay)."""
    if not config.lr_warmup_steps and config.lr_decay_steps is None:
        return config.learning_rate
    warmup = config.lr_warmup_steps
    if config.lr_decay_steps is not None:
        if config.lr_decay_steps <= warmup:
            raise ValueError(
                f"lr_decay_steps ({config.lr_decay_steps}) must exceed "
                f"lr_warmup_steps ({warmup}) — it is the total horizon")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=config.learning_rate,
            warmup_steps=warmup,
            decay_steps=config.lr_decay_steps,
            end_value=config.lr_final,
        )
    return optax.join_schedules(
        [optax.linear_schedule(0.0, config.learning_rate, warmup),
         optax.constant_schedule(config.learning_rate)],
        boundaries=[warmup],
    )


MODEL_BATCH_KEYS = (
    "torsions",
    "features",
    "mask",
    "torsions_mask",
    "pocket_features",
    "pocket_mask",
)


def prepare_batch(batch: Dict[str, Any]) -> Dict[str, Any]:
    """Loader batch (tensor-7 frames) -> train-step input (RigidArray
    frames, like ``Rigid.from_tensor_7`` at ``optimizer.py:201-202`` —
    no quat normalization, SURVEY.md §3.5.10)."""
    out = {k: batch[k] for k in MODEL_BATCH_KEYS if k in batch}
    out["frames"] = RigidArray.from_tensor_7(jnp.asarray(batch["frames"]))
    out["pocket_frames"] = RigidArray.from_tensor_7(jnp.asarray(batch["pocket_frames"]))
    return out


def _build_step_fn(
    model_config: ScoreNetworkConfig,
    diffusion_config: DiffusionConfig,
    optimizer: optax.GradientTransformation,
    precision=DEFAULT_PRECISION,
    data_axis=None,
    neighbour_sharding=None,
):
    """The pure (unjitted) train step: (params, opt_state, batch, key) ->
    (params, opt_state, key, metric_sums).

    ``data_axis`` switches the step to manual-SPMD mode (for running
    inside shard_map, e.g. the context-parallel path): the batch arrives
    as the local 'data' shard, the timestep/noise draws are generated at
    GLOBAL batch shape and sliced per shard (bit-identical to the
    single-device step on the concatenated batch), the loss is the global
    batch mean via psum, and the returned metric sums are global. Grads
    w.r.t. the replicated params come out globally correct because JAX's
    vma machinery transposes the unvarying->varying promotions into psums.
    """
    tables = ScheduleTables(diffusion_config)
    T = diffusion_config.noise_step_count

    def step_fn(params, opt_state, batch, key):
        from jax import lax

        frames: RigidArray = batch["frames"]
        batch_shape = frames.shape  # (B, N) — local shard under data_axis
        # the key is carried device-side and advanced inside the step: no
        # per-step host RNG dispatch (each host->TPU call costs a tunnel
        # round trip under axon)
        key, key_t, key_eps = jax.random.split(key, 3)

        if data_axis is None:
            gshape = batch_shape
            slice_local = lambda x: x
        else:
            n_data = lax.axis_size(data_axis)
            b_local = batch_shape[0]
            gshape = (b_local * n_data,) + batch_shape[1:]
            start = lax.axis_index(data_axis) * b_local

            def slice_local(x):
                return lax.dynamic_slice_in_dim(x, start, b_local, axis=0)

        if diffusion_config.t_per_batch:
            t = jax.random.randint(key_t, (), 0, T)  # one t per batch (quirk)
        else:
            t = slice_local(jax.random.randint(key_t, (gshape[0],), 0, T))

        epsilon = jax.tree_util.tree_map(
            slice_local, gen_noise(key_eps, gshape, diffusion_config)
        )

        def loss_fn(p):
            zt = add_noise(batch, epsilon, t, tables)
            pred = score_network_forward(
                p, zt, t, model_config, precision,
                neighbour_sharding=neighbour_sharding,
            )
            losses = diffusion_loss(
                epsilon,
                pred,
                batch["mask"],
                batch["torsions_mask"],
                diffusion_config.position_loss_weight,
                diffusion_config.rotation_loss_weight,
                diffusion_config.torsion_loss_weight,
            )
            total = jnp.sum(losses["total loss"])
            if data_axis is not None:
                total = lax.psum(total, data_axis)
            return total / gshape[0], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        metric_sums = {k: jnp.sum(v) for k, v in losses.items()}
        if data_axis is not None:
            metric_sums = {
                k: lax.psum(v, data_axis) for k, v in metric_sums.items()
            }
        return new_params, new_opt_state, key, metric_sums

    return step_fn


def _shard_jit(fn, mesh, batch_is_stacked=False, tensor_parallel=False):
    """jit ``fn(params, opt_state, batch, key)`` with GSPMD shardings:
    batch sharded on its batch axis over the 'data' mesh axis (axis 1
    when batches carry a leading scan axis); params/opt_state replicated
    — or, with ``tensor_parallel``, INHERITED from the arguments (the
    Trainer commits them to the Megatron column/row layout of
    ``tp_param_shardings`` up front, and ``None`` in_shardings keep
    whatever layout the buffers carry, donation included).

    in_shardings must match the batch pytree structure, which is only
    known at call time, so the jit is built lazily per structure.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = replicated_sharding(mesh)
    state_in = None if tensor_parallel else repl
    spec = P(None, "data") if batch_is_stacked else P("data")
    data = NamedSharding(mesh, spec)
    jitted = {}

    def call(params, opt_state, batch, key):
        struct = jax.tree_util.tree_structure(batch)
        if struct not in jitted:
            batch_sh = jax.tree_util.tree_map(lambda _: data, batch)
            jitted[struct] = jax.jit(
                fn,
                in_shardings=(state_in, state_in, batch_sh, repl),
                out_shardings=(state_in, state_in, repl, repl),
                donate_argnums=(0, 1, 3),
            )
        return jitted[struct](params, opt_state, batch, key)

    return call


def _cp_shard_jit(fn, mesh, batch_is_stacked=False):
    """jit ``fn(params, opt_state, batch, key)`` wrapped in shard_map over
    the full mesh: batch sharded on 'data', params/opt_state/key
    replicated. ``fn`` must be a manual-SPMD step (built with
    ``data_axis='data'``) whose model backend binds the 'context' axis
    (ScoreNetworkConfig.backend in ('cp', 'ring'))."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(None, "data") if batch_is_stacked else P("data")
    jitted = {}

    def call(params, opt_state, batch, key):
        struct = jax.tree_util.tree_structure(batch)
        if struct not in jitted:
            batch_specs = jax.tree_util.tree_map(lambda _: spec, batch)
            sm = shard_map(
                fn,
                mesh=mesh,
                in_specs=(P(), P(), batch_specs, P()),
                out_specs=(P(), P(), P(), P()),
            )
            jitted[struct] = jax.jit(sm, donate_argnums=(0, 1, 3))
        return jitted[struct](params, opt_state, batch, key)

    return call


def make_train_step(
    model_config: ScoreNetworkConfig,
    diffusion_config: DiffusionConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
    precision=DEFAULT_PRECISION,
    tensor_parallel=False,
    context_parallel=False,
):
    """Build the jitted train step.

    Returns ``step(params, opt_state, batch, key) ->
    (params, opt_state, key, metric_sums)`` where ``metric_sums`` are
    per-batch SUMS of the five loss components (device scalars).

    ``context_parallel`` selects the manual shard_map path: the step runs
    SPMD over the mesh with the batch sharded on 'data' and the EGNN
    neighbour axis sharded on 'context' (requires
    ``model_config.backend in ('cp', 'ring')`` and a mesh from
    ``make_mesh(n_context=...)``). Semantics are bit-compatible with the
    single-device step on the same global batch.
    """
    if context_parallel and tensor_parallel:
        # DP x TP x CP in ONE GSPMD jit: the xla-backend forward with
        # with_sharding_constraint on the neighbour axis
        # (models/egnn.py::neighbour_shardings) composes with the
        # Megatron TP param layout; XLA inserts all collectives.
        if mesh is None:
            raise ValueError("context_parallel requires a mesh")
        if model_config.backend != "xla":
            raise ValueError(
                "DP x TP x CP (GSPMD) requires ScoreNetworkConfig.backend "
                f"'xla', got {model_config.backend!r}"
            )
        from pmhc_tpu.models.egnn import neighbour_shardings

        step_fn = _build_step_fn(
            model_config, diffusion_config, optimizer, precision,
            neighbour_sharding=neighbour_shardings(mesh),
        )
        return _shard_jit(step_fn, mesh, tensor_parallel=True)
    if context_parallel:
        if mesh is None:
            raise ValueError("context_parallel requires a mesh")
        if model_config.backend not in ("cp", "ring"):
            raise ValueError(
                "context_parallel requires ScoreNetworkConfig.backend "
                f"'cp' or 'ring', got {model_config.backend!r}"
            )
        step_fn = _build_step_fn(
            model_config, diffusion_config, optimizer, precision,
            data_axis="data",
        )
        return _cp_shard_jit(step_fn, mesh)
    step_fn = _build_step_fn(model_config, diffusion_config, optimizer, precision)
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0, 1, 3))
    return _shard_jit(step_fn, mesh, tensor_parallel=tensor_parallel)


def make_train_scan(
    model_config: ScoreNetworkConfig,
    diffusion_config: DiffusionConfig,
    optimizer: optax.GradientTransformation,
    mesh=None,
    precision=DEFAULT_PRECISION,
    tensor_parallel=False,
    context_parallel=False,
):
    """Multi-step variant: scan the train step over K stacked batches
    inside ONE compiled program.

    Per-step host dispatch through a remote TPU runtime costs tens of ms
    (measured: 15 steps/s dispatched vs the device-side step cost);
    scanning K steps amortizes it to one dispatch per K. Semantics are
    identical to K sequential ``step`` calls: the RNG key advances
    per-step exactly as the single-step path does.

    Returns ``steps(params, opt_state, stacked_batches, key) ->
    (params, opt_state, key, metric_sums[K])`` where ``stacked_batches``
    has a leading [K] axis on every leaf.
    """
    gspmd_cp = context_parallel and tensor_parallel  # DP x TP x CP jit
    if gspmd_cp:
        from pmhc_tpu.models.egnn import neighbour_shardings

        single = _build_step_fn(
            model_config, diffusion_config, optimizer, precision,
            neighbour_sharding=neighbour_shardings(mesh),
        )
    else:
        single = _build_step_fn(
            model_config, diffusion_config, optimizer, precision,
            data_axis="data" if context_parallel else None,
        )

    def scan_fn(params, opt_state, stacked_batches, key):
        def body(carry, batch):
            p, o, k = carry
            p, o, k, sums = single(p, o, batch, k)
            return (p, o, k), sums

        (params, opt_state, key), sums = jax.lax.scan(
            body, (params, opt_state, key), stacked_batches
        )
        return params, opt_state, key, sums

    if gspmd_cp:
        return _shard_jit(scan_fn, mesh, batch_is_stacked=True,
                          tensor_parallel=True)
    if context_parallel:
        if mesh is None:
            raise ValueError("context_parallel requires a mesh")
        return _cp_shard_jit(scan_fn, mesh, batch_is_stacked=True)
    if mesh is None:
        return jax.jit(scan_fn, donate_argnums=(0, 1, 3))
    return _shard_jit(scan_fn, mesh, batch_is_stacked=True,
                      tensor_parallel=tensor_parallel)


def make_eval_step(
    model_config: ScoreNetworkConfig,
    diffusion_config: DiffusionConfig,
    precision=DEFAULT_PRECISION,
):
    """Jitted held-out evaluation: ``(params, batch, key) -> metric_sums``
    — the train step's loss with no gradient and no update.

    The timestep is drawn PER SAMPLE (the reference's one-t-per-batch
    draw, ``optimizer.py:197``, is a training quirk; per-sample t covers
    the schedule uniformly and cuts eval variance) and both t and the
    noise derive from the caller's key, so evaluating with a FIXED key
    per batch index gives a deterministic measurement that is comparable
    across epochs: curve differences are purely parameter movement. No
    reference analogue (the reference never evaluates held-out data,
    ``optimize.py:67-82``)."""
    tables = ScheduleTables(diffusion_config)
    T = diffusion_config.noise_step_count

    def eval_fn(params, batch, key):
        key_t, key_eps = jax.random.split(key)
        bshape = batch["frames"].shape  # (B, N)
        t = jax.random.randint(key_t, (bshape[0],), 0, T)
        epsilon = gen_noise(key_eps, bshape, diffusion_config)
        zt = add_noise(batch, epsilon, t, tables)
        pred = score_network_forward(params, zt, t, model_config, precision)
        losses = diffusion_loss(
            epsilon,
            pred,
            batch["mask"],
            batch["torsions_mask"],
            diffusion_config.position_loss_weight,
            diffusion_config.rotation_loss_weight,
            diffusion_config.torsion_loss_weight,
        )
        return {k: jnp.sum(v) for k, v in losses.items()}

    return jax.jit(eval_fn)


def make_train_scan_device(
    model_config: ScoreNetworkConfig,
    diffusion_config: DiffusionConfig,
    optimizer: optax.GradientTransformation,
    precision=DEFAULT_PRECISION,
):
    """Device-resident data variant of ``make_train_scan``: the scan body
    GATHERS each batch from the on-device packed dataset before stepping,
    so K steps AND their K batch gathers run in one dispatch — only the
    tiny [K, B] index matrix crosses the host->device link per call.

    This closes the loader gap at high throughput: the standalone
    on-device gather path pays one dispatch per batch (~measured 36k
    examples/s at batch 1024, dispatch-latency bound), while the bf16
    train step alone sustains ~61k examples/s (docs/status.md) — fusing
    the gather into the scan removes the per-batch dispatch entirely.

    Returns ``steps(params, opt_state, data, idx, key) ->
    (params, opt_state, key, metric_sums[K])`` where ``data`` is the
    DeviceDataset's resident array pytree and ``idx`` is int32 [K, B].
    """
    single = _build_step_fn(
        model_config, diffusion_config, optimizer, precision,
    )

    def scan_fn(params, opt_state, data, idx, key):
        def body(carry, ib):
            p, o, k = carry
            batch = jax.tree_util.tree_map(lambda x: x[ib], data)
            p, o, k, sums = single(p, o, prepare_batch(batch), k)
            return (p, o, k), sums

        (params, opt_state, key), sums = jax.lax.scan(
            body, (params, opt_state, key), idx
        )
        return params, opt_state, key, sums

    return jax.jit(scan_fn, donate_argnums=(0, 1, 4))


class Trainer:
    """Epoch-loop driver mirroring the reference CLI semantics
    (``optimize.py:52-82``): auto-resume if the output model exists,
    checkpoint every N batches and at epoch end, CSV metrics per epoch."""

    def __init__(
        self,
        model_config: ScoreNetworkConfig = ScoreNetworkConfig(),
        diffusion_config: DiffusionConfig = DiffusionConfig(),
        train_config: TrainConfig = TrainConfig(),
        mesh=None,
        params=None,
        precision=DEFAULT_PRECISION,
        tensor_parallel=False,
        context_parallel=False,
    ):
        self.model_config = model_config
        self.diffusion_config = diffusion_config
        self.train_config = train_config
        self.mesh = mesh
        self.tensor_parallel = tensor_parallel
        self.context_parallel = context_parallel
        if context_parallel and tensor_parallel and model_config.backend != "xla":
            raise ValueError(
                "DP x TP x CP runs as one GSPMD jit over the xla backend "
                "(neighbour-axis sharding constraints compose with the "
                "Megatron layout); set ScoreNetworkConfig.backend='xla', "
                f"got {model_config.backend!r}"
            )

        key = jax.random.key(train_config.seed)
        self.key, init_key = jax.random.split(key)
        if params is None:
            from pmhc_tpu.models import init_score_network

            params = init_score_network(init_key, model_config)
        parts = [optax.adam(make_learning_rate(train_config))]
        if train_config.grad_clip_norm:
            parts.insert(0, optax.clip_by_global_norm(
                train_config.grad_clip_norm))
        if train_config.ema_decay:
            from pmhc_tpu.train.ema import ema_of_params

            parts.append(ema_of_params(train_config.ema_decay))
        self.optimizer = parts[0] if len(parts) == 1 else optax.chain(*parts)
        if train_config.grad_accum > 1:
            # average grads over K micro-batches per update; the inner
            # chain (clip/adam/ema and the LR-schedule counter) only
            # advances on real updates, so schedules count OPTIMIZER
            # steps, not micro-steps
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=train_config.grad_accum)
        self.params = params
        if mesh is not None and tensor_parallel:
            # commit params to the Megatron column/row layout on the
            # 'model' axis; the Adam moments mirror the params tree, so
            # the same path-suffix rule shards them identically (count
            # and other non-MLP leaves fall through to replicated)
            from pmhc_tpu.parallel.mesh import tp_param_shardings

            self.params = jax.device_put(
                self.params, tp_param_shardings(mesh, self.params)
            )
            opt_state = self.optimizer.init(self.params)
            self.opt_state = jax.device_put(
                opt_state, tp_param_shardings(mesh, opt_state)
            )
        elif mesh is not None:
            repl = replicated_sharding(mesh)
            self.params = jax.device_put(self.params, repl)
            self.opt_state = jax.device_put(
                self.optimizer.init(self.params), repl
            )
        else:
            self.opt_state = self.optimizer.init(self.params)
        self._step = make_train_step(
            model_config, diffusion_config, self.optimizer, mesh, precision,
            tensor_parallel, context_parallel,
        )
        self._scan_step = None
        self._device_scan_step = None
        self._eval_step = None
        self._precision = precision
        self.global_step = 0

    @property
    def ema_params(self):
        """EMA of the parameters (None unless TrainConfig.ema_decay is
        set); lives inside opt_state, see train/ema.py."""
        from pmhc_tpu.train.ema import extract_ema_params

        return extract_ema_params(self.opt_state)

    def train_batch(self, batch: Dict[str, Any], metrics=None):
        """One optimization step on a loader batch (tensor-7 frames)."""
        model_batch = prepare_batch(batch)
        batch_size = model_batch["mask"].shape[0]
        self.params, self.opt_state, self.key, sums = self._step(
            self.params, self.opt_state, model_batch, self.key
        )
        self.global_step += 1
        if metrics is not None:
            metrics.add_batch(sums, batch_size)
        return sums

    def eval_batch(self, batch: Dict[str, Any], key, metrics=None,
                   params=None):
        """Held-out loss on a loader batch (no gradient, no update; see
        ``make_eval_step``). Pass the same ``key`` per batch index every
        epoch for an epoch-comparable validation curve. ``params``
        overrides the trained weights (e.g. ``trainer.ema_params``)."""
        model_batch = prepare_batch(batch)
        if self._eval_step is None:
            import dataclasses

            eval_config = self.model_config
            if eval_config.backend in ("cp", "ring"):
                # the cp/ring backends bind a mesh axis and only run
                # inside the shard_map trainer; evaluation is a small,
                # single-pass workload — run it on the xla backend
                eval_config = dataclasses.replace(eval_config, backend="xla")
            self._eval_step = make_eval_step(
                eval_config, self.diffusion_config, self._precision)
        sums = self._eval_step(
            self.params if params is None else params, model_batch, key)
        if metrics is not None:
            metrics.add_batch(sums, model_batch["mask"].shape[0])
        return sums

    def train_indices(self, data, idx, metrics=None):
        """K optimization steps with batches GATHERED ON DEVICE from the
        resident packed dataset ``data`` inside the same dispatch
        (``make_train_scan_device``); ``idx`` is int32 [K, B]."""
        idx = jnp.asarray(idx, jnp.int32)
        if self._device_scan_step is None:
            self._device_scan_step = make_train_scan_device(
                self.model_config, self.diffusion_config, self.optimizer,
                self._precision,
            )
        self.params, self.opt_state, self.key, sums = self._device_scan_step(
            self.params, self.opt_state, data, idx, self.key
        )
        self.global_step += int(idx.shape[0])
        if metrics is not None:
            metrics.add_batch(
                jax.tree_util.tree_map(jnp.sum, sums),
                int(idx.shape[0]) * int(idx.shape[1]),
            )
        return sums

    def train_batches(self, batches, metrics=None):
        """K optimization steps in ONE device dispatch (lax.scan over the
        stacked batches) — semantically identical to K train_batch calls;
        amortizes the per-dispatch latency of remote TPU runtimes."""
        model_batches = [prepare_batch(b) for b in batches]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *model_batches
        )
        if self._scan_step is None:
            self._scan_step = make_train_scan(
                self.model_config,
                self.diffusion_config,
                self.optimizer,
                self.mesh,
                self._precision,
                self.tensor_parallel,
                self.context_parallel,
            )
        self.params, self.opt_state, self.key, sums = self._scan_step(
            self.params, self.opt_state, stacked, self.key
        )
        self.global_step += len(batches)
        if metrics is not None:
            batch_size = model_batches[0]["mask"].shape[0]
            metrics.add_batch(
                jax.tree_util.tree_map(jnp.sum, sums), batch_size * len(batches)
            )
        return sums
