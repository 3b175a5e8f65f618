"""train_batches (scan of K steps, one dispatch) must match K sequential
train_batch calls exactly (same RNG advance per step)."""

import jax
import numpy as np

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.diffusion import DiffusionConfig
from pmhc_tpu.models import ScoreNetworkConfig
from pmhc_tpu.train import Trainer, TrainConfig

MODEL_CONFIG = ScoreNetworkConfig()
DIFF_CONFIG = DiffusionConfig(noise_step_count=10)


def test_train_batches_matches_sequential():
    batches = [synthetic_batch(batch_size=4, seed=s) for s in range(3)]

    t_seq = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=7))
    seq_sums = [t_seq.train_batch(b) for b in batches]

    t_scan = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=7))
    scan_sums = t_scan.train_batches(batches)

    for a, b in zip(
        jax.tree_util.tree_leaves(t_seq.params), jax.tree_util.tree_leaves(t_scan.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    for i, s in enumerate(seq_sums):
        np.testing.assert_allclose(
            float(s["total loss"]),
            float(np.asarray(scan_sums["total loss"])[i]),
            rtol=1e-5,
        )
    assert t_scan.global_step == 3


def test_default_precision_training_tracks_f32():
    """The backend-default-precision path (--bf16 / precision=None) must
    train the same trajectory as the f32-pinned path to coarse tolerance
    — this is the quality guarantee behind offering the throughput mode
    (measured on TPU: 500-step curves match to 3 decimals, held-out loss
    gap 0.072%; docs/status.md). Guards the precision plumbing through
    Trainer/make_train_scan."""
    batches = [synthetic_batch(batch_size=4, seed=s) for s in range(3)]

    t_f32 = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=7))
    t_fast = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=7), precision=None)

    for _ in range(3):
        for b in batches:
            s_f32 = t_f32.train_batch(b)
            s_fast = t_fast.train_batch(b)

    np.testing.assert_allclose(
        float(s_fast["total loss"]), float(s_f32["total loss"]), rtol=1e-2
    )


def test_train_batches_on_mesh():
    from pmhc_tpu.parallel import make_mesh

    mesh = make_mesh()
    batches = [synthetic_batch(batch_size=8, seed=s) for s in range(2)]
    trainer = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=8), mesh=mesh)
    sums = trainer.train_batches(batches)
    assert np.isfinite(np.asarray(sums["total loss"])).all()


def test_training_is_seed_deterministic():
    import numpy as np

    batches = [synthetic_batch(batch_size=4, seed=s) for s in range(2)]
    t_a = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=11))
    t_b = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=11))
    t_c = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=12))
    for b in batches:
        t_a.train_batch(b)
        t_b.train_batch(b)
        t_c.train_batch(b)
    for a, b in zip(
        jax.tree_util.tree_leaves(t_a.params), jax.tree_util.tree_leaves(t_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(c)).max())
        for a, c in zip(
            jax.tree_util.tree_leaves(t_a.params), jax.tree_util.tree_leaves(t_c.params)
        )
    ]
    assert max(diffs) > 0.0  # different seeds -> different trajectories


def test_train_batches_on_mesh_with_scan_matches_single_device():
    import numpy as np

    from pmhc_tpu.parallel import make_mesh

    batches = [synthetic_batch(batch_size=8, seed=s) for s in range(2)]
    t_single = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=13))
    t_mesh = Trainer(MODEL_CONFIG, DIFF_CONFIG, TrainConfig(seed=13), mesh=make_mesh())
    s1 = t_single.train_batches(batches)
    s2 = t_mesh.train_batches(batches)
    np.testing.assert_allclose(
        np.asarray(s1["total loss"]), np.asarray(s2["total loss"]), rtol=1e-4
    )
