"""Opt-in LR schedules (warmup / cosine decay) — a deliberate extension;
the reference runs constant Adam lr (``optimize.py:32``). Defaults keep
the optimizer bit-identical to the pre-schedule one (a plain float lr)."""

import numpy as np
import pytest

import jax

from pmhc_tpu.data import synthetic_batch
from pmhc_tpu.diffusion import DiffusionConfig
from pmhc_tpu.models import ScoreNetworkConfig
from pmhc_tpu.train import Trainer, TrainConfig, make_learning_rate

MODEL_CONFIG = ScoreNetworkConfig()
DIFF_CONFIG = DiffusionConfig(noise_step_count=10)


def test_default_is_plain_float():
    lr = make_learning_rate(TrainConfig(learning_rate=3e-4))
    assert isinstance(lr, float) and lr == 3e-4


def test_warmup_only_schedule_values():
    sched = make_learning_rate(
        TrainConfig(learning_rate=1e-3, lr_warmup_steps=10))
    assert float(sched(0)) == 0.0
    assert float(sched(5)) == pytest.approx(5e-4)
    assert float(sched(10)) == pytest.approx(1e-3)
    assert float(sched(10_000)) == pytest.approx(1e-3)


def test_warmup_cosine_schedule_values():
    sched = make_learning_rate(TrainConfig(
        learning_rate=1e-3, lr_warmup_steps=10, lr_decay_steps=100,
        lr_final=1e-5))
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1e-3)
    # midpoint of the cosine leg: halfway between peak and final
    assert float(sched(55)) == pytest.approx((1e-3 + 1e-5) / 2, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1e-5, rel=1e-3)
    assert float(sched(1000)) == pytest.approx(1e-5, rel=1e-3)


def test_decay_horizon_must_exceed_warmup():
    with pytest.raises(ValueError):
        make_learning_rate(TrainConfig(lr_warmup_steps=10, lr_decay_steps=5))


def test_trainer_warmup_first_step_is_identity():
    # linear warmup starts at lr=0: the first optimizer step must leave
    # the params bit-unchanged, and later steps must move them
    batch = synthetic_batch(batch_size=8, seed=0)
    trainer = Trainer(MODEL_CONFIG, DIFF_CONFIG,
                      TrainConfig(seed=1, lr_warmup_steps=4))
    before = jax.tree.map(np.asarray, trainer.params)
    trainer.train_batch(batch)
    after_1 = jax.tree.map(np.asarray, trainer.params)
    flat = lambda t: np.concatenate(
        [x.ravel() for x in jax.tree.leaves(t)])
    assert np.array_equal(flat(before), flat(after_1))
    trainer.train_batch(batch)
    after_2 = jax.tree.map(np.asarray, trainer.params)
    assert not np.array_equal(flat(after_1), flat(after_2))
