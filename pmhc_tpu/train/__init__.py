"""Training engine: jitted+donated train step, optimizer, metrics, checkpoints."""

from pmhc_tpu.train.trainer import (
    Trainer,
    TrainConfig,
    make_eval_step,
    make_learning_rate,
    make_train_scan,
    make_train_step,
)
from pmhc_tpu.train.metrics import MetricsRecord

__all__ = [
    "Trainer",
    "TrainConfig",
    "make_eval_step",
    "make_learning_rate",
    "make_train_step",
    "make_train_scan",
    "MetricsRecord",
]
