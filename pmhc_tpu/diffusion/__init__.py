"""Diffusion engine: schedule, forward/reverse processes, loss, sampler.

TPU-native twin of the reference ``DiffusionModelOptimizer``
(``diffusion/optimizer.py:27-252``), decomposed into pure functions:
the train step jits+donates as one function and the T-step ancestral
sampler is a single ``lax.scan`` (the reference runs a host Python loop
with one dispatch per step).
"""

from pmhc_tpu.diffusion.schedule import (
    DiffusionConfig, ScheduleTables, StridedTables, strided_timesteps,
)
from pmhc_tpu.diffusion.noise import (
    gen_noise, add_noise, remove_noise, remove_noise_scalars,
)
from pmhc_tpu.diffusion.loss import diffusion_loss
from pmhc_tpu.diffusion.sampler import sample, sample_sharded

__all__ = [
    "DiffusionConfig",
    "ScheduleTables",
    "StridedTables",
    "strided_timesteps",
    "gen_noise",
    "add_noise",
    "remove_noise",
    "remove_noise_scalars",
    "diffusion_loss",
    "sample",
    "sample_sharded",
]
