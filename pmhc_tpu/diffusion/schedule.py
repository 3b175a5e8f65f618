"""Noise schedule: linear beta with VDM-style direct interpolation.

The reference schedule (``diffusion/optimizer.py:20-25,81-91``) is NOT a
cumulative DDPM product: ``add_noise`` jumps x0 -> z_t in one step with
beta(t) = beta_min + (beta_max - beta_min) * t/T, alpha = sqrt(1 - beta),
sigma = sqrt(beta) (SURVEY.md §3.5.6). ``pow_schedule`` exists in the
reference as dead code (``optimizer.py:23-25``); provided here as a
selectable option.

TPU design: all per-step scalars — including the sampler's derived
alpha_ts / sigma_ts / sigma_t2s chain (``optimizer.py:153-157``) — are
precomputed on the host in float64 (matching the reference's Python-float
math) and stored as f32 device tables; inside jit they are O(1) gathers by
a traced timestep, so one compiled train step serves every t and the
sampler scans over a table instead of re-deriving scalars per step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DiffusionConfig:
    """Engine hyperparameters; defaults are the reference's hard-coded
    values (``optimizer.py:35-36,74,97``, ``optimize.py:29``)."""

    noise_step_count: int = 1000  # T
    beta_min: float = 0.0
    beta_max: float = 0.8
    schedule: str = "linear"  # "linear" | "pow" (reference's dead pow_schedule)
    schedule_pow: float = 2.0
    position_noise_scale: float = 5.0  # gen_noise trans stddev (optimizer.py:97)
    # total-loss weights (reference hard-codes 0.1/1/1, optimizer.py:74)
    position_loss_weight: float = 0.1
    rotation_loss_weight: float = 1.0
    torsion_loss_weight: float = 1.0
    # reference quirk: one random timestep per BATCH, not per sample
    # (optimizer.py:197, SURVEY.md §3.5.2); set False for the (better)
    # per-sample variant — a documented deviation.
    t_per_batch: bool = True


class ScheduleTables:
    """Precomputed f32 schedule tables, indexable by traced timesteps.

    Index range [0, T]: the reference's sampler calls the model and the
    schedule at t = T (``optimizer.py:236-244``) even though training only
    draws t in [0, T-1] — SURVEY.md §3.5.2, preserved.
    """

    def __init__(self, config: DiffusionConfig):
        T = config.noise_step_count
        t = np.arange(T + 1, dtype=np.float64)
        frac = t / T
        if config.schedule == "pow":
            frac = frac ** config.schedule_pow
        beta = config.beta_min + (config.beta_max - config.beta_min) * frac
        alpha = np.sqrt(1.0 - beta)
        sigma = np.sqrt(beta)

        # sampler step t -> s = t-1 constants (optimizer.py:153-157),
        # defined for t in [1, T]; index 0 is padding (never used).
        alpha_ts = np.ones_like(alpha)
        alpha_ts[1:] = alpha[1:] / alpha[:-1]
        sqr_sigma_ts = np.zeros_like(sigma)
        sqr_sigma_ts[1:] = sigma[1:] ** 2 - sigma[:-1] ** 2 * alpha_ts[1:]
        sigma_ts = np.sqrt(np.maximum(sqr_sigma_ts, 0.0))
        sigma_t2s = np.zeros_like(sigma)
        # sigma_t2s = sigma_ts * sigma_s / sigma_t; sigma_t=0 only at t=0
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma_t2s[1:] = sigma_ts[1:] * sigma[:-1] / np.where(sigma[1:] > 0, sigma[1:], 1.0)

        self.beta = jnp.asarray(beta, jnp.float32)
        self.alpha = jnp.asarray(alpha, jnp.float32)
        self.sigma = jnp.asarray(sigma, jnp.float32)
        self.alpha_ts = jnp.asarray(alpha_ts, jnp.float32)
        self.sqr_sigma_ts = jnp.asarray(sqr_sigma_ts, jnp.float32)
        self.sigma_ts = jnp.asarray(sigma_ts, jnp.float32)
        self.sigma_t2s = jnp.asarray(sigma_t2s, jnp.float32)

    def beta_alpha_sigma(self, t):
        """(beta, alpha, sigma) at (possibly traced) timestep t.
        Mirrors ``optimizer.py:81-91``."""
        return self.beta[t], self.alpha[t], self.sigma[t]


def strided_timesteps(T: int, num_steps: int) -> np.ndarray:
    """Descending timestep grid T = t_0 > t_1 > ... > t_K = 0.

    ``num_steps`` is the number of reverse jumps (model evaluations);
    ``num_steps == T`` reproduces the reference's full chain T, T-1, ..., 0.
    Grid points are evenly spaced in t and deduplicated, so K may come out
    slightly below ``num_steps`` for non-divisors.
    """
    if not 1 <= num_steps <= T:
        raise ValueError(f"num_steps must be in [1, {T}], got {num_steps}")
    ts = np.unique(np.round(np.linspace(0.0, T, num_steps + 1)).astype(np.int64))
    return ts[::-1].copy()


class StridedTables:
    """Per-jump reverse-step scalars for an arbitrary descending t-grid.

    Generalizes ``ScheduleTables``'s s = t-1 pairing: the reference's
    ``remove_noise`` derivation (``optimizer.py:153-157``) is parameterized
    by arbitrary (t, s) — alpha_ts = alpha_t/alpha_s, sigma_ts^2 =
    sigma_t^2 - sigma_s^2 * alpha_ts, sigma_t2s = sigma_ts * sigma_s /
    sigma_t — and the reference only ever calls it with s = t-1
    (``optimizer.py:243``). Evaluating the same formulas on a strided grid
    yields the few-step ancestral sampler (``--sample-steps``): T/K fewer
    model forwards per trajectory. Scalars are computed in float64 on the
    host (like ``ScheduleTables``) and stored as f32 [K] device tables
    indexed by the jump number k; ``ts[k]`` is the model-evaluation
    timestep of jump k (t_0 = T preserves the t = T quirk, SURVEY.md
    §3.5.2).
    """

    def __init__(self, config: DiffusionConfig, ts: np.ndarray):
        ts = np.asarray(ts, np.int64)
        T = config.noise_step_count
        if ts[0] != T or ts[-1] != 0 or np.any(np.diff(ts) >= 0):
            raise ValueError(
                f"ts must descend from T={T} to 0, got {ts[:3]}..{ts[-3:]}"
            )
        frac = ts.astype(np.float64) / T
        if config.schedule == "pow":
            frac = frac ** config.schedule_pow
        beta = config.beta_min + (config.beta_max - config.beta_min) * frac
        alpha = np.sqrt(1.0 - beta)
        sigma = np.sqrt(beta)

        # jump k: t = ts[k] (model eval), s = ts[k+1]
        alpha_ts = alpha[:-1] / alpha[1:]
        sqr_sigma_ts = sigma[:-1] ** 2 - sigma[1:] ** 2 * alpha_ts
        sigma_ts = np.sqrt(np.maximum(sqr_sigma_ts, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            sigma_t2s = sigma_ts * sigma[1:] / np.where(
                sigma[:-1] > 0, sigma[:-1], 1.0
            )

        self.num_jumps = len(ts) - 1
        self.ts = jnp.asarray(ts[:-1], jnp.int32)
        self.beta_t = jnp.asarray(beta[:-1], jnp.float32)
        self.sigma_t = jnp.asarray(sigma[:-1], jnp.float32)
        self.beta_s = jnp.asarray(beta[1:], jnp.float32)
        self.alpha_ts = jnp.asarray(alpha_ts, jnp.float32)
        self.sqr_sigma_ts = jnp.asarray(sqr_sigma_ts, jnp.float32)
        self.sigma_t2s = jnp.asarray(sigma_t2s, jnp.float32)

    def scalars(self, k):
        """The 6 reverse-step scalars of jump k (traced OK), in
        ``remove_noise_scalars`` argument order."""
        return (self.beta_t[k], self.sigma_t[k], self.beta_s[k],
                self.alpha_ts[k], self.sqr_sigma_ts[k], self.sigma_t2s[k])
