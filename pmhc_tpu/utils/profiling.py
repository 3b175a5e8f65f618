"""Tracing / profiling / numerical-debug hooks (SURVEY.md §5).

The reference has no profiling at all (log-timestamp debugging only) and
guards numerics with ``torch.autograd.detect_anomaly`` behind ``--debug``.
TPU-native equivalents:

- ``profile_trace``: context manager around ``jax.profiler.trace`` writing
  a TensorBoard-compatible trace (op/kernel timeline, HBM usage);
- ``enable_nan_debugging``: turns on ``jax_debug_nans`` so any NaN raises
  at the producing op (the analogue of detect_anomaly + the NaN-loss
  abort, ``optimize.py:41-42``, ``optimizer.py:217-218``).
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace under ``log_dir`` (view with TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
