"""Observability and debugging utilities."""

from pmhc_tpu.utils.profiling import profile_trace, enable_nan_debugging

__all__ = ["profile_trace", "enable_nan_debugging"]
