"""Test configuration: force CPU with 8 virtual devices.

The standard JAX trick for exercising Mesh/shard_map code without real
multi-chip hardware (SURVEY.md §4 tier 4): all tests run on a virtual
8-device CPU topology so data-parallel sharding tests assert
grad-parity against single-device execution.

Must run before jax initializes its backends, hence env vars at import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
