"""Test configuration: force CPU with 8 virtual devices.

The standard JAX trick for exercising Mesh/shard_map code without real
multi-chip hardware (SURVEY.md §4 tier 4): all tests run on a virtual
8-device CPU topology so data-parallel sharding tests can assert
grad-parity against single-device execution.

This environment's sitecustomize imports jax at interpreter startup (to
register the axon TPU plugin), so JAX_PLATFORMS is already latched by the
time conftest runs — env vars are too late; the config must be updated
programmatically, BEFORE any backend initializes.
"""

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    # fail fast if the virtual CPU mesh did not come up: silently running
    # the suite on one real TPU chip makes every run minutes slower and
    # voids the multi-device tests.
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()
