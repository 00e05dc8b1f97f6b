"""Test environment: CPU backend with 8 fake devices for sharding tests.

Must run before any jax import (pytest imports conftest first). The tunneled
TPU backend compiles every eager op (~0.5 s each) and admits one process at
a time, so tests run on CPU; TPU behaviour is covered by bench.py and the
driver's compile checks.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".cache", "jax-cpu"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tiny_sequence():
    """Small cached synthetic sequence shared across tests."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    from experiment import get_sequence

    return get_sequence("arc", 15, 0)
