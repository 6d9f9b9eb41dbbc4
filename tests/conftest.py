"""Test config: force an 8-device virtual CPU mesh before JAX import.

Multi-chip sharding tests run against this virtual mesh
(xla_force_host_platform_device_count), per the driver contract; real-TPU
benches go through bench.py instead.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: the session env pins the TPU platform
os.environ["SIXDOF_AOT_CACHE"] = ""  # no executable-cache writes from tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The session environment wires an 'axon' TPU platform plugin that wins over
# the env var; override at the config level before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
