"""Test configuration: force CPU backend with 8 virtual devices and fp64.

Multi-device sharding tests run on a virtual CPU mesh (the reference project's
multi-GPU paths are likewise exercised with CUDA_VISIBLE_DEVICES subsets —
SURVEY.md §4.7); fp64 is required for the machine-precision energy oracle.
"""

import os

# force CPU even if the environment preselects a TPU platform (JAX_PLATFORMS
# may be preset to e.g. 'axon'); tests need fp64 + 8 virtual devices
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

# the axon TPU plugin overrides JAX_PLATFORMS; force CPU via config too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pffdtd_tpu.demo import make_shoebox_room as make_shoebox  # noqa: E402,F401


@pytest.fixture
def shoebox():
    return make_shoebox()
