"""Test configuration: force a virtual 8-device CPU mesh so sharding/pjit code
is exercised without TPU hardware (SURVEY.md §4 test plan)."""

import os

# The session environment pins JAX_PLATFORMS=axon (real TPU); tests must run on
# the virtual CPU mesh, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# A pytest plugin may import jax before this conftest, baking JAX_PLATFORMS=axon
# into the config; update the live config as well.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the model graphs contain hundreds of distinct
# 3D convs; caching makes repeat test runs dramatically faster.
from pathlib import Path

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
