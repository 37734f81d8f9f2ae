"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
import so multi-chip sharding paths are exercised without TPU hardware
(the TPU substitute for multi-node tests without a cluster; SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# persistent compilation cache: repeated test runs skip recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's TPU plugin (sitecustomize) re-registers its platform and
# overrides JAX_PLATFORMS, so the env var alone is not enough — force the
# virtual 8-device CPU mesh through the config API after import.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
