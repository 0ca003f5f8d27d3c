"""Test config: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices (the driver separately dry-runs
__graft_entry__.dryrun_multichip the same way).
"""

import os

# The environment pre-sets JAX_PLATFORMS=axon (tunneled real TPU) and the
# sitecustomize register() call re-forces it via jax.config — tests must run
# on host CPU (per-op round-trips over the tunnel are ~3.6 ms each), so
# override both the env var AND the config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: the integrative (slow-marked) tests compile
# full-cascade programs that cost minutes on CPU; caching makes every rerun
# after the first near-instant.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE = "/root/reference"
SHIPPED_BANK = (
    REFERENCE + "/config/data/boxNew_longDistance_linemod_xtion_renderer_params.yml"
)
STL_DIR = REFERENCE + "/config/stl"
