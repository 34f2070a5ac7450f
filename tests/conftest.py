"""Test configuration: force an 8-device virtual CPU mesh.

Tests never need the real TPU; sharding tests emulate multi-chip with
``--xla_force_host_platform_device_count=8`` (SURVEY.md section 4e).
"""
import os

# The environment exports JAX_PLATFORMS=axon (tunneled TPU); tests must run
# on local CPU, so force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

# Persistent compilation cache: kernel compiles (notably the push-relabel
# while-loop) dominate CPU test time otherwise.
import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
# so tests really run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DATA = pathlib.Path("/root/reference/data")

import pytest


@pytest.fixture(scope="session")
def cones_dir():
    d = REFERENCE_DATA / "MiddV2" / "cones"
    if not d.exists():
        pytest.skip("bundled MiddV2 cones data not available")
    return str(d)


@pytest.fixture(scope="session")
def tsukuba_dir():
    d = REFERENCE_DATA / "MiddV2" / "tsukuba"
    if not d.exists():
        pytest.skip("bundled MiddV2 tsukuba data not available")
    return str(d)
