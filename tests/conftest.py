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

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
# so tests really run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Every compiled executable leaks memory mappings in this environment
# (~25k maps by mid-suite, measured via /proc/self/maps); when the process
# hits the kernel's vm.max_map_count (default 65530), jaxlib segfaults on
# the failed mmap inside backend_compile_and_load / the persistent-cache
# (de)serializer — whichever heavy test lands ~2/3 through the suite.
# Raise the kernel limit when permitted (tests run as root here), and keep
# a belt-and-braces pressure valve that drops live executables before the
# ceiling.
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _cur = int(_f.read())
    if _cur < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("262144")
except OSError:  # not privileged / not Linux — rely on the valve below
    pass

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_DATA = pathlib.Path("/root/reference/data")

import pytest


@pytest.fixture(autouse=True)
def _map_pressure_valve():
    """Drops live executables before the kernel mapping ceiling (see the
    vm.max_map_count note above) — only fires under pressure, so warm
    in-process jit caches survive normal runs."""
    yield
    try:
        with open("/proc/self/maps") as f:
            n = sum(1 for _ in f)
    except OSError:
        return
    if n > 50000:
        jax.clear_caches()


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
