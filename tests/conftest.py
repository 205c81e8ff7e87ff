"""Test configuration: force a virtual 8-device CPU mesh before jax imports.

Multi-device sharding tests run against this CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8); real-TPU execution is
exercised by bench.py / __graft_entry__.py outside the test suite.
"""

import os

# NOTE: this environment pre-imports jax (sitecustomize registers the TPU
# plugin), so env vars alone are too late; jax.config.update below actually
# switches the platform.  XLA_FLAGS still works because the CPU client
# initializes lazily.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Double precision on the CPU test mesh so math tests can check tight
# tolerances; the library itself is dtype-explicit and runs f32 on TPU.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _isolated_compile_cache(tmp_path_factory):
    """Point any in-test enable_compilation_cache() at a throwaway dir.

    The CLI (tpu3drecon/cli.py) enables jax's persistent compilation cache;
    once test_cli runs it in-process the config sticks for the REST of the
    suite, and sharing the repo-level .jax_cache with concurrently-running
    bench/experiment processes segfaulted a suite run (corrupt zstd entry
    read in jax's cache loader).  Tests must never touch the shared cache.
    """
    os.environ["TPU3DRECON_CACHE_DIR"] = str(
        tmp_path_factory.mktemp("jax_cache")
    )
    yield
    os.environ.pop("TPU3DRECON_CACHE_DIR", None)
