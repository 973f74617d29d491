"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` per the JAX multi-host testing recipe.
Must run before jax is imported anywhere.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compilation cache: repeated test runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The hosted TPU plugin ignores the JAX_PLATFORMS env var; the config update
# is authoritative. Must happen before any computation runs.
import jax

jax.config.update("jax_platforms", "cpu")

import tempfile

import pytest


@pytest.fixture()
def work_dir(monkeypatch):
    """Hermetic work dir per test."""
    with tempfile.TemporaryDirectory() as tmp:
        monkeypatch.setenv("PYTORCHREC_TPU_WORK_DIR", tmp)
        yield tmp
