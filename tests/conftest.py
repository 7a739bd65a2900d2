"""Test harness: force an 8-device virtual CPU platform before jax imports.

Mesh/sharding logic is tested without TPUs per SURVEY §4: CPU backend with
``xla_force_host_platform_device_count=8``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import pytest

# Allow float64 in numerical parity tests (explicit float32 stays float32).
jax.config.update("jax_enable_x64", True)
# The axon sitecustomize registers the TPU tunnel and force-selects
# jax_platforms="axon,cpu" via jax.config (beating the env var) — pin the
# test platform back to the 8-device virtual CPU here.
jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _per_module_cleanup():
    """Per-module hygiene for one long pytest process.

    A full-suite run accumulates hundreds of compiled XLA executables and
    (from batching/serve tests) parked worker threads; past ~300 tests the
    XLA:CPU JIT segfaulted inside backend_compile_and_load (observed twice
    at tests/test_torch_parity.py on 2026-08-19). Dropping dead batcher
    workers and the executable cache between modules keeps process state
    bounded; each module recompiles what it actually uses.
    """
    yield
    try:
        from tbist_tpu.api import batching

        batching.close_all()
    except Exception:
        pass
    jax.clear_caches()
