"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; per the project plan, sharding is
validated on a virtual 8-device CPU mesh and Pallas kernels run in
interpreter mode (the analogue of RadX's 'universal' fallback variant).
Must set env vars before jax is imported anywhere.
"""

import os

# Force the CPU backend even when the axon TPU relay is configured in the
# environment (sitecustomize registers it whenever PALLAS_AXON_POOL_IPS is
# set, and it overrides JAX_PLATFORMS).
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# sitecustomize (axon relay) may already have imported jax and pointed it at
# the TPU tunnel; override back to CPU before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x5ADF00D)


# --- test tiers -------------------------------------------------------------
# tests/slow_tests.txt lists node ids measured >= ~4 s in interpret mode
# (regenerate from `pytest --durations=0` output); they get the `slow`
# marker so `pytest -m "not slow"` is the fast default tier.  Explicit
# in-file @pytest.mark.slow marks (multi-process, big-shape) still apply.
import pathlib

_SLOW_MANIFEST = pathlib.Path(__file__).parent / "slow_tests.txt"
_SLOW_IDS = frozenset(
    line.strip()
    for line in _SLOW_MANIFEST.read_text().splitlines()
    if line.strip()
) if _SLOW_MANIFEST.exists() else frozenset()


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.nodeid in _SLOW_IDS:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="function")
def _clear_jax_caches():
    """Interpret-mode executables are large; accumulated compiler state in
    one process eventually aborts/segfaults inside XLA:CPU's
    backend_compile (observed at module scope as a Fatal Python abort on
    the last test of test_aggregate).  Per-test clearing costs ~15% wall
    and removes the crash class."""
    yield
    jax.clear_caches()
