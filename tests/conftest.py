"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/collective tests need multiple devices; real multi-chip hardware is
not available here, so we ask XLA for 8 host-platform devices.  Must run
before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # env pre-sets 'axon'; tests must be CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var — the config update
# after import is what actually forces the CPU backend here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: CPU test compiles are the dominant cost.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax.random as jr

    return jr.key(0)


def _slow_manifest() -> set:
    """Measured-slow nodeids (tests/slow_manifest.txt): tests whose call
    time was >=5 s on the 1-core reference box in a full --durations run.
    Applied as the `slow` marker so `pytest -m "not slow"` is a <5-min
    per-commit tier.  Regenerate after big suite changes:

        python -m pytest tests/ -q --durations=0 > /tmp/durations.log
        python tools/update_slow_manifest.py /tmp/durations.log

    New tests default to the fast tier until re-measured.
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "slow_manifest.txt")
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return {ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")}


def pytest_collection_modifyitems(config, items):
    manifest = _slow_manifest()
    if not manifest:
        return
    for item in items:
        if item.nodeid in manifest:
            item.add_marker(pytest.mark.slow)
