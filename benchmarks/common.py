"""Shared benchmark plumbing — the ONE definition of the pieces every
script in this directory used to copy:

- :func:`setup_cache` — persistent-compile-cache config (CPU-tiny runs
  share the test suite's cache; TPU runs use the repo-level TPU cache);
- :func:`bf16_params` — pre-cast f32 leaves of a params tree to bf16;
- :func:`timed_median` — warm once, then median-of-3 timed loops with a
  SCALAR FETCH as the completion barrier (`jax.block_until_ready` does
  not synchronise through the axon tunnel — docs/DESIGN.md §9).

Import from scripts as ``from benchmarks.common import ...`` (every
script already inserts the repo root on sys.path).
"""

from __future__ import annotations

import os
import time


def setup_cache(*, tiny: bool = False, min_compile_secs: float = 1.0) -> str:
    """Configure jax's persistent compile cache; returns the cache dir.

    ``tiny=True`` also forces the CPU backend (the axon TPU plugin ignores
    the JAX_PLATFORMS env var — config must be set in-process) and shares
    the test suite's cache so smoke runs hit warm compiles.
    """
    import jax

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        cache = os.path.join(root, "tests/.jax_cache")
    else:
        cache = os.path.join(root, ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache


def bf16_params(tree):
    """Cast every f32 leaf to bf16 (params pre-cast lever)."""
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)


def _fetch_scalar(out) -> float:
    """Completion barrier: pull ONE scalar to host (tunnel-reliable)."""
    import jax

    return float(jax.tree.leaves(out)[0].ravel()[0])


def timed_median(fn, *args, calls: int = 10, reps: int = 3) -> float:
    """Warm+compile once, then ``reps`` timed loops of ``calls`` calls;
    returns the median per-call seconds."""
    out = fn(*args)
    _fetch_scalar(out)
    times = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(calls):
            out = fn(*args)
        _fetch_scalar(out)
        times.append((time.time() - t0) / calls)
    return sorted(times)[len(times) // 2]
