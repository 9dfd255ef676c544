"""Params pytree save/restore (.npz) — the framework-side checkpointing the
reference lacks (its model side is load-only, SURVEY §5): persist converted
or trained variables so a pipeline can resume without re-conversion.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            flat.update(_flatten(v, key))
        return flat
    flat[prefix] = np.asarray(tree)
    return flat


def save_pytree(tree, path: str) -> str:
    """Save a pytree as a flat npz; returns the path ACTUALLY written —
    np.savez appends '.npz' to extension-less paths, so returning the
    input verbatim would point at a nonexistent file (and misplace any
    sidecar derived from it)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, **_flatten(jax.device_get(tree)))
    return path


def load_pytree(path: str) -> dict:
    with np.load(path) as data:
        flat = {k: jnp.asarray(v) for k, v in data.items()}
    tree: dict = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree
