"""Deterministic PRNG handling.

The reference pins global seeds (`attack_main2.py:39-44`, seed 123456789) and
disables generator noise randomisation everywhere.  In JAX randomness is
explicit: one root key, split per consumer.  ``PRNGPool`` is a tiny helper for
imperative driver code (CLI layers) that hands out fresh subkeys; compiled code
always takes keys as arguments.
"""

from __future__ import annotations

import jax
import numpy as np


GLOBAL_SEED = 123456789  # mirrors reference setup_seed(123456789)


class PRNGPool:
    """Imperative stream of PRNG subkeys for host-side driver code."""

    def __init__(self, seed: int = GLOBAL_SEED):
        self._key = jax.random.key(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return list(subs)


def seed_everything(seed: int = GLOBAL_SEED) -> PRNGPool:
    """Seed numpy (host-side shuffles) and return a device PRNG pool."""
    np.random.seed(seed)
    return PRNGPool(seed)
