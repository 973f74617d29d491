"""Seeded PRNG discipline.

The reference seeds torch + numpy RNGs globally (utils/global_utils.py:7-16);
in JAX randomness is explicit, so the equivalent is a key-splitting helper that
every component threads through. Host-side sampling (negative sampling, data
shuffling) uses seeded ``numpy.random.Generator`` exactly like the reference's
``default_rng`` usage.
"""

from __future__ import annotations

import jax
import numpy as np


def make_rngs(seed: int):
    """(jax key, numpy generator) pair from one integer seed."""
    return jax.random.PRNGKey(seed), np.random.default_rng(seed)


class KeyStream:
    """Stateful convenience wrapper: ``stream.next()`` yields fresh subkeys."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self, n: int = 1):
        keys = jax.random.split(self._key, n + 1)
        self._key = keys[0]
        if n == 1:
            return keys[1]
        return list(keys[1:])
