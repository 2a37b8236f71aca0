"""Seeded jax.random key plumbing.

Replaces the reference's global-state seeding (module/utils.py:232-236,
OpenKE base/Random.h) with explicit, splittable PRNG keys so every jitted
step is reproducible and device-placement-independent.
"""

from __future__ import annotations

import jax


class RngStream:
    """A stateful convenience wrapper handing out fresh subkeys.

    Host-side only; inside jitted code keys are threaded explicitly.
    """

    def __init__(self, seed: int):
        self._key = jax.random.key(seed)

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def next_n(self, n: int) -> jax.Array:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return jax.numpy.stack(subs)
