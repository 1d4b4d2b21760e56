"""Determinism utilities: global seeding + JAX PRNG key threading.

Replaces the reference's global-seed ritual (``summer_clip/utils/trainer.py:113-122``,
which seeds python/numpy/torch and forces cuDNN-deterministic). On TPU/XLA,
computations are deterministic by construction; randomness is explicit via
``jax.random`` keys, which we thread through a small ``RngStream`` helper so
every consumer (data shuffling, gumbel noise, langevin noise, dropout) pulls
from a named, reproducible stream.
"""

from __future__ import annotations

import os
import random
import typing as tp

import numpy as np

__all__ = ["set_random_state", "RngStream", "new_key"]


def set_random_state(random_state: int) -> "jax.Array":  # noqa: F821
    """Seed python & numpy globals, return a root JAX PRNG key."""
    os.environ["PYTHONHASHSEED"] = str(random_state)
    random.seed(random_state)
    np.random.seed(random_state)
    import jax

    return jax.random.PRNGKey(random_state)


def new_key(seed: int) -> "jax.Array":  # noqa: F821
    import jax

    return jax.random.PRNGKey(seed)


class RngStream:
    """Named, splittable stream of PRNG keys.

    >>> rng = RngStream(0)
    >>> k1 = rng.next()          # fresh key
    >>> data_rng = rng.fork("data")  # independent named substream
    """

    def __init__(self, seed_or_key: tp.Union[int, "jax.Array"]):  # noqa: F821
        import jax

        self._jax = jax
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> "jax.Array":  # noqa: F821
        self._key, out = self._jax.random.split(self._key)
        return out

    def next_n(self, n: int) -> "jax.Array":  # noqa: F821
        keys = self._jax.random.split(self._key, n + 1)
        self._key = keys[0]
        return keys[1:]

    def fork(self, name: str) -> "RngStream":
        sub = self._jax.random.fold_in(self._key, abs(hash(name)) % (2 ** 31))
        return RngStream(sub)
