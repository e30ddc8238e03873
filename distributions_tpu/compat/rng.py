"""Global entropy source for the compat facade.

The reference pairs a numpy RNG with a wrapped C++ rng_t in a singleton
(reference distributions/rng.py:36-47, distributions/global_rng.pyx:28-33).
Here the singleton holds one jax key, split on every consuming call —
the functional core itself never touches this (explicit keys only)."""

import jax


class GlobalRng(object):
    def __init__(self, seed=0):
        self._key = jax.random.PRNGKey(seed)

    def seed(self, seed):
        self._key = jax.random.PRNGKey(seed)

    def next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub


global_rng = GlobalRng()


def seed_all(seed):
    """Deterministic re-seed (analog of reference tests/util.py:50-57)."""
    global_rng.seed(seed)


def get_key():
    return global_rng.next_key()
