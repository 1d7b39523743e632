"""PRNG-key discipline and global seeding.

The reference globally seeds python/numpy/torch + cuDNN deterministic flags
(``utils/training_utils.py:6-33``). JAX is functional: randomness flows through
explicit ``jax.random`` keys. We keep a thin ``set_seed`` for host-side numpy /
python RNGs (used in chunk shuffling, bootstrap resampling) and provide a
``KeySeq`` helper that hands out fresh subkeys without reuse.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int, deterministic: bool = False) -> jax.Array:
    """Seed host RNGs and return a root JAX PRNG key.

    ``deterministic`` enables XLA's deterministic-ops mode (slower, bitwise
    reproducible reductions) — the analogue of the reference's cuDNN
    deterministic switch.
    """
    random.seed(seed)
    np.random.seed(seed)
    if deterministic:
        # xla_gpu flag is ignored on TPU; TPUs are deterministic by default
        # for the ops used here. Kept for API parity.
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    return jax.random.PRNGKey(seed)


class KeySeq:
    """Stateful convenience wrapper handing out fresh subkeys.

    Host-side only (never trace through this); inside jitted code split keys
    explicitly.
    """

    def __init__(self, key_or_seed: jax.Array | int):
        if isinstance(key_or_seed, int):
            key_or_seed = jax.random.PRNGKey(key_or_seed)
        self._key = key_or_seed

    def next(self, n: int | None = None):
        if n is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
