"""PRNG discipline.

The reference relies on global torch/np seeds (train_ddp.py:50-54) and
cudnn.determinism. JAX keys make determinism structural: every source of
randomness takes an explicit key derived from a single root seed, so runs are
reproducible by construction on any device count.
"""
from __future__ import annotations

import jax


class PRNGSeq:
    """A stateful convenience wrapper that hands out fresh subkeys.

    Host-side only (never use inside jit — pass keys explicitly there).
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int):
        self._key, *subs = jax.random.split(self._key, n + 1)
        return subs
