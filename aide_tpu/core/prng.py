"""Explicit PRNG key threading.

Replaces the reference's global seeding soup (torch/np/random seeds at
/root/reference/train_files/trainchaos_proposed_30cases1labeled.py:159-164)
with functional `jax.random` keys: one root key per experiment, folded per
epoch / per step / per purpose, making every run reproducible bit-for-bit
regardless of host thread scheduling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def epoch_key(key: jax.Array, epoch: int) -> jax.Array:
    return jax.random.fold_in(key, epoch)


def step_key(key: jax.Array, step: int) -> jax.Array:
    return jax.random.fold_in(key, step)


def split_tree(key: jax.Array, names):
    """Named key split: returns {name: key} for a stable iteration order."""
    names = list(names)
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def host_rng(seed: int):
    """NumPy generator for host-side decisions (shuffling manifests)."""
    import numpy as np

    return np.random.default_rng(seed)
