"""Determinism utilities.

The reference seeds four global RNGs (`seed_everything`, reference:
utils.py:23-28) because torch generators are hidden mutable state.  In JAX
all randomness flows through explicit keys, so determinism holds by
construction — this module provides the key-derivation conventions plus a
compatibility `seed_everything` that pins the remaining host-side RNGs
(numpy / python random) used by data loading."""

from __future__ import annotations

import random

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Pin host RNGs and return the root jax key for the run."""
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.key(seed)


def run_keys(seed: int, *names: str) -> dict[str, jax.Array]:
    """Named, collision-free subkeys for a run: fold each purpose name's
    hash into the root key so adding a consumer never shifts the others
    (unlike sequential split)."""
    root = jax.random.key(seed)
    return {n: jax.random.fold_in(root, abs(hash(n)) % (2**31)) for n in names}
