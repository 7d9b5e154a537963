"""Determinism utilities: JAX PRNG key threading + numpy seeding.

TPU-native replacement for the reference's `plotpointe/utils/random.py:15-44`
(cuDNN/cuBLAS determinism knobs). On TPU, determinism is the default under a
fixed PRNG key: XLA compiles a fixed program, and all randomness is explicit
via `jax.random` keys. There is nothing to "enable" — we only provide seeding
helpers and a key sequencer so call sites never reuse keys.
"""
from __future__ import annotations

import random as _pyrandom
from typing import Iterator

import numpy as np

import jax


def set_seeds(seed: int) -> jax.Array:
    """Seed python + numpy global RNGs (host-side preprocessing) and return a
    root JAX key for all device-side randomness."""
    _pyrandom.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


def key_seq(root: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh subkeys derived from `root`.

    Usage:
        keys = key_seq(set_seeds(42))
        k1 = next(keys); k2 = next(keys)
    """
    i = 0
    while True:
        yield jax.random.fold_in(root, i)
        i += 1


def host_rng(seed: int) -> np.random.Generator:
    """Dedicated numpy Generator for host-side sampling (splits, synthetic data)."""
    return np.random.default_rng(seed)
