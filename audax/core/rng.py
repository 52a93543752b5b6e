"""Deterministic PRNG-key plumbing.

JAX's functional PRNG replaces the reference's implicit torch global RNG.
Every stochastic subsystem takes an explicit key; these helpers make the
common patterns (named folds, per-step keys) one-liners.
"""

from __future__ import annotations

from typing import Dict, Iterator, Sequence

import jax

__all__ = ["key", "split_named", "per_step"]


def key(seed: int = 0) -> jax.Array:
    return jax.random.key(seed)


def split_named(rng: jax.Array, names: Sequence[str]) -> Dict[str, jax.Array]:
    """Split a key into a dict of named keys (order-independent by folding
    a stable hash of each name, so adding a consumer never reshuffles others)."""
    out = {}
    for name in names:
        folded = rng
        for ch in name:
            folded = jax.random.fold_in(folded, ord(ch))
        out[name] = folded
    return out


def per_step(rng: jax.Array, step: int) -> jax.Array:
    return jax.random.fold_in(rng, step)


def stream(rng: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys (host-side loops only; not jittable)."""
    i = 0
    while True:
        yield jax.random.fold_in(rng, i)
        i += 1
