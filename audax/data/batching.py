"""Fixed-shape batching for jit: shuffled train batches, padded+masked eval.

XLA compiles one program per shape, so every batch must have the same static
shape. Training drops the trailing partial batch (one recompile avoided);
evaluation pads the final batch and carries a weight mask so padded rows
contribute zero loss and are stripped from predictions.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

__all__ = ["train_batches", "eval_batches", "num_train_batches"]


def num_train_batches(n: int, batch_size: int) -> int:
    return n // batch_size


def train_batches(arrays: Dict[str, np.ndarray], batch_size: int,
                  seed: int, epoch: int = 0) -> Iterator[Dict[str, np.ndarray]]:
    """Shuffled fixed-size batches; partial tail dropped. Deterministic in
    (seed, epoch)."""
    n = len(next(iter(arrays.values())))
    order = np.random.default_rng((seed, epoch)).permutation(n)
    for start in range(0, n - batch_size + 1, batch_size):
        idx = order[start:start + batch_size]
        yield {k: v[idx] for k, v in arrays.items()}


def eval_batches(arrays: Dict[str, np.ndarray], batch_size: int
                 ) -> Iterator[Dict[str, np.ndarray]]:
    """In-order fixed-size batches; final batch padded with row 0 and masked
    via the 'w' key (1.0 = real, 0.0 = padding)."""
    n = len(next(iter(arrays.values())))
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        batch = {k: v[start:end] for k, v in arrays.items()}
        w = np.ones(end - start, dtype=np.float32)
        if end - start < batch_size:
            pad = batch_size - (end - start)
            batch = {k: np.concatenate([v] + [v[:1]] * pad, axis=0)
                     for k, v in batch.items()}
            w = np.concatenate([w, np.zeros(pad, dtype=np.float32)])
        batch["w"] = w
        yield batch
