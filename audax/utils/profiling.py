"""Profiling/tracing utilities.

The reference had no profiler integration (SURVEY.md §5 — tqdm bars and
static reports only). Here: ``trace()`` wraps ``jax.profiler`` (view in
TensorBoard / xprof), and ``time_fn`` measures steady-state step time with
correct device synchronization — on tunneled TPU backends
``block_until_ready`` does not block, so timing dispatches N calls and
forces completion through a host fetch. The fetch is a jitted 4-byte
checksum that depends on the result: fetching the full output would time
the tunnel's transfer rate (~35 MB/s), not the device.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict

import jax
import numpy as np

__all__ = ["trace", "time_fn", "flops_estimate_matmul"]


@contextlib.contextmanager
def trace(logdir: str = "artifacts/trace"):
    """``with trace("dir"):`` captures a jax.profiler trace of the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@jax.jit
def _checksum(x):
    import jax.numpy as jnp
    return jnp.sum(x.ravel()[::257].astype(jnp.float32))


def _sync(result: Any) -> None:
    """Force completion of ``result``'s dispatch chain by fetching a scalar
    reduction of it (full-array fetches over the axon tunnel cost seconds)."""
    leaves = jax.tree.leaves(result)
    if leaves:
        np.asarray(_checksum(leaves[0]))


def time_fn(fn: Callable, *args, iters: int = 20, warmup: int = 2,
            **kwargs) -> Dict[str, float]:
    """Steady-state wall time per call (seconds) with fetch-based sync."""
    result = None
    for _ in range(max(warmup, 1)):
        result = fn(*args, **kwargs)
    _sync(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    _sync(result)
    dt = (time.perf_counter() - t0) / iters
    return {"seconds_per_call": dt, "calls_per_second": 1.0 / dt}


def flops_estimate_matmul(m: int, n: int, k: int) -> int:
    return 2 * m * n * k
