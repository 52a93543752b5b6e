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

__all__ = ["trace", "time_fn", "flops_estimate_matmul", "slope_timed",
           "slope_timed_chained", "step_flops", "mfu", "V5E_PEAK_FLOPS"]


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


# v5e MXU peak (dense bf16 matmul) per chip; fp32-input matmuls lower to
# bf16 MXU passes under JAX's DEFAULT precision, so one reference peak is
# used for both dtypes. Multi-tenant tunnel caveat (CLAUDE.md): observed
# deliverable throughput swings ~4-10 TFLOP/s run to run, so MFU here is a
# lower bound on what a dedicated chip reaches.
V5E_PEAK_FLOPS = 197e12


def step_flops(jitted_fn, *args) -> float:
    """FLOPs of one compiled call, from XLA's own cost model
    (``compiled.cost_analysis()['flops']``); 0.0 when the backend does not
    expose cost analysis.

    WARNING: XLA counts a ``lax.scan`` body ONCE — on audax's scanned
    layer stacks this under-counts by ~the layer count (measured:
    whisper-small encoder reports ~1 layer's FLOPs; a CPU lowering shows
    stem + exactly one layer). For whisper train steps use the analytic
    ``audax.utils.flops.whisper_train_step_flops`` instead; this function
    is only trustworthy for unscanned programs (plain matmuls, pallas
    kernels wrapped in jit — though custom-call pallas FLOPs are also
    invisible to the cost model)."""
    try:
        cost = jitted_fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):        # older jax: one per device
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def mfu(flops_per_step: float, sec_per_step: float,
        n_chips: int = 1, peak: float = V5E_PEAK_FLOPS) -> Dict[str, float]:
    """{"achieved_tflops": per-chip delivered TFLOP/s, "mfu_pct": % of the
    v5e bf16 MXU peak}. Zeros when no FLOPs estimate is available."""
    if not flops_per_step or sec_per_step <= 0:
        return {"achieved_tflops": 0.0, "mfu_pct": 0.0}
    per_chip = flops_per_step / sec_per_step / max(n_chips, 1)
    return {"achieved_tflops": round(per_chip / 1e12, 2),
            "mfu_pct": round(100.0 * per_chip / peak, 2)}


def _two_length_slope(make, args, iters, repeats: int) -> float:
    """Shared slope-timing measurement: compile fori_loops of two lengths,
    take best-of-``repeats`` wall per length, return (t2-t1)/(n2-n1).
    One jitted call + one 4-byte fetch per measurement (tunnel-safe)."""
    f1, f2 = make(iters[0]), make(iters[1])
    np.asarray(f1(*args)); np.asarray(f2(*args))   # compile both
    best = []
    for f in (f1, f2):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            ts.append(time.perf_counter() - t0)
        best.append(min(ts))
    return (best[1] - best[0]) / (iters[1] - iters[0])


def slope_timed(fn, args, iters=(100, 1100), repeats: int = 5) -> float:
    """Per-op device latency (seconds) via slope timing: run the op in
    fori_loops of two lengths and take (t_long - t_short) / (n_long -
    n_short), cancelling dispatch + fetch overhead (one jitted call and a
    4-byte result fetch per measurement — the axon-tunnel-safe pattern).

    The loop CARRIES a perturbation of the first argument (`+ acc * 0.0`,
    unfoldable for floats) so XLA cannot hoist the otherwise
    loop-invariant op out of the loop — without it, hoisting produced
    negative slopes and skewed kernel A/Bs (ROADMAP #19). Best-of-
    ``repeats`` per loop length rides out multi-tenant chip variance.
    """
    import jax.numpy as jnp

    def make(nit):
        @jax.jit
        def run(*a):
            def body(i, acc):
                a0 = (a[0].astype(jnp.float32) + acc * 0.0
                      ).astype(a[0].dtype)
                return acc + fn(a0, *a[1:]).astype(jnp.float32).ravel()[0]
            return jax.lax.fori_loop(0, nit, body, jnp.float32(0))
        return run

    return _two_length_slope(make, args, iters, repeats)


def slope_timed_chained(fn, x0, extra=(), iters=(30, 230),
                        repeats: int = 3) -> float:
    """``slope_timed`` for SHAPE-PRESERVING ops, with the loop carry being
    the op's own output: ``x <- fn(x, *extra)``.

    This is the only trustworthy way to slope-time a bare matmul: the
    element-[0] accumulator in ``slope_timed`` lets XLA dead-code-narrow
    ``a @ w`` to a single row x column dot (observed: a narrowed probe
    reported 10 PFLOP/s, 50x hardware peak — ROADMAP #4). Chaining makes
    every element of every iteration load-bearing, and the data dependence
    doubles as the anti-hoisting perturbation. Keep ``fn``'s magnitudes
    stable (scale matmul weights by 1/sqrt(k)) so the bf16 carry stays
    finite — overflow would not slow the MXU, but finite values keep the
    final checksum meaningful.
    """
    import jax.numpy as jnp

    def make(nit):
        @jax.jit
        def run(x, *a):
            y = jax.lax.fori_loop(0, nit, lambda i, x: fn(x, *a), x)
            return y.ravel()[0].astype(jnp.float32)
        return run

    return _two_length_slope(make, (x0, *extra), iters, repeats)
