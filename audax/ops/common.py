"""Shared kernel-dispatch helpers.

One platform policy for every Pallas-vs-XLA dispatcher (ops/attention.py,
ops/int4_matmul.py, frontend/features.py): the tunneled TPU plugin reports
``platform == "tpu"`` (verified on the axon v5e), so a single predicate
here keeps the default-backend decision from silently diverging between
kernels.
"""

from __future__ import annotations

import jax

__all__ = ["on_tpu", "pad_to"]


def on_tpu() -> bool:
    """True when the default JAX backend is a TPU (Pallas kernels apply)."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def pad_to(n: int, m: int) -> int:
    """Round ``n`` up to the next multiple of ``m``."""
    return ((n + m - 1) // m) * m
