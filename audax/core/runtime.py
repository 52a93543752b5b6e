"""Process-level JAX runtime setup.

Centralizes knobs every entry point wants:
  * persistent compilation cache — first compile of each program is slow on
    TPU (and extremely slow over a tunneled device); caching makes reruns
    start in seconds,
  * optional CPU pinning for host-only tools.

Call ``setup()`` once at entry (CLI main, bench.py, training scripts). Safe
to call multiple times.

NOTE for this environment: the tunneled "axon" TPU platform dispatches each
eager op with ~0.5 s latency — *everything* hot must live under ``jax.jit``
(including ``model.init``), and timings must synchronize via a host fetch
because ``block_until_ready`` does not block there.
"""

from __future__ import annotations

import os

_DONE = False


def setup(*, cpu: bool = False, cache_dir: str | None = None) -> None:
    global _DONE
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if not _DONE:
        cache = (cache_dir or os.environ.get("AUDAX_JAX_CACHE")
                 or os.path.expanduser("~/.cache/audax_jax_cache"))
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:  # cache flags unavailable on exotic builds
            pass
        _DONE = True
