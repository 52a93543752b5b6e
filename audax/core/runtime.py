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

import hashlib
import os

_DONE = False


def _host_fingerprint() -> str:
    """Short hash of the host CPU's identity (model + ISA flags).

    XLA:CPU persists AOT-compiled executables whose code is specialized to
    the *compiling* machine's ISA features; loading them on a different
    host is at best slow and at worst fatal (observed: a cache carried
    across hosts made a virtual-device collective rendezvous miss its 40 s
    hard deadline and abort the process — the cache loader itself warns
    "could lead to execution errors such as SIGILL"). JAX's cache key does
    not include the host ISA, so we fold it into the cache *path*: each
    distinct machine gets its own cache and cross-host reuse can't happen.
    """
    try:
        with open("/proc/cpuinfo") as f:
            lines = [ln for ln in f.read().splitlines()
                     if ln.startswith(("model name", "flags"))]
        ident = "\n".join(sorted(set(lines))) or "unknown"
    except OSError:
        import platform
        ident = platform.processor() or platform.machine() or "unknown"
    return hashlib.sha256(ident.encode()).hexdigest()[:12]


def setup(*, cpu: bool = False, cache_dir: str | None = None) -> None:
    global _DONE
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if not _DONE:
        # persistent cache for ACCELERATOR backends only. XLA:CPU's cached
        # AOT executables are unreliable in this jaxlib: the serialized
        # entries carry tuning pseudo-features (prefer-no-scatter/gather)
        # that fail the loader's host-feature check even on the machine
        # that compiled them, and the resulting load path executed
        # pathologically slowly (a multichip dryrun that compiles fresh in
        # minutes could not finish ONE cached train step in two). CPU
        # compiles here are seconds-scale anyway; the cache exists for the
        # tunneled TPU, whose first compiles take minutes.
        if jax.default_backend() != "cpu":
            base = (cache_dir or os.environ.get("AUDAX_JAX_CACHE")
                    or os.path.expanduser("~/.cache/audax_jax_cache"))
            cache = os.path.join(base, _host_fingerprint())
            try:
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:  # cache flags unavailable on exotic builds
                pass
        _DONE = True
