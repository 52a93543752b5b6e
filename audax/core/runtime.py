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


def _backend_is_cpu(jax) -> bool:
    """Whether this process will run on the CPU backend — WITHOUT forcing
    backend initialization when the platform is already pinned by config
    (setup() must stay config-only for callers that pin devices after it,
    e.g. the multichip dryrun's in-process CPU pinning). Only when the
    platform is ambiguous do we ask the backend (which initializes it —
    those callers were about to anyway)."""
    plat = jax.config.jax_platforms
    if plat:
        return str(plat).split(",")[0] == "cpu"
    return jax.default_backend() == "cpu"


def raise_cpu_collective_deadlines() -> None:
    """Lift XLA:CPU's collective-rendezvous deadlines (warn 20 s /
    TERMINATE THE PROCESS at 40 s by default) to levels only a genuine
    deadlock exceeds. On a small or loaded host, honest compute between
    virtual-device collectives can pass 40 s (observed: a 1-vCPU box
    running a test suite aborted the multichip dryrun). Must run BEFORE
    backend initialization — XLA reads XLA_FLAGS lazily at client init.
    Callers: tests/conftest.py, __graft_entry__.dryrun_multichip."""
    xf = os.environ.get("XLA_FLAGS", "")
    if "collective_call_terminate" not in xf:
        os.environ["XLA_FLAGS"] = (
            xf + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        ).strip()


def setup(*, cpu: bool = False, cache_dir: str | None = None) -> None:
    global _DONE
    import jax

    if cpu:
        jax.config.update("jax_platforms", "cpu")
    if not _DONE:
        # persistent cache for ACCELERATOR backends only. XLA:CPU's cached
        # AOT executables are unreliable in this jaxlib: entries reload
        # with "machine feature +prefer-no-gather not supported" loader
        # errors even on the machine that compiled them, and the load path
        # executed pathologically slowly (a multichip dryrun that compiles
        # fresh in minutes could not finish ONE cached train step in two);
        # a cache carried across hosts is outright fatal (rendezvous
        # abort). CPU compiles here are seconds-scale anyway; the cache
        # exists for the tunneled TPU, whose first compiles take minutes —
        # and whose serialized executables target the TPU, not the host
        # CPU, so the cache survives host swaps.
        if not _backend_is_cpu(jax):
            cache = (cache_dir or os.environ.get("AUDAX_JAX_CACHE")
                     or os.path.expanduser("~/.cache/audax_jax_cache"))
            try:
                jax.config.update("jax_compilation_cache_dir", cache)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:  # cache flags unavailable on exotic builds
                pass
        _DONE = True
