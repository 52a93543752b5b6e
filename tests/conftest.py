"""Test harness: force CPU with 8 virtual devices so sharding/collective
tests run anywhere (the TPU analogue of a fake backend; SURVEY.md §4).

Suite hygiene:
  * per-test watchdog — faulthandler dumps all thread stacks and kills the
    (xdist worker) process if one test exceeds AUDAX_TEST_TIMEOUT seconds
    (default 600), so a hang shows up as a failed test with a traceback
    instead of a silent stall;
  * ``-m fast`` — host-side/kernel tests (the quick inner-loop subset)
    (the inner-loop subset); everything else carries the ``slow`` marker.
"""

# XLA:CPU kills the whole process if a virtual-device collective rendezvous
# misses a 40 s hard deadline — on a small/loaded host (this box has shown
# up with 1 vCPU) honest compute + scheduling noise can exceed that; the
# per-test watchdog below still catches genuine deadlocks. Importing
# audax.core.runtime does not import jax; XLA reads XLA_FLAGS lazily at
# backend init, which happens after conftest import even though jax itself
# is already imported by a pytest plugin.
import os as _os

# XLA:CPU COMPILE time dominates this suite (dims are tiny; the heavy
# tests compile multi-collective train steps). Backend optimization
# level 0 skips the expensive LLVM/HLO optimization passes without
# changing semantics (fast-math stays off): measured round 5, test_pp +
# test_attention 610 s -> 145 s, test_fsdp 85 s -> 44 s, full suite
# ~63 -> ~21 min at -n 2 on a 1-vCPU host, all tests passing at
# unchanged tolerances. AUDAX_TEST_FULL_XLA_OPT=1 restores full
# optimization (e.g. to chase a codegen-sensitive numeric).
if not _os.environ.get("AUDAX_TEST_FULL_XLA_OPT"):
    _os.environ["XLA_FLAGS"] = (_os.environ.get("XLA_FLAGS", "")
                                + " --xla_backend_optimization_level=0")

from audax.core.runtime import raise_cpu_collective_deadlines

raise_cpu_collective_deadlines()

import jax  # noqa: E402

# Env vars (JAX_PLATFORMS) are unreliable here: `import pytest` already
# pulls in jax via a plugin, and a TPU plugin force-registers itself
# regardless of JAX_PLATFORMS. The config API pins things before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import faulthandler  # noqa: E402
import os  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

TEST_TIMEOUT_S = float(os.environ.get("AUDAX_TEST_TIMEOUT", "600"))

#: modules whose tests are cheap (host logic, oracle parity in interpret
#: mode): the `-m fast` inner-loop subset, < 60 s wall with -n 4
FAST_MODULES = {
    "test_core", "test_frontend", "test_tokenizer", "test_symbolic",
    "test_abc_parse", "test_data", "test_augment", "test_grain",
    "test_writers",
}
#: individually-slow tests inside otherwise-fast modules
SLOW_TESTS = {
    "test_end_to_end_mini_training", "test_waveform_grain_with_tokenizer",
    "test_urbansound_grain_epochs", "test_urbansound_grain_batches",
    "test_resample_tone_preserved", "test_spec_augment_properties",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        fast = mod in FAST_MODULES and name not in SLOW_TESTS
        item.add_marker(pytest.mark.fast if fast else pytest.mark.slow)


@pytest.fixture(autouse=True)
def _watchdog():
    if TEST_TIMEOUT_S > 0:
        faulthandler.dump_traceback_later(TEST_TIMEOUT_S, exit=True)
    yield
    if TEST_TIMEOUT_S > 0:
        faulthandler.cancel_dump_traceback_later()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
