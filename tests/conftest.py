"""Test harness: force CPU with 8 virtual devices so sharding/collective
tests run anywhere (the TPU analogue of a fake backend; SURVEY.md §4)."""

import jax

# Env vars (JAX_PLATFORMS / XLA_FLAGS) are unreliable here: `import pytest`
# already pulls in jax via a plugin, and a TPU plugin force-registers itself
# regardless of JAX_PLATFORMS. The config API pins things before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
