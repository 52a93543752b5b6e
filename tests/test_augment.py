"""SpecAugment: shapes, determinism, masking actually happens, stats kept."""

import jax
import jax.numpy as jnp
import numpy as np

from audax.ops.augment import spec_augment


def test_spec_augment_properties(rng):
    mel = jnp.asarray(rng.standard_normal((4, 100, 32)).astype(np.float32))
    out = spec_augment(jax.random.key(0), mel)
    assert out.shape == mel.shape
    # deterministic in the key
    out2 = spec_augment(jax.random.key(0), mel)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different key -> different masks
    out3 = spec_augment(jax.random.key(1), mel)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))
    # something was masked but most content survives
    changed = (np.asarray(out) != np.asarray(mel)).mean()
    assert 0.0 < changed < 0.9
    # masked cells equal the per-example mean
    a = np.asarray(out)
    m = np.asarray(mel)
    diff_mask = a != m
    means = m.mean(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(a[diff_mask],
                               np.broadcast_to(means, m.shape)[diff_mask],
                               atol=1e-6)


def test_spec_augment_zero_masks_identity(rng):
    mel = jnp.asarray(rng.standard_normal((2, 50, 16)).astype(np.float32))
    out = spec_augment(jax.random.key(0), mel, time_masks=0, freq_masks=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mel))
