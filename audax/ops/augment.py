"""On-device data augmentation (SpecAugment).

Beyond-reference capability: the reference trained its classifiers on raw
log-mels with no augmentation (a cited reason its accuracy trailed published
UrbanSound results, .charles/urbansound8k_sql.md:4-9 comparisons).
SpecAugment's time/frequency masking is a pure jit-able transform on the
batch — it rides the same device pass as the train step, costing nothing on
host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["spec_augment", "SHORT_CLIP_TIME_WIDTH", "SHORT_CLIP_FREQ_WIDTH"]

#: mask widths for short (few-second) clips: the 30 s-window defaults
#: below (40/16) would blank a third of a 3-6 s melody's frames. One
#: definition — the fine-tune proof, the encoder pretrain, and the
#: two-tower fit all share it.
SHORT_CLIP_TIME_WIDTH = 24
SHORT_CLIP_FREQ_WIDTH = 12


def _mask_axis(rng: jax.Array, x: jnp.ndarray, axis_len: int, max_width: int,
               n_masks: int, axis: int, fill: jnp.ndarray) -> jnp.ndarray:
    """Apply n random-width contiguous masks along ``axis`` (per example)."""
    b = x.shape[0]
    idx = jnp.arange(axis_len)
    out = x
    for i in range(n_masks):
        k1, k2, rng = jax.random.split(rng, 3)
        width = jax.random.randint(k1, (b,), 0, max_width + 1)
        start = jax.random.randint(k2, (b,), 0, jnp.maximum(axis_len - width, 1))
        mask = jnp.logical_and(idx[None, :] >= start[:, None],
                               idx[None, :] < (start + width)[:, None])
        shape = [b] + [1] * (x.ndim - 1)
        shape[axis] = axis_len
        out = jnp.where(mask.reshape(shape), fill, out)
    return out


@functools.partial(jax.jit,
                   static_argnames=("time_masks", "freq_masks",
                                    "max_time_width", "max_freq_width"))
def spec_augment(
    rng: jax.Array,
    mel: jnp.ndarray,                 # [B, T, n_mels] log-mel
    *,
    time_masks: int = 2,
    freq_masks: int = 2,
    max_time_width: int = 40,
    max_freq_width: int = 16,
) -> jnp.ndarray:
    """Mask random time spans and mel bands with the per-example mean value
    (masking with the mean rather than zero keeps log-domain statistics)."""
    b, t, m = mel.shape
    fill = mel.mean(axis=(1, 2), keepdims=True)
    k1, k2 = jax.random.split(rng)
    out = _mask_axis(k1, mel, t, max_time_width, time_masks, axis=1, fill=fill)
    out = _mask_axis(k2, out, m, max_freq_width, freq_masks, axis=2, fill=fill)
    return out
