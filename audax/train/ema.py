"""Exponential moving average of trainable parameters (Polyak averaging).

A serving-quality tool the reference's HF-Trainer setup never had
(AB/fineTune.py:162-183 evaluates the raw step weights): the EMA tree lags
the optimizer trajectory, smoothing over minibatch noise — the standard
trick for evaluating/serving fine-tunes. Tracks whatever the train state
calls trainable (full params OR LoRA adapters; for LoRA the average lives
in adapter space and is merged through the usual ``apply_lora`` path, so
the frozen base is never duplicated).

Debias warmup follows the common ``min(decay, (1+t)/(10+t))`` ramp so early
steps are not anchored to the random/pretrained init.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ema_init", "ema_update", "ema_model_params"]


def ema_init(trainable):
    """Fresh EMA tree = a copy of the current trainable params (a copy so
    donation in the train step can't free the buffers under us)."""
    return jax.tree.map(jnp.copy, trainable)


@functools.partial(jax.jit, donate_argnums=(0,))
def ema_update(ema, trainable, decay, step):
    """One EMA step with debias warmup; donates the old EMA buffers.

    ``decay``/``step`` are traced scalars, so one compiled program serves
    every step and any decay value.
    """
    d = jnp.minimum(jnp.asarray(decay, jnp.float32),
                    (1.0 + step) / (10.0 + step))
    return jax.tree.map(
        lambda e, p: (e * d + p.astype(e.dtype) * (1.0 - d)).astype(e.dtype),
        ema, trainable)


def ema_model_params(state, ema):
    """Serving weights from the EMA tree: merged through LoRA when the
    state trains adapters, the EMA tree itself otherwise (mirrors
    FTState.model_params, train/seq2seq.py)."""
    if getattr(state, "use_lora", False):
        from audax.models.lora import apply_lora
        return apply_lora(state.base_params, ema, state.lora_alpha)
    return ema
