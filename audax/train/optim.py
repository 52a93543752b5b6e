"""Optimizer factories (optax).

Covers every optimization recipe the reference uses:
  * Adam + weight decay + CE for classifiers (spectrogram.py:538-539)
  * AdamW + linear warmup for seq2seq fine-tunes (AB/fineTune.py:162-183)
  * dual-LR param groups with grad clipping + reduce-on-plateau for the
    two-tower model (music2midi/train.py:230-279,467,499)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import optax

__all__ = ["adamw", "seq2seq_schedule", "dual_lr", "reduce_on_plateau"]


def adamw(learning_rate: float, weight_decay: float = 0.0,
          grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    return optax.chain(*parts)


def seq2seq_schedule(learning_rate: float, warmup_steps: int,
                     max_steps: int) -> optax.Schedule:
    """Linear warmup then linear decay to zero (HF Trainer default shape,
    AB/fineTune.py:168-169)."""
    return optax.schedules.join_schedules(
        [optax.schedules.linear_schedule(0.0, learning_rate, max(warmup_steps, 1)),
         optax.schedules.linear_schedule(learning_rate, 0.0,
                                         max(max_steps - warmup_steps, 1))],
        [warmup_steps],
    )


def dual_lr(label_fn: Callable, lrs: Dict[str, float], *,
            grad_clip: Optional[float] = None,
            frozen_label: str = "frozen") -> optax.GradientTransformation:
    """Per-group learning rates via optax.multi_transform — the functional
    equivalent of torch param groups + requires_grad=False. ``label_fn`` maps
    the param pytree to group labels; params labelled ``frozen_label`` get
    zero updates (and their gradient is dead code XLA eliminates).
    """
    transforms = {name: optax.adamw(lr) for name, lr in lrs.items()}
    transforms[frozen_label] = optax.set_to_zero()
    tx = optax.multi_transform(transforms, label_fn)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def reduce_on_plateau(patience: int = 2, factor: float = 0.5,
                      min_scale: float = 1e-3) -> optax.GradientTransformation:
    """ReduceLROnPlateau equivalent (music2midi/train.py:467,524): wrap the
    optimizer with this and pass ``value=<val loss>`` through
    ``optax.tree_utils``-style extra args at update time."""
    return optax.contrib.reduce_on_plateau(
        patience=patience, factor=factor, min_scale=min_scale)
