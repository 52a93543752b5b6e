"""Jitted train/eval steps (pjit data-parallel).

One compiled step per (model, optimizer) pair: forward, softmax-CE loss,
grads, optax update — all inside a single jit. Batches arrive sharded over
the mesh's ``data`` axis (parallel/mesh.py:shard_batch); parameters are
replicated, so XLA inserts the gradient all-reduce over ICI automatically.
This replaces the reference's single-device torch loops
(.charles/spectrogram.py:517-594,1109-1159) with an SPMD step that is
identical on 1 chip or a full slice.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

__all__ = ["TrainState", "make_classifier_steps", "cross_entropy"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    @classmethod
    def create(cls, *, apply_fn, params, tx, batch_stats=None) -> "TrainState":
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats if batch_stats is not None else FrozenDict(),
                   opt_state=tx.init(params), tx=tx, apply_fn=apply_fn)


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  weights: Optional[jax.Array] = None) -> jax.Array:
    """Mean softmax cross-entropy; optional per-example weights (used to mask
    padding rows in fixed-shape eval batches)."""
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if weights is None:
        return losses.mean()
    return (losses * weights).sum() / jnp.maximum(weights.sum(), 1.0)


def make_classifier_steps(model, *, donate: bool = True
                          ) -> Tuple[Callable, Callable]:
    """Build (train_step, eval_step) for a Flax classifier with BatchNorm
    and Dropout. The optimizer travels in ``state.tx`` (static field), so one
    pair of compiled steps serves any optax transformation.

    ``donate`` lets XLA update params/batch_stats/opt_state in place
    (halves the step's steady-state HBM); the input ``state`` is invalid
    after each ``train_step`` call. ``eval_step`` never donates."""

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, updates = model.apply(
            variables, batch["x"], train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        loss = cross_entropy(logits, batch["y"], batch.get("w"))
        return loss, (logits, updates["batch_stats"])

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, batch: Dict[str, jax.Array], rng
                   ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        rng = jax.random.fold_in(rng, state.step)
        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, rng)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = (jnp.argmax(logits, -1) == batch["y"]).mean()
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_stats, opt_state=opt_state)
        return new_state, {"loss": loss, "accuracy": acc}

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = model.apply(variables, batch["x"], train=False)
        loss = cross_entropy(logits, batch["y"], batch.get("w"))
        return {"loss": loss, "logits": logits,
                "predictions": jnp.argmax(logits, -1)}

    return train_step, eval_step
