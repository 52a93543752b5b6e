"""Two-tower training: dual-LR partial unfreezing, trainable-only
checkpoints, validation loop.

Reference semantics rebuilt (.charles/music2midi/train.py): dual learning
rates adapter 1e-4 / LM 2e-5 (:230-279), frozen-Whisper assertion (:261-265)
-> structural here (Whisper params never enter the optimizer), grad clip 1.0
(:499), ReduceLROnPlateau on val loss (:467,524), space-saving
trainable-only checkpoints (:281-334), 90/10 split validation (:364-385).

Top-K unfreezing with stacked layers: the LM's layers are one [L, ...]
stacked tensor, so "unfreeze the top K" is a per-layer gradient mask
multiplied in before the optimizer — exact zero updates for frozen layers.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from audax.core.logging import get_logger
from audax.models.two_tower import TwoTowerModel

log = get_logger("audax.two_tower")

__all__ = ["TwoTowerState", "init_two_tower_optimizer", "make_two_tower_step",
           "layer_unfreeze_mask", "save_trainable_checkpoint",
           "load_trainable_checkpoint", "trainable_param_counts"]


class TwoTowerState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    layer_mask: jax.Array = None        # [L] 1.0 = trainable


def layer_unfreeze_mask(n_layers: int, top_k: int) -> jnp.ndarray:
    """1.0 for the top-K layers, 0.0 below (reference TOP_K_QWEN_LAYERS=4,
    model.py:242-261)."""
    mask = jnp.zeros((n_layers,), jnp.float32)
    if top_k > 0:
        mask = mask.at[max(0, n_layers - top_k):].set(1.0)
    return mask


def _mask_lm_grads(grads: Dict, mask: jnp.ndarray) -> Dict:
    """Zero gradients of frozen (stacked) LM layers."""
    def mask_leaf(g):
        extra = (1,) * (g.ndim - 1)
        return g * mask.reshape((-1,) + extra).astype(g.dtype)

    lm = dict(grads["lm"])
    lm["layers"] = jax.tree.map(mask_leaf, lm["layers"])
    return {**grads, "lm": lm}


def init_two_tower_optimizer(model: TwoTowerModel) -> Tuple[
        optax.GradientTransformation, jnp.ndarray]:
    """Dual-LR AdamW (adapter vs LM) with global-norm clipping. Learning
    rates are injected hyperparams so the plateau scheduler can scale them
    in-place without rebuilding optimizer state."""
    cfg = model.cfg

    def label_fn(params):
        return {"adapter": jax.tree.map(lambda _: "adapter", params["adapter"]),
                "lm": jax.tree.map(lambda _: "lm", params["lm"])}

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform(
            {"adapter": optax.inject_hyperparams(optax.adamw)(
                learning_rate=cfg.adapter_lr),
             "lm": optax.inject_hyperparams(optax.adamw)(
                learning_rate=cfg.lm_lr)},
            label_fn),
    )
    mask = layer_unfreeze_mask(model.lm_cfg.layers, cfg.top_k_unfrozen_layers)
    return tx, mask


def scale_learning_rates(opt_state, factor: float):
    """ReduceLROnPlateau primitive (reference: train.py:467,524): multiply
    every injected ``learning_rate`` hyperparam in the optimizer state by
    ``factor``, preserving all accumulator state."""
    def walk(node):
        if isinstance(node, optax.InjectStatefulHyperparamsState) or (
                node.__class__.__name__ == "InjectHyperparamsState"):
            hp = dict(node.hyperparams)
            hp["learning_rate"] = hp["learning_rate"] * factor
            return node._replace(hyperparams=hp)
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
            return node._replace(**{f: walk(getattr(node, f))
                                    for f in node._fields})
        if isinstance(node, (list, tuple)):
            return type(node)(walk(x) for x in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(opt_state)


def make_two_tower_step(model: TwoTowerModel, *, donate: bool = False,
                        accum_steps: int = 1) -> Tuple[Callable, Callable]:
    """(train_step, eval_step); batch = {"mel": [B,T,n_mels],
    "input_ids": [B,L], "attention_mask": [B,L]}.

    ``donate=True`` updates params/opt_state in place (in-place AdamW for
    the 0.6B-class LM cuts the step's steady-state HBM roughly in half) but
    also invalidates ``model.params`` — the state is built FROM that tree
    (two_tower_loop.py), so only enable it when the caller never reads
    ``model.params`` again after the first step (``fit_two_tower`` does
    this; the frozen encoder lives in ``model.audio_params``, a separate
    tree that is closure-captured and never donated).

    ``accum_steps`` splits the batch into microbatches scanned sequentially
    (gradient_accumulation_steps semantics, AB/fineTune.py:165): peak
    activation + frozen-encoder-state memory scales with B/accum_steps while
    the update equals the full-batch step exactly — gradients of the summed
    CE and token counts accumulate, normalized once. B must be divisible."""

    def loss_fn(params, enc, batch):
        return model.loss(params, enc, batch["input_ids"],
                          batch["attention_mask"])

    def sum_loss_fn(params, mb):
        # frozen encoder runs inside the microbatch: its [b/K, T', d]
        # states never exist at full batch size
        enc = model.encode_audio(mb["mel"])
        return model.loss_sum(params, enc, mb["input_ids"],
                              mb["attention_mask"])

    def accum_grads(params, batch):
        b = batch["input_ids"].shape[0]
        if b % accum_steps:
            raise ValueError(f"batch size {b} not divisible by "
                             f"accum_steps={accum_steps}")
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, b // accum_steps) + x.shape[1:]),
            batch)

        def one(carry, mb):
            gsum, lsum, csum = carry
            (l, c), g = jax.value_and_grad(sum_loss_fn, has_aux=True)(
                params, mb)
            return (jax.tree.map(jnp.add, gsum, g), lsum + l, csum + c), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        (gsum, lsum, csum), _ = jax.lax.scan(
            one, (zeros, jnp.float32(0.0), jnp.float32(0.0)), micro)
        denom = jnp.maximum(csum, 1.0)
        return lsum / denom, jax.tree.map(lambda g: g / denom, gsum)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TwoTowerState, batch):
        if accum_steps > 1:
            loss, grads = accum_grads(state.params, batch)
        else:
            enc = model.encode_audio(batch["mel"])
            loss, grads = jax.value_and_grad(loss_fn)(state.params, enc,
                                                      batch)
        grads = _mask_lm_grads(grads, state.layer_mask)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        # mask updates too: AdamW's decoupled weight decay would otherwise
        # drift zero-grad (frozen) layers
        updates = _mask_lm_grads(updates, state.layer_mask)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), {"loss": loss}

    @jax.jit
    def eval_step(state: TwoTowerState, batch):
        enc = model.encode_audio(batch["mel"])
        return {"loss": loss_fn(state.params, enc, batch)}

    return train_step, eval_step


def trainable_param_counts(model: TwoTowerModel, mask: jnp.ndarray
                           ) -> Dict[str, int]:
    """Parameter/memory breakdown (reference report train.py:67-175)."""
    def count(tree):
        return sum(int(x.size) for x in jax.tree.leaves(tree))

    lm_layers = model.params["lm"]["layers"]
    per_layer = count(lm_layers) // model.lm_cfg.layers
    unfrozen_layers = int(np.asarray(mask).sum())
    lm_other = count({k: v for k, v in model.params["lm"].items()
                      if k != "layers"})
    return {
        "whisper_frozen": count(model.audio_params),
        "adapter": count(model.params["adapter"]),
        "lm_total": count(model.params["lm"]),
        "lm_trainable": per_layer * unfrozen_layers + lm_other,
        "trainable_total": count(model.params["adapter"])
        + per_layer * unfrozen_layers + lm_other,
    }


# ------------------------------------------------------ checkpoints -------
def save_trainable_checkpoint(path: str, state: TwoTowerState,
                              model: TwoTowerModel,
                              extra: Optional[Dict] = None,
                              *, save_optimizer: bool = True,
                              block: bool = True):
    """Persist adapter + top-K LM layer slices + embeddings/norm/lm_head +
    optimizer state (reference scheme, train.py:281-334): frozen LM layers
    are reconstructable, so they are not serialized. ``save_optimizer``
    keeps the full opt_state (Adam moments AND the plateau-scheduler's
    scaled learning rates live inside it — dropping it on resume would
    restart at the original LR with zero moments). ``block=False`` returns
    the async checkpointer; call ``wait_until_finished()`` before relying
    on the write."""
    from audax.train.checkpoints import save_pytree

    k = min(model.cfg.top_k_unfrozen_layers, model.lm_cfg.layers)
    n = model.lm_cfg.layers
    lm = state.params["lm"]
    trainable = {
        "adapter": state.params["adapter"],
        "lm_top_layers": jax.tree.map(lambda x: x[n - k:], lm["layers"]),
        "lm_other": {key: val for key, val in lm.items() if key != "layers"},
        "step": state.step,
    }
    if save_optimizer:
        trainable["opt_state"] = state.opt_state
    if extra:
        trainable["extra"] = extra
    return save_pytree(path, trainable, block=block)


def load_trainable_checkpoint(path: str, model: TwoTowerModel,
                              *, return_saved: bool = False,
                              opt_state_template=None):
    """Merge a trainable-only checkpoint over freshly-built params
    (format-aware loader, reference train.py:336-362 / inference.py:53-89).
    ``return_saved=True`` additionally returns the saved dict (step,
    opt_state when present) for mid-run resume. ``opt_state_template``
    (e.g. ``tx.init(params)``) enables a TARGETED orbax restore so the
    optimizer state comes back with its optax NamedTuple structure intact
    — a raw restore flattens it to plain containers."""
    from audax.train.checkpoints import load_pytree

    saved = None
    if opt_state_template is not None:
        k_t = min(model.cfg.top_k_unfrozen_layers, model.lm_cfg.layers)
        n_t = model.lm_cfg.layers
        tpl = {
            "adapter": model.params["adapter"],
            "lm_top_layers": jax.tree.map(lambda x: x[n_t - k_t:],
                                          model.params["lm"]["layers"]),
            "lm_other": {key: val
                         for key, val in model.params["lm"].items()
                         if key != "layers"},
            "step": jnp.zeros((), jnp.int32),
            "opt_state": opt_state_template,
            "extra": {"epoch": 0, "val_loss": 0.0},
        }
        try:
            saved = load_pytree(path, tpl)
        except Exception:
            # older format (no opt_state/extra): fall back to raw
            saved = None
    if saved is None:
        saved = load_pytree(path)
    # clamp like the save side: top_k beyond the layer count means
    # "everything trainable" — an unclamped n-k slice would splice fresh
    # random layers under the trained ones
    k = min(model.cfg.top_k_unfrozen_layers, model.lm_cfg.layers)
    n = model.lm_cfg.layers
    lm = dict(model.params["lm"])
    lm["layers"] = jax.tree.map(
        lambda full, top: jnp.concatenate([full[: n - k], jnp.asarray(top)], 0),
        lm["layers"], saved["lm_top_layers"])
    lm.update({key: jnp.asarray(val) if not isinstance(val, dict) else
               jax.tree.map(jnp.asarray, val)
               for key, val in saved["lm_other"].items()})
    params = {"adapter": jax.tree.map(jnp.asarray, saved["adapter"]), "lm": lm}
    out = model._replace(params=params)
    return (out, saved) if return_saved else out
