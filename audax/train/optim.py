"""Optimizer factories (optax).

Covers every optimization recipe the reference uses:
  * Adam + weight decay + CE for classifiers (spectrogram.py:538-539)
  * AdamW + linear warmup for seq2seq fine-tunes (AB/fineTune.py:162-183)
  * dual-LR param groups with grad clipping + reduce-on-plateau for the
    two-tower model (music2midi/train.py:230-279,467,499)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["adamw", "seq2seq_schedule", "dual_lr", "reduce_on_plateau",
           "scale_by_adam_lp", "adamw_lp", "moment_bytes_per_param"]


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


# ------------------------------------------------------- low-precision Adam --
#
# AdamW's m/v moments are pure HBM traffic: each step reads and writes both
# f32 trees (whisper-small full fine-tune: ~4.8 GB/step, measured 14.1 ms of
# a ~180 ms step in results/train_step_breakdown.json; whisper-medium's f32
# moments alone hold 6.2 GB of the 15.75 GB chip). The moments are however
# statistical accumulators, not master weights — rounding them each step
# adds noise far below gradient noise. scale_by_adam_lp stores them in a
# reduced dtype while ALL arithmetic (decay, bias correction, the update
# direction) stays f32 and params remain f32 master weights:
#
#   moments="float32"   exact twin of optax.scale_by_adam (parity tests)
#   moments="bfloat16"  m and v in bf16 — halves moment bytes; bf16 keeps
#                       f32's 8-bit exponent so v's tiny grad^2 magnitudes
#                       never flush to zero, only lose mantissa (~0.4%
#                       relative, ~0.2% on the sqrt'd denominator)
#   moments="int8"      m in blockwise-absmax int8 (256-elem blocks with an
#                       f32 scale each: 1.25 bytes/param) + v in bf16 —
#                       5/8 the bf16 mode's bytes. v deliberately stays
#                       bf16: linear int8 would crush v entries far below
#                       their block max to zero and 1/sqrt(v)+eps would
#                       explode those params' effective LR, the failure
#                       mode bitsandbytes' dynamic-exponent quantizer
#                       exists to avoid; m is zero-mean and its quant noise
#                       is i.i.d. across steps (averages out in the EMA).
#
# Reference surface this generalizes: the torch AdamW fine-tune
# (AB/fineTune.py:162-183), which keeps f32 moments unconditionally.

_Q8_BLOCK = 256


def _q8_encode(x: jax.Array) -> Dict[str, jax.Array]:
    """Blockwise absmax int8: flatten, pad to 256-elem blocks, scale each
    block by its absmax/127. Padding quantizes to zeros and is sliced off
    on decode (shape is carried by the decode caller)."""
    flat = x.reshape(-1)
    pad = (-flat.size) % _Q8_BLOCK
    blocks = jnp.pad(flat, (0, pad)).reshape(-1, _Q8_BLOCK)
    scale = jnp.max(jnp.abs(blocks), axis=1) / 127.0
    q = jnp.round(blocks / jnp.maximum(scale, 1e-30)[:, None])
    return {"q": q.astype(jnp.int8), "s": scale}


def _q8_decode(enc: Dict[str, jax.Array], shape) -> jax.Array:
    full = (enc["q"].astype(jnp.float32) * enc["s"][:, None]).reshape(-1)
    n = 1
    for d in shape:
        n *= d
    return full[:n].reshape(shape)


def moment_bytes_per_param(moments: str) -> float:
    """Planning helper: optimizer-state bytes per parameter."""
    return {"float32": 8.0, "bfloat16": 4.0,
            "int8": 1.0 + 4.0 / _Q8_BLOCK + 2.0}[moments]


class ScaleByAdamLPState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def scale_by_adam_lp(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                     *, moments: str = "bfloat16"
                     ) -> optax.GradientTransformation:
    """scale_by_adam with reduced-precision moment STORAGE (see module
    comment). Update math is f32; ``moments="float32"`` matches
    optax.scale_by_adam exactly (tested)."""
    if moments not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"moments={moments!r}")
    store = jnp.float32 if moments == "float32" else jnp.bfloat16

    def _nblk(p):
        n = 1
        for d in p.shape:
            n *= d
        return (n + _Q8_BLOCK - 1) // _Q8_BLOCK

    def init_fn(params):
        # init is eager at call sites: build zero states directly (zeros
        # encode to q=0/s=0) instead of round-tripping the quantizer
        if moments == "int8":
            mu = {"q": jax.tree.map(
                      lambda p: jnp.zeros((_nblk(p), _Q8_BLOCK), jnp.int8),
                      params),
                  "s": jax.tree.map(
                      lambda p: jnp.zeros((_nblk(p),), jnp.float32), params)}
        else:
            mu = jax.tree.map(lambda p: jnp.zeros(p.shape, store), params)
        nu = jax.tree.map(lambda p: jnp.zeros(p.shape, store), params)
        return ScaleByAdamLPState(jnp.zeros((), jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - jnp.power(b1, count.astype(jnp.float32))
        c2 = 1.0 - jnp.power(b2, count.astype(jnp.float32))

        def upd(g, m_prev, n_prev):
            g32 = g.astype(jnp.float32)
            m = b1 * m_prev + (1.0 - b1) * g32
            n = b2 * n_prev + (1.0 - b2) * (g32 * g32)
            out = (m / c1) / (jnp.sqrt(n / c2) + eps)
            return out.astype(g.dtype), m, n

        is_tup = lambda x: isinstance(x, tuple)  # noqa: E731
        if moments == "int8":
            # flat tuples only: a dict sentinel here would collide with
            # param containers that legitimately hold a "q" key (whisper
            # attention blocks) when tree-mapping with an is_leaf probe
            def upd8(g, q, s, nv):
                out, m, n = upd(g, _q8_decode({"q": q, "s": s}, g.shape),
                                nv.astype(jnp.float32))
                e = _q8_encode(m)
                return out, e["q"], e["s"], n.astype(store)

            quad = jax.tree.map(upd8, updates, state.mu["q"],
                                state.mu["s"], state.nu)
            new_updates = jax.tree.map(lambda t: t[0], quad, is_leaf=is_tup)
            new_mu = {"q": jax.tree.map(lambda t: t[1], quad,
                                        is_leaf=is_tup),
                      "s": jax.tree.map(lambda t: t[2], quad,
                                        is_leaf=is_tup)}
            new_nu = jax.tree.map(lambda t: t[3], quad, is_leaf=is_tup)
        else:
            trip = jax.tree.map(
                lambda g, mv, nv: upd(g, mv.astype(jnp.float32),
                                      nv.astype(jnp.float32)),
                updates, state.mu, state.nu)
            new_updates = jax.tree.map(lambda t: t[0], trip, is_leaf=is_tup)
            new_mu = jax.tree.map(lambda t: t[1].astype(store), trip,
                                  is_leaf=is_tup)
            new_nu = jax.tree.map(lambda t: t[2].astype(store), trip,
                                  is_leaf=is_tup)
        return new_updates, ScaleByAdamLPState(count, new_mu, new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lp(learning_rate, weight_decay: float = 1e-4,
             b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
             *, moments: str = "bfloat16",
             grad_clip: Optional[float] = None
             ) -> optax.GradientTransformation:
    """AdamW with reduced-precision moments — same chain layout as
    optax.adamw (scale_by_adam -> add_decayed_weights -> -lr), optionally
    prefixed with global-norm clipping. ``moments="float32"`` is an exact
    twin of the optax chain used by init_finetune (tested)."""
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts += [scale_by_adam_lp(b1, b2, eps, moments=moments),
              optax.add_decayed_weights(weight_decay),
              optax.scale_by_learning_rate(learning_rate)]
    return optax.chain(*parts)


def reduce_on_plateau(patience: int = 2, factor: float = 0.5,
                      min_scale: float = 1e-3) -> optax.GradientTransformation:
    """ReduceLROnPlateau equivalent (music2midi/train.py:467,524): wrap the
    optimizer with this and pass ``value=<val loss>`` through
    ``optax.tree_utils``-style extra args at update time."""
    return optax.contrib.reduce_on_plateau(
        patience=patience, factor=factor, min_scale=min_scale)
