"""Seq2seq (Whisper) fine-tuning: collator semantics, masked loss, LoRA or
full-parameter train steps, WER eval.

Reference surface being rebuilt (AB/fineTune.py): HF Seq2SeqTrainer with
DataCollatorSpeechSeq2SeqWithPadding (:99-118 — pad features + labels, mask
pads to -100, strip the leading BOS), WER metric every eval (:145-158), and
warmup+linear-decay AdamW (:162-183). Here the loop is a jitted SPMD step;
LoRA (models/lora.py) or full fine-tune selected by config.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from audax.core.config import FineTuneConfig, WhisperConfig
from audax.core.logging import get_logger
from audax.models.lora import apply_lora, init_lora
from audax.models.whisper import whisper_forward
from audax.train.optim import seq2seq_schedule

log = get_logger("audax.seq2seq")

LABEL_PAD = -100

__all__ = ["collate_seq2seq", "seq2seq_loss", "seq2seq_loss_sum",
           "make_finetune_step", "FTState", "init_finetune", "LABEL_PAD"]


def collate_seq2seq(
    label_ids: Sequence[Sequence[int]],
    *,
    decoder_start_id: int,
    pad_to: Optional[int] = None,
    pad_multiple: int = 8,
) -> Dict[str, np.ndarray]:
    """Label lists -> (decoder_input_ids, labels) with -100 masking.

    Reference semantics (AB/fineTune.py:104-118): labels are padded and the
    pad positions masked to -100; if every row starts with the decoder-start
    token it is stripped from the *labels* (the model prepends it on the
    input side). decoder_input_ids = [start] + labels_without_pads.
    """
    rows = [list(map(int, r)) for r in label_ids]
    if rows and all(r and r[0] == decoder_start_id for r in rows):
        rows = [r[1:] for r in rows]
    max_len = max((len(r) for r in rows), default=0) + 1   # +1 for start/eos shift
    max_len = ((max_len + pad_multiple - 1) // pad_multiple) * pad_multiple
    if pad_to:
        max_len = pad_to
    b = len(rows)
    dec_in = np.full((b, max_len), decoder_start_id, np.int32)
    labels = np.full((b, max_len), LABEL_PAD, np.int32)
    for i, r in enumerate(rows):
        r = r[: max_len - 1]
        dec_in[i, 1: 1 + len(r)] = r
        labels[i, : len(r)] = r
        # token after the last real label is predicted from the last input;
        # rows are expected to already end in EOS (labels[len-1])
    return {"decoder_input_ids": dec_in, "labels": labels}


def seq2seq_loss_sum(logits: jnp.ndarray, labels: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(summed CE over non-masked (-100) positions, token count).

    The un-normalized form lets gradient accumulation reproduce the exact
    full-batch mean: sum losses and counts across microbatches, divide once.
    """
    mask = labels != LABEL_PAD
    safe = jnp.where(mask, labels, 0)
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    return (losses * mask).sum(), mask.sum()


def seq2seq_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean CE over non-masked (-100) positions."""
    total, count = seq2seq_loss_sum(logits, labels)
    return total / jnp.maximum(count, 1)


class FTState(struct.PyTreeNode):
    step: jax.Array
    base_params: Any          # frozen when LoRA active
    trainable: Any            # lora tree OR full params
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    use_lora: bool = struct.field(pytree_node=False, default=False)
    lora_alpha: float = struct.field(pytree_node=False, default=16.0)

    def model_params(self):
        if self.use_lora:
            return apply_lora(self.base_params, self.trainable, self.lora_alpha)
        return self.trainable


def init_finetune(params, cfg: FineTuneConfig, *,
                  lora_targets: Tuple[str, ...] = ("attn/q", "attn/v"),
                  rng: Optional[jax.Array] = None) -> FTState:
    from audax.train.optim import adamw_lp
    # adamw_lp(moments="float32") is an exact twin of the previous
    # clip+optax.adamw chain (tested); reduced-precision moments cut the
    # optimizer's HBM traffic and state footprint (train/optim.py)
    tx = adamw_lp(seq2seq_schedule(cfg.learning_rate, cfg.warmup_steps,
                                   cfg.max_steps),
                  moments=cfg.moment_dtype, grad_clip=1.0)
    if cfg.lora_rank > 0:
        lora = init_lora(params, cfg.lora_rank, targets=lora_targets,
                         rng=rng if rng is not None else jax.random.key(cfg.seed))
        return FTState(step=jnp.zeros((), jnp.int32), base_params=params,
                       trainable=lora, opt_state=tx.init(lora), tx=tx,
                       use_lora=True, lora_alpha=cfg.lora_alpha)
    return FTState(step=jnp.zeros((), jnp.int32), base_params={},
                   trainable=params, opt_state=tx.init(params), tx=tx,
                   use_lora=False)


def make_finetune_step(model_cfg: WhisperConfig,
                       *, remat: bool = True, dtype=jnp.float32,
                       donate: bool = True, accum_steps: int = 1) -> Callable:
    """Jitted fine-tune step: batch = {"mel": [B,T,M], "decoder_input_ids",
    "labels"}. Gradient checkpointing over the full forward mirrors the
    reference's gradient_checkpointing=True (AB/fineTune.py:171).

    ``donate`` (default on) donates the input state's buffers to the step so
    XLA updates params/optimizer state in place instead of holding both the
    old and new copies live — for a full-parameter AdamW fine-tune that is a
    ~2x cut in steady-state HBM for (params + m + v). The previous ``state``
    object is invalid after the call (standard ``state, m = step(state, b)``
    loops are unaffected); unchanged leaves such as the frozen LoRA
    ``base_params`` are aliased straight through to the output state.

    ``accum_steps`` is gradient accumulation (the Seq2SeqTrainingArguments
    ``gradient_accumulation_steps`` knob, AB/fineTune.py:165): the batch is
    split into ``accum_steps`` microbatches scanned sequentially, so peak
    activation memory scales with B/accum_steps while the update equals the
    full-batch step exactly — gradients of the *summed* CE and the token
    counts are accumulated and normalized once, not averaged per microbatch
    (per-microbatch means would weight tokens unevenly across ragged label
    rows). B must be divisible by ``accum_steps``.
    """

    # remat=True: checkpoint each scanned LAYER — the backward recomputes
    # one layer at a time, so peak activation memory is per-layer
    # boundaries, not the whole stack. remat="dots" additionally saves
    # each layer's matmul outputs (less recompute, a bit more memory).
    # NOTE an outer jax.checkpoint(whisper_forward) is NOT equivalent:
    # the backward replays the entire forward, putting every activation
    # live again at once — measured identical peak HBM to no remat at all
    # (results/mfu_study.json: 13.1 GB for both at whisper-small b8).
    fwd = partial(whisper_forward, remat=remat)

    def params_of(trainable, state: FTState):
        if state.use_lora:
            return apply_lora(jax.lax.stop_gradient(state.base_params),
                              trainable, state.lora_alpha)
        return trainable

    def loss_fn(trainable, state: FTState, batch):
        logits = fwd(params_of(trainable, state), model_cfg, batch["mel"],
                     batch["decoder_input_ids"], dtype)
        return seq2seq_loss(logits.astype(jnp.float32), batch["labels"])

    def sum_loss_fn(trainable, state: FTState, batch):
        logits = fwd(params_of(trainable, state), model_cfg, batch["mel"],
                     batch["decoder_input_ids"], dtype)
        total, count = seq2seq_loss_sum(logits.astype(jnp.float32),
                                        batch["labels"])
        return total, count

    def accum_grads(state: FTState, batch):
        b = batch["labels"].shape[0]
        if b % accum_steps:
            raise ValueError(f"batch size {b} not divisible by "
                             f"accum_steps={accum_steps}")
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, b // accum_steps) + x.shape[1:]),
            batch)

        def one(carry, mb):
            gsum, lsum, csum = carry
            (l, c), g = jax.value_and_grad(sum_loss_fn, has_aux=True)(
                state.trainable, state, mb)
            return (jax.tree.map(jnp.add, gsum, g), lsum + l,
                    csum + c.astype(jnp.float32)), None

        zeros = jax.tree.map(jnp.zeros_like, state.trainable)
        (gsum, lsum, csum), _ = jax.lax.scan(
            one, (zeros, jnp.float32(0.0), jnp.float32(0.0)), micro)
        denom = jnp.maximum(csum, 1.0)
        return lsum / denom, jax.tree.map(lambda g: g / denom, gsum)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: FTState, batch):
        if accum_steps > 1:
            loss, grads = accum_grads(state, batch)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(state.trainable, state,
                                                      batch)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        new = state.replace(step=state.step + 1, trainable=trainable,
                            opt_state=opt_state)
        return new, {"loss": loss}

    return step
