"""Standalone causal-LM training: text corpus -> next-token LM.

The reference's music decoder is a PRETRAINED Qwen3-0.6B pulled from the
HF hub (/root/reference/.charles/music2midi/model.py:209-213); in a
hubless environment the framework must be able to produce that ingredient
itself. ``fit_lm`` pretrains a Qwen-family ``CausalLMConfig`` model on any
tokenized corpus (e.g. the ABC corpus emitted by the gentokens stages) so
``build_two_tower(lm_params=...)`` can start from a music-aware decoder
instead of random init — CLI ``train-lm``.

TPU shape: contiguous corpus packing into fixed [N, seq_len+1] windows
(static shapes, zero padding waste except the tail), one jitted
AdamW step with donated buffers, microbatch-``scan`` gradient
accumulation via the summed-CE trick (exact full-batch update), batch dim
sharded over 'data' when a mesh is given.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from audax.core.logging import get_logger
from audax.models.causal_lm import CausalLMConfig, lm_forward
from audax.train.seq2seq import LABEL_PAD, seq2seq_loss_sum

log = get_logger("audax.train.lm")

__all__ = ["LMTrainConfig", "LMState", "pack_corpus", "make_lm_train_step",
           "fit_lm"]


@dataclass(frozen=True)
class LMTrainConfig:
    learning_rate: float = 3e-4
    warmup_steps: int = 100
    max_steps: int = 1000
    batch_size: int = 32
    seq_len: int = 256
    weight_decay: float = 0.01
    clip_norm: float = 1.0
    accum_steps: int = 1
    dtype: str = "float32"           # compute dtype; params stay f32
    eval_every: int = 100
    eval_windows: int = 16           # held-out packed windows
    #: MoE models: Switch load-balancing aux loss coefficient
    #: (HF Qwen3-MoE router_aux_loss_coef default)
    aux_loss_coef: float = 0.001
    #: gradient checkpointing: "" off, "full" per-layer recompute,
    #: "dots" per-layer keeping matmul outputs (models/whisper._remat_body)
    remat: str = ""
    #: Adam moment storage dtype (train/optim.py:scale_by_adam_lp)
    moment_dtype: str = "float32"
    seed: int = 0


class LMState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def pack_corpus(ids: np.ndarray, seq_len: int) -> np.ndarray:
    """Contiguous packing of a token stream into [N, seq_len+1] windows
    (window w trains on inputs w[:-1] -> labels w[1:]; consecutive windows
    overlap by one token so every transition is trained exactly once).
    The sub-window tail is dropped — static shapes beat a ragged last row.
    """
    ids = np.asarray(ids, np.int32).reshape(-1)
    n = (len(ids) - 1) // seq_len
    if n < 1:
        raise ValueError(f"corpus of {len(ids)} tokens is shorter than one "
                         f"{seq_len}-token window")
    out = np.empty((n, seq_len + 1), np.int32)
    for i in range(n):
        out[i] = ids[i * seq_len: i * seq_len + seq_len + 1]
    return out


def _make_tx(cfg: LMTrainConfig) -> optax.GradientTransformation:
    from audax.train.optim import adamw_lp
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, cfg.warmup_steps,
        max(cfg.max_steps, cfg.warmup_steps + 1))
    return adamw_lp(sched, weight_decay=cfg.weight_decay,
                    moments=cfg.moment_dtype, grad_clip=cfg.clip_norm)


def init_lm_state(params: Any, cfg: LMTrainConfig) -> LMState:
    tx = _make_tx(cfg)
    return LMState(step=jnp.int32(0), params=params,
                   opt_state=tx.init(params), tx=tx)


def make_lm_train_step(model_cfg: CausalLMConfig, train_cfg: LMTrainConfig,
                       *, donate: bool = True):
    """Jitted step: (state, windows [B, T+1] int32) -> (state, metrics).

    Pad rows with LABEL_PAD (-100) labels are masked; gradient
    accumulation scans microbatches with summed CE + token counts so the
    update equals the full-batch step exactly (train/seq2seq.py pattern).
    """
    dtype = jnp.bfloat16 if train_cfg.dtype == "bfloat16" else jnp.float32
    accum = max(1, train_cfg.accum_steps)
    remat = {"": False, "full": True, "dots": "dots"}[
        getattr(train_cfg, "remat", "")]

    moe = model_cfg.num_experts > 0

    def batch_loss(params, windows):
        """(summed CE, token count); MoE models add the Switch
        load-balancing aux loss (scaled by the microbatch's token count so
        accumulation normalizes it with the CE)."""
        inp = jnp.maximum(windows[:, :-1], 0)
        labels = windows[:, 1:]
        if moe:
            logits, router = lm_forward(params, model_cfg, inp, dtype=dtype,
                                        return_router_logits=True,
                                        remat=remat)
        else:
            logits = lm_forward(params, model_cfg, inp, dtype=dtype,
                                remat=remat)
        total, count = seq2seq_loss_sum(logits.astype(jnp.float32), labels)
        if moe and train_cfg.aux_loss_coef:
            from audax.models.causal_lm import load_balance_loss
            aux = load_balance_loss(router, model_cfg.num_experts,
                                    model_cfg.experts_per_tok)
            total = total + train_cfg.aux_loss_coef * aux * count
        return total, count

    def loss_fn(params, windows):
        if accum == 1:
            total, count = batch_loss(params, windows)
            return total / jnp.maximum(count, 1), count
        b = windows.shape[0]
        micro = windows.reshape(accum, b // accum, -1)

        def body(carry, mb):
            t, c = carry
            # grads of a scan body accumulate additively across steps, so
            # summed-CE gradients ARE the full-batch gradient
            ti, ci = batch_loss(params, mb)
            return (t + ti, c + ci), None

        (total, count), _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.int32(0)), micro)
        return total / jnp.maximum(count, 1), count

    def step(state: LMState, windows: jnp.ndarray):
        (loss, count), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, windows)
        updates, opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
        params = optax.apply_updates(state.params, updates)
        new = state.replace(step=state.step + 1, params=params,
                            opt_state=opt_state)
        return new, {"loss": loss, "tokens": count}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _eval_loss(params, model_cfg: CausalLMConfig, windows: np.ndarray,
               dtype) -> float:
    total, count = jax.jit(
        lambda p, w: seq2seq_loss_sum(
            lm_forward(p, model_cfg, jnp.maximum(w[:, :-1], 0),
                       dtype=dtype).astype(jnp.float32), w[:, 1:])
    )(params, jnp.asarray(windows))
    return float(np.asarray(total)) / max(float(np.asarray(count)), 1.0)


def fit_lm(params: Any, model_cfg: CausalLMConfig, train_cfg: LMTrainConfig,
           corpus_ids: np.ndarray, *, mesh=None, fsdp: bool = False,
           ckpt_dir: Optional[str] = None,
           sink=None) -> Tuple[Any, List[Dict]]:
    """Train ``params`` on ``corpus_ids`` (one flat token stream).

    Held-out eval: the LAST ``eval_windows`` packed windows are reserved
    for perplexity and never trained on. With a mesh, window batches are
    placed sharded over 'data' (XLA inserts the grad all-reduce);
    ``fsdp=True`` additionally shards params + Adam moments over 'data'
    (ZeRO-3, parallel/fsdp.py) — the unchanged step compiles to
    all-gather-on-use + reduce-scatter. Saves orbax checkpoints (latest +
    best-by-eval-loss) when ``ckpt_dir`` is set. Returns (trained params,
    history of metric dicts)."""
    windows = pack_corpus(corpus_ids, train_cfg.seq_len)
    n_eval = min(train_cfg.eval_windows,
                 max(0, len(windows) - train_cfg.batch_size))
    train_w, eval_w = (windows[:-n_eval], windows[-n_eval:]) \
        if n_eval else (windows, None)
    if len(train_w) < train_cfg.batch_size:
        # tiny corpora: repeat windows so one fixed-shape batch exists
        reps = -(-train_cfg.batch_size // len(train_w))
        train_w = np.tile(train_w, (reps, 1))
    dtype = jnp.bfloat16 if train_cfg.dtype == "bfloat16" else jnp.float32
    step = make_lm_train_step(model_cfg, train_cfg)
    # the donating step consumes its input buffers; train a COPY so the
    # caller's params survive (grid searches / repeated fits reuse them)
    p0 = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
    sharding = None
    if mesh is not None and not fsdp and mesh.shape.get("model", 1) > 1:
        # Megatron TP over 'model' BEFORE optimizer init so the Adam
        # moments inherit the layout (same order as __graft_entry__)
        from audax.parallel.sharding import CAUSAL_LM_TP_RULES, shard_params
        p0 = shard_params(p0, mesh, rules=CAUSAL_LM_TP_RULES)
    state = init_lm_state(p0, train_cfg)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(mesh, P("data"))
        if fsdp:
            from audax.parallel.fsdp import fsdp_shard_state
            from audax.parallel.sharding import CAUSAL_LM_TP_RULES
            state = fsdp_shard_state(state, mesh,
                                     rules=CAUSAL_LM_TP_RULES)
        elif mesh.shape.get("model", 1) == 1:
            state = jax.device_put(state, NamedSharding(mesh, P()))
    rng = np.random.default_rng(train_cfg.seed)
    manager = None
    if ckpt_dir:
        from audax.train.checkpoints import CheckpointManager
        manager = CheckpointManager(ckpt_dir, best_metric="val_loss",
                                    config=dataclasses.asdict(model_cfg))
    history: List[Dict] = []
    best = float("inf")
    for it in range(train_cfg.max_steps):
        idx = rng.choice(len(train_w), train_cfg.batch_size,
                         replace=len(train_w) < train_cfg.batch_size)
        batch = jnp.asarray(train_w[idx])
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        state, metrics = step(state, batch)
        is_eval = (train_cfg.eval_every
                   and (it + 1) % train_cfg.eval_every == 0)
        if is_eval or it + 1 == train_cfg.max_steps:
            row = {"step": it + 1,
                   "loss": float(np.asarray(metrics["loss"]))}
            if eval_w is not None:
                ev = _eval_loss(state.params, model_cfg, eval_w, dtype)
                row["eval_loss"] = ev
                row["eval_ppl"] = float(np.exp(min(ev, 30.0)))
                best = min(best, ev)
            history.append(row)
            if sink is not None:
                sink.log(row)
            log.info("lm step %d: %s", it + 1,
                     {k: round(v, 4) for k, v in row.items()})
            if manager is not None:
                manager.save(it + 1, state.params, metrics={
                    "val_loss": row.get("eval_loss", row["loss"])})
    if manager is not None:
        manager.close()
    return state.params, history
