"""Pipeline parallelism (GPipe-style, shard_map): inference AND training.

Layers are split across a ``stage`` mesh axis — the stacked-layer layout
makes this a PartitionSpec on the layer axis, no repacking. Microbatches
flow through the stages: each pipeline tick every stage runs its local
layer slice, then activations ``ppermute`` one hop down the ring while the
first stage injects the next microbatch. After ``n_micro + n_stages - 1``
ticks every microbatch has crossed every stage; outputs are collected on
the last stage and psum-broadcast out.

The ring is a plain differentiable JAX program: ``ppermute`` transposes to
the reverse permutation, so ``jax.grad`` through ``pipeline_apply`` IS the
backward pipeline (activation grads flow stage S-1 -> 0 through the
transposed ring) — no hand-written backward schedule. ``remat=True``
rematerializes each stage's layer scan in the backward pass (GPipe's
per-microbatch checkpointing), bounding live activations to one
microbatch x one stage.

Users:
- ``encode_pipelined``    — Whisper encoder forward (exact vs plain).
- ``lm_forward_pipelined``— causal-LM training forward (exact vs
  ``lm_forward``), the production decoder-only PP shape.
- ``make_pp_lm_train_step`` — jitted PP training step: CE loss + optax
  update with the layer stack (and its optimizer moments) stage-sharded
  via ``pp_layer_specs``, so per-device parameter memory drops by the
  stage count.

The reference has no pipeline (or any) parallelism — single-device torch
throughout (/root/reference/.charles/music2midi/train.py:389). This is a
new first-class component per SURVEY.md §2.3.

Exactness is tested vs the plain single-device forwards. Bubble fraction
is the usual (S-1)/(M+S-1); pick n_micro >= stages for efficiency.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from audax.core.config import WhisperConfig
from audax.models.causal_lm import (CausalLMConfig, embed_tokens, lm_logits,
                                    rms_norm)
from audax.models.whisper import attention, conv_stem, layer_norm, _mlp

__all__ = ["pipeline_apply", "encode_pipelined", "lm_forward_pipelined",
           "make_pp_lm_train_step", "pp_layer_specs"]


def pipeline_apply(layers, block: Callable, micro, mesh: Mesh,
                   *, stage_axis: str = "stage",
                   data_axis: Optional[str] = None, remat: bool = False):
    """Run ``micro`` through the scan-stacked ``layers`` as a GPipe ring
    over the ``stage`` mesh axis.

    ``micro`` is an array [M, mb, ...] or a pytree of arrays with a
    common leading [M, mb, ...] prefix (e.g. (activations, key-padding
    mask) — per-sample state rides the ring next to its microbatch).
    ``block(x, layer) -> x`` is one layer's forward over the non-M axes,
    same pytree structure in and out (close over anything replicated:
    positions, config). ``layers``' leading axis must divide by the stage
    count; it is sliced by PartitionSpec — pass the stack whole. Returns
    the same structure as ``micro``. Differentiable end-to-end (see
    module docstring).

    ``data_axis`` composes PP x DP on a (stage, data) mesh: the mb dim
    shards over ``data`` (each data shard runs its own ring over its
    slice of every microbatch; the stage ring never crosses the data
    axis) and the backward's layer-grad psum over ``data`` comes from the
    shard_map transpose — no schedule changes.
    """
    n_stages = mesh.shape[stage_axis]
    n_micro = jax.tree.leaves(micro)[0].shape[0]
    total_ticks = n_micro + n_stages - 1

    def scan_block(x, layer):
        return block(x, layer), None

    if remat:
        scan_block = jax.checkpoint(scan_block)

    def stage_fn(layers_local, micro_all):
        """Per-stage body. layers_local: this stage's layer slice (leading
        axis L/S); micro_all: all microbatches (replicated input)."""
        stage = lax.axis_index(stage_axis)
        is_first = stage == 0
        is_last = stage == n_stages - 1
        fwd = [(i, i + 1) for i in range(n_stages - 1)]

        def tick(carry, t):
            current, outputs = carry
            inject_idx = jnp.clip(t, 0, n_micro - 1)
            take_new = jnp.logical_and(is_first, t < n_micro)
            current = jax.tree.map(
                lambda c, m: jnp.where(take_new, m[inject_idx], c),
                current, micro_all)
            processed, _ = lax.scan(scan_block, current, layers_local)
            out_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            emit = jnp.logical_and(is_last, t >= n_stages - 1)
            outputs = jax.tree.map(
                lambda o, p: jnp.where(
                    emit,
                    lax.dynamic_update_slice(o, p[None],
                                             (out_idx,) + (0,) * p.ndim),
                    o),
                outputs, processed)
            nxt = (jax.tree.map(
                       lambda p: lax.ppermute(p, stage_axis, fwd), processed)
                   if n_stages > 1 else processed)
            return (nxt, outputs), None

        init = (jax.tree.map(lambda m: jnp.zeros_like(m[0]), micro_all),
                jax.tree.map(jnp.zeros_like, micro_all))
        # carries become stage-varying after the first tick; mark them so
        init = jax.tree.map(
            lambda x: lax.pcast(x, (stage_axis,), to="varying"), init)
        (_, outputs), _ = lax.scan(tick, init,
                                   jnp.arange(total_ticks))
        # only the last stage holds real outputs; broadcast them
        outputs = jax.tree.map(
            lambda o: lax.psum(jnp.where(is_last, o, jnp.zeros_like(o)),
                               stage_axis),
            outputs)
        return outputs

    layer_spec = P(stage_axis)                  # slice the stacked layer axis
    micro_spec = P(None, data_axis) if data_axis else P()
    return shard_map(
        stage_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: layer_spec, layers),
                  jax.tree.map(lambda _: micro_spec, micro)),
        out_specs=jax.tree.map(lambda _: micro_spec, micro),
    )(layers, micro)


def _check_divisible(n_layers: int, n_stages: int, batch: int, n_micro: int):
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{n_stages} stages")
    if batch % n_micro:
        raise ValueError(f"batch {batch} not divisible by n_micro={n_micro}")


def encode_pipelined(
    params, cfg: WhisperConfig, mel: jnp.ndarray, mesh: Mesh,
    *, stage_axis: str = "stage", data_axis: Optional[str] = None,
    n_micro: int = 4, dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """mel [B, T_frames, n_mels] -> encoder states, encoder layers pipelined
    over the ``stage`` mesh axis. B must divide into n_micro microbatches;
    encoder_layers must divide by the stage count."""
    _check_divisible(cfg.encoder_layers, mesh.shape[stage_axis],
                     mel.shape[0], n_micro)
    x = conv_stem(params, cfg, mel, dtype)             # [B, S, d]
    b = x.shape[0]
    micro = x.reshape(n_micro, b // n_micro, *x.shape[1:])

    def block(x, layer):
        h = layer_norm(layer["attn_ln"], x)
        x = x + attention(layer["attn"], h, cfg.heads)
        h = layer_norm(layer["mlp_ln"], x)
        x = x + _mlp(layer, h)
        return x

    out = pipeline_apply(params["encoder"]["layers"], block, micro, mesh,
                         stage_axis=stage_axis, data_axis=data_axis,
                         remat=remat)
    out = out.reshape(b, *x.shape[1:])
    return layer_norm(params["encoder"]["ln"], out)


def lm_forward_pipelined(
    params, cfg: CausalLMConfig, tokens: jnp.ndarray, mesh: Mesh,
    *, stage_axis: str = "stage", data_axis: Optional[str] = None,
    n_micro: int = 4,
    attention_mask: Optional[jnp.ndarray] = None, dtype=jnp.float32,
    remat: bool = False,
) -> jnp.ndarray:
    """tokens [B, T] -> logits [B, T, V] with the decoder layer stack
    pipelined over the ``stage`` mesh axis (training forward; exact vs
    ``lm_forward``). Embedding/norm/logits stay replicated — they are
    O(V·d) vs the stack's O(L·d²) and every stage needs the embeds anyway.
    A key-padding ``attention_mask`` [B, T] microbatches alongside the
    activations (it is per-sample state, so it rides the ring).
    """
    from audax.models.causal_lm import _attn_block, _mlp_block
    _check_divisible(cfg.layers, mesh.shape[stage_axis],
                     tokens.shape[0], n_micro)
    x = embed_tokens(params, tokens, dtype)            # [B, T, d]
    b, t, d = x.shape
    positions = jnp.arange(t)
    micro_x = x.reshape(n_micro, b // n_micro, t, d)

    if attention_mask is None:
        def block(x, layer):
            attn, _ = _attn_block(layer, cfg, x, positions, None,
                                  causal=True)
            x = x + attn
            return x + _mlp_block(layer, cfg, x)

        out = pipeline_apply(params["layers"], block, micro_x, mesh,
                             stage_axis=stage_axis, data_axis=data_axis,
                             remat=remat)
    else:
        micro_m = attention_mask.astype(x.dtype).reshape(
            n_micro, b // n_micro, t)

        def block(xm, layer):
            x, lane = xm
            mask = lane[:, None, None, :].astype(bool)
            attn, _ = _attn_block(layer, cfg, x, positions, mask,
                                  causal=True)
            x = x + attn
            return x + _mlp_block(layer, cfg, x), lane

        out, _ = pipeline_apply(params["layers"], block, (micro_x, micro_m),
                                mesh, stage_axis=stage_axis,
                                data_axis=data_axis, remat=remat)
    hidden = rms_norm(params["norm"], out.reshape(b, t, d), cfg.rms_eps)
    return lm_logits(params, cfg, hidden)


def pp_layer_specs(tree, mesh: Mesh, *, stage_axis: str = "stage"):
    """NamedShardings placing every array under a ``layers`` key (leading
    stacked-layer axis) over the ``stage`` axis and everything else
    replicated — apply to params AND optimizer state (whose inner trees
    mirror the params structure) so each stage holds only its own layers'
    weights and Adam moments: the PP memory win."""
    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        if "layers" in names and getattr(leaf, "ndim", 0) >= 1:
            return NamedSharding(mesh, P(stage_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, tree)


def make_pp_lm_train_step(cfg: CausalLMConfig, mesh: Mesh, optimizer,
                          *, stage_axis: str = "stage",
                          data_axis: Optional[str] = None, n_micro: int = 4,
                          remat: bool = False):
    """Jitted pipeline-parallel causal-LM training step.

    Next-token CE over ``tokens`` [B, T] (labels = tokens shifted left;
    positions with label id < 0 are masked, the collator's −100
    convention). Gradients flow back through the transposed ppermute
    ring; the optimizer update is local per stage for the layer stack
    (place params/opt_state with ``pp_layer_specs``) and replicated for
    embed/norm. Returns ``step(params, opt_state, tokens) ->
    (params, opt_state, loss)``.
    """

    def loss_fn(params, tokens):
        from audax.train.seq2seq import seq2seq_loss
        inp = jnp.maximum(tokens[:, :-1], 0)
        logits = lm_forward_pipelined(params, cfg, inp, mesh,
                                      stage_axis=stage_axis,
                                      data_axis=data_axis,
                                      n_micro=n_micro, remat=remat)
        return seq2seq_loss(logits, tokens[:, 1:])

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step
