"""Sequence parallelism for the Whisper encoder (shard_map over mel frames).

The reference handled long audio by chunking at data-prep time (SURVEY.md §5
long-context); sequence-axis sharding is a new capability. Design: activations
are sharded over a ``seq`` mesh axis along the frame dimension; LayerNorm/MLP/
projections are position-local; only attention communicates. Two attention
schedules:

  * ``ring=True`` (default): RING attention — K/V blocks circulate the ICI
    ring via ``ppermute`` while each device folds every block into a running
    online-softmax accumulator (max, normalizer, weighted sum). Per-device
    live K/V is 2 blocks regardless of sequence length, so KV beyond one
    device's VMEM/HBM is fine; comms and compute overlap step by step.
  * ``ring=False``: Ulysses-style one ``all_gather`` of K/V per layer —
    fewer, larger collectives, but materializes the FULL K/V per device
    (only sensible while that fits).

Both are exact bidirectional attention (tested equal to the plain encoder;
online softmax is algebraically the same sum) and compose with the
(data, model) axes: the dryrun mesh is (data, model, seq).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                   # jax >= 0.4.35
    from jax import shard_map
except ImportError:                    # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from audax.core.config import FineTuneConfig, WhisperConfig
from audax.models.whisper import (conv_stem, decode_train, dense, layer_norm,
                                  _merge_heads, _mlp, _split_heads)

__all__ = ["encode_sequence_parallel", "sp_whisper_forward",
           "make_sp_finetune_step"]


def _ring_attention(q, k, v, *, seq_axis: str, n_seq: int, dtype):
    """Exact bidirectional attention with K/V circulating the ring.

    q/k/v [B, H, Sl, hd] (local blocks). Online-softmax accumulation: carry
    (o unnormalized output, m running max, l running normalizer); each of
    the n_seq steps folds in the currently-held K/V block, then ppermutes
    the block to the next device. Live K/V per device stays O(Sl) however
    long the full sequence is.
    """
    scale = q.shape[-1] ** -0.5
    qs = (q * scale).astype(jnp.float32)
    perm = [(i, (i + 1) % n_seq) for i in range(n_seq)]
    # fresh carries are replicated-typed; mark them varying over the same
    # manual axes as q so the fori_loop carry type matches its outputs
    axes = tuple(sorted(jax.typeof(q).vma)) if hasattr(jax, "typeof") \
        else (seq_axis,)

    def _vary(x):
        return lax.pcast(x, axes, to="varying")
    o0 = _vary(jnp.zeros(q.shape, jnp.float32))
    m0 = _vary(jnp.full(q.shape[:3] + (1,), -jnp.inf, jnp.float32))
    l0 = _vary(jnp.zeros(q.shape[:3] + (1,), jnp.float32))

    def step(i, carry):
        o, m, l, kc, vc = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qs, kc.astype(jnp.float32))
        new_m = jnp.maximum(m, s.max(-1, keepdims=True))
        corr = jnp.exp(m - new_m)
        pexp = jnp.exp(s - new_m)
        l = l * corr + pexp.sum(-1, keepdims=True)
        o = o * corr + jnp.einsum("bhqk,bhkd->bhqd", pexp,
                                  vc.astype(jnp.float32))
        kc = lax.ppermute(kc, seq_axis, perm)
        vc = lax.ppermute(vc, seq_axis, perm)
        return o, new_m, l, kc, vc

    o, _, l, _, _ = lax.fori_loop(0, n_seq, step, (o0, m0, l0, k, v))
    return (o / l).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "seq_axis", "data_axis", "dtype", "ring"))
def encode_sequence_parallel(
    params, cfg: WhisperConfig, mel: jnp.ndarray, mesh: Mesh,
    *, seq_axis: str = "seq", data_axis: str = "data", dtype=jnp.float32,
    ring: bool = True,
) -> jnp.ndarray:
    """mel [B, T_frames, n_mels] -> encoder states, with the frame axis
    sharded over ``seq_axis`` inside the transformer stack.

    ``ring=True`` uses ppermute ring attention (per-device KV stays one
    block); ``ring=False`` all-gathers full K/V per layer. Requires
    (T_frames // 2) divisible by the seq-axis size and B divisible by the
    data-axis size.

    Def-site jitted (cfg/mesh/dtype static) for the same reason as
    ``whisper.encode``: eager per-call use would re-trace the layer
    ``lax.scan`` (fresh ``local_stack`` closure identity) and recompile
    the whole encoder every invocation.
    """
    x = conv_stem(params, cfg, mel, dtype)           # [B, S, d]
    b, s = x.shape[0], x.shape[1]
    n_seq = mesh.shape[seq_axis]
    if s % n_seq:
        raise ValueError(f"sequence {s} not divisible by seq axis {n_seq}")
    n_data = mesh.shape[data_axis]
    if b % n_data:
        raise ValueError(f"batch {b} not divisible by data axis {n_data}")

    enc_layers = params["encoder"]["layers"]
    enc_ln = params["encoder"]["ln"]

    sharded = shard_map(
        _make_local_stack(cfg, seq_axis=seq_axis, n_seq=n_seq, ring=ring),
        mesh=mesh,
        in_specs=(P(data_axis, seq_axis, None), P(), P()),
        out_specs=P(data_axis, seq_axis, None),
    )
    # sharding constraint (jit-compatible; device_put would be a transfer)
    x = lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(data_axis, seq_axis, None)))
    return sharded(x, enc_layers, enc_ln)


def _make_local_stack(cfg: WhisperConfig, *, seq_axis: str, n_seq: int,
                      ring: bool, remat=False):
    """Per-device encoder transformer stack over a local frame block.

    Shared by the inference path (``encode_sequence_parallel``) and the
    training path (``sp_whisper_forward``): the body is plain traceable JAX,
    so ``jax.grad`` through the enclosing ``shard_map`` transposes the
    ``ppermute`` ring (inverse permutation) and the online-softmax scan —
    gradients w.r.t. both activations AND layer params are exact."""

    def local_stack(x_local, layers, ln):
        """Runs on each device: x_local [B, S/p, d]."""

        def body(x, layer):
            h = layer_norm(layer["attn_ln"], x)
            q = _split_heads(dense(layer["attn"]["q"], h), cfg.heads)
            k = _split_heads(dense(layer["attn"]["k"], h), cfg.heads)
            v = _split_heads(dense(layer["attn"]["v"], h), cfg.heads)
            if ring and n_seq > 1:
                attn = _ring_attention(q, k, v, seq_axis=seq_axis,
                                       n_seq=n_seq, dtype=x.dtype)
            else:
                # Ulysses-style: gather full K/V across the ring
                k_all = lax.all_gather(k, seq_axis, axis=2, tiled=True)
                v_all = lax.all_gather(v, seq_axis, axis=2, tiled=True)
                scale = q.shape[-1] ** -0.5
                scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k_all)
                probs = jax.nn.softmax(scores.astype(jnp.float32),
                                       -1).astype(x.dtype)
                attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v_all)
            x = x + dense(layer["attn"]["out"], _merge_heads(attn))
            h = layer_norm(layer["mlp_ln"], x)
            x = x + _mlp(layer, h)
            return x, None

        # per-LAYER checkpointing (models/whisper._remat_body): the
        # backward scan recomputes one layer — including its ppermute
        # ring, which jax.checkpoint replays (collectives transpose the
        # same way on recompute). Long-audio SP training is exactly where
        # per-layer boundaries vs whole-stack activations decides the
        # feasible window length.
        from audax.models.whisper import _remat_body
        x_local, _ = lax.scan(_remat_body(body, remat), x_local, layers)
        return layer_norm(ln, x_local)

    return local_stack


def sp_whisper_forward(params, cfg: WhisperConfig, mel: jnp.ndarray,
                       tokens: jnp.ndarray, mesh: Mesh, *,
                       seq_axis: str = "seq", data_axis: str = "data",
                       dtype=jnp.float32, ring: bool = True,
                       remat=False) -> jnp.ndarray:
    """Differentiable seq2seq forward with the ENCODER sequence-parallel.

    Long-audio training (>30 s windows) shards the mel-frame axis over
    ``seq_axis`` through the encoder stack; the decoder (short label rows)
    runs batch-sharded over ``data_axis``, cross-attending over the
    re-gathered encoder states (GSPMD inserts the all-gather from the
    sharding constraint). NOT def-site jitted: this is a training-forward
    meant to live under the caller's jitted loss/grad.

    The reference's long-context answer was chunking at data-prep time
    (SURVEY.md §5); this is the TPU-native capability replacing it.
    """
    x = conv_stem(params, cfg, mel, dtype)           # [B, S, d]
    n_seq = mesh.shape[seq_axis]
    if x.shape[1] % n_seq:
        raise ValueError(f"sequence {x.shape[1]} not divisible by "
                         f"seq axis {n_seq}")
    if x.shape[0] % mesh.shape[data_axis]:
        raise ValueError(f"batch {x.shape[0]} not divisible by "
                         f"data axis {mesh.shape[data_axis]}")
    sharded = shard_map(
        _make_local_stack(cfg, seq_axis=seq_axis, n_seq=n_seq, ring=ring,
                          remat=remat),
        mesh=mesh,
        in_specs=(P(data_axis, seq_axis, None), P(), P()),
        out_specs=P(data_axis, seq_axis, None),
    )
    x = lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(data_axis, seq_axis, None)))
    enc = sharded(x, params["encoder"]["layers"], params["encoder"]["ln"])
    # decoder: batch over 'data', full (gathered) encoder states per device
    enc = lax.with_sharding_constraint(
        enc, NamedSharding(mesh, P(data_axis, None, None)))
    return decode_train(params, cfg, tokens, enc, dtype, remat=remat)


def make_sp_finetune_step(model_cfg: WhisperConfig, mesh: Mesh,
                          cfg: FineTuneConfig, *, seq_axis: str = "seq",
                          data_axis: str = "data", dtype=jnp.float32,
                          ring: bool = True):
    """Jitted DP x SP fine-tune step (same contract as
    train/seq2seq.py:make_finetune_step): batch = {"mel",
    "decoder_input_ids", "labels"}, returns (new_state, {"loss"}).

    Gradients flow through the ring-attention ``shard_map``: the
    ``ppermute`` K/V rotations transpose to the inverse ring (the same
    trick that made PP training differentiable, parallel/pp.py), so the
    update is exactly the single-device fine-tune step's — asserted by
    tests/test_sp.py and the multichip dryrun SP-train stage.

    ``cfg.accum_steps > 1`` composes gradient accumulation with the ring:
    the microbatch ``lax.scan`` sits OUTSIDE the ``shard_map`` (each
    scanned microbatch runs its own full SP forward/backward), gradients
    of the summed CE + token counts accumulate and normalize once — the
    exact full-batch update, same contract as
    train/seq2seq.py:make_finetune_step. Long-audio training is precisely
    where this matters: big encoder activations force small microbatches.
    """
    import optax
    from audax.models.lora import apply_lora
    from audax.train.seq2seq import seq2seq_loss, seq2seq_loss_sum

    accum_steps = max(1, cfg.accum_steps)

    def params_of(trainable, state):
        if state.use_lora:
            return apply_lora(jax.lax.stop_gradient(state.base_params),
                              trainable, state.lora_alpha)
        return trainable

    # same remat semantics as make_finetune_step: the config's
    # gradient_checkpointing flag turns on per-layer checkpointing in
    # BOTH stacks (inside the SP shard_map for the encoder)
    remat = cfg.gradient_checkpointing

    def _logits(trainable, state, batch):
        return sp_whisper_forward(
            params_of(trainable, state), model_cfg, batch["mel"],
            batch["decoder_input_ids"], mesh, seq_axis=seq_axis,
            data_axis=data_axis, dtype=dtype, ring=ring, remat=remat)

    def loss_fn(trainable, state, batch):
        return seq2seq_loss(
            _logits(trainable, state, batch).astype(jnp.float32),
            batch["labels"])

    def sum_loss_fn(trainable, state, batch):
        return seq2seq_loss_sum(
            _logits(trainable, state, batch).astype(jnp.float32),
            batch["labels"])

    def accum_grads(state, batch):
        b = batch["labels"].shape[0]
        if b % accum_steps:
            raise ValueError(f"batch size {b} not divisible by "
                             f"accum_steps={accum_steps}")
        micro = jax.tree.map(
            lambda x: x.reshape((accum_steps, b // accum_steps)
                                + x.shape[1:]), batch)

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

    @jax.jit
    def step(state, batch):
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
