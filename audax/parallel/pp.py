"""Pipeline parallelism for the Whisper encoder (GPipe-style, shard_map).

Layers are split across a ``stage`` mesh axis — the stacked-layer layout
makes this a PartitionSpec on the layer axis, no repacking. Microbatches
flow through the stages: each pipeline tick every stage runs its local
layer slice, then activations ``ppermute`` one hop down the ring while the
first stage injects the next microbatch. After ``n_micro + n_stages - 1``
ticks every microbatch has crossed every stage; outputs are collected on
the last stage and psum-broadcast out.

Exact (tested equal to the plain encoder). Bubble fraction is the usual
(S-1)/(M+S-1); pick n_micro >= stages for efficiency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from audax.core.config import WhisperConfig
from audax.models.whisper import attention, layer_norm, _mlp
from audax.models.whisper import conv_stem

__all__ = ["encode_pipelined"]


def encode_pipelined(
    params, cfg: WhisperConfig, mel: jnp.ndarray, mesh: Mesh,
    *, stage_axis: str = "stage", n_micro: int = 4, dtype=jnp.float32,
) -> jnp.ndarray:
    """mel [B, T_frames, n_mels] -> encoder states, encoder layers pipelined
    over the ``stage`` mesh axis. B must divide into n_micro microbatches;
    encoder_layers must divide by the stage count."""
    n_stages = mesh.shape[stage_axis]
    if cfg.encoder_layers % n_stages:
        raise ValueError(f"{cfg.encoder_layers} layers not divisible by "
                         f"{n_stages} stages")
    x = conv_stem(params, cfg, mel, dtype)             # [B, S, d]
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
    mb = b // n_micro
    micro = x.reshape(n_micro, mb, *x.shape[1:])       # [M, mb, S, d]

    enc_layers = params["encoder"]["layers"]
    enc_ln = params["encoder"]["ln"]
    total_ticks = n_micro + n_stages - 1

    def block(x, layer):
        h = layer_norm(layer["attn_ln"], x)
        x = x + attention(layer["attn"], h, cfg.heads)
        h = layer_norm(layer["mlp_ln"], x)
        x = x + _mlp(layer, h)
        return x, None

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
            injected = micro_all[inject_idx]
            take_new = jnp.logical_and(is_first, t < n_micro)
            current = jnp.where(take_new, injected, current)
            processed, _ = lax.scan(block, current, layers_local)
            out_idx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            emit = jnp.logical_and(is_last, t >= n_stages - 1)
            updated = lax.dynamic_update_slice(outputs, processed[None],
                                               (out_idx, 0, 0, 0))
            outputs = jnp.where(emit, updated, outputs)
            nxt = lax.ppermute(processed, stage_axis, fwd) \
                if n_stages > 1 else processed
            return (nxt, outputs), None

        init = (jnp.zeros_like(micro_all[0]),
                jnp.zeros_like(micro_all))
        # carries become stage-varying after the first tick; mark them so
        init = jax.tree.map(
            lambda x: lax.pcast(x, (stage_axis,), to="varying"), init)
        (_, outputs), _ = lax.scan(tick, init,
                                   jnp.arange(total_ticks))
        # only the last stage holds real outputs; broadcast them
        outputs = jnp.where(is_last, outputs, jnp.zeros_like(outputs))
        return lax.psum(outputs, stage_axis)

    layer_spec = P(stage_axis)                  # slice the stacked layer axis
    out = shard_map(
        stage_fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: layer_spec, enc_layers), P()),
        out_specs=P(),
    )(enc_layers, micro)
    out = out.reshape(b, *x.shape[1:])
    return layer_norm(enc_ln, out)
