"""Sequence parallelism for the Whisper encoder (shard_map over mel frames).

The reference handled long audio by chunking at data-prep time (SURVEY.md §5
long-context); sequence-axis sharding is a new capability. Design: activations
are sharded over a ``seq`` mesh axis along the frame dimension; per layer,
each device computes its local queries and all-gathers K/V over the ICI ring
(exact bidirectional attention, Ulysses-style comms = one all-gather per
layer). LayerNorm/MLP/projections are position-local, so no other
communication exists. Convs + positional offsets run before sharding.

This is exact (tested equal to the plain encoder) and composes with the
(data, model) axes: the dryrun mesh is (data, model, seq).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                   # jax >= 0.4.35
    from jax import shard_map
except ImportError:                    # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from audax.core.config import WhisperConfig
from audax.models.whisper import dense, layer_norm, _merge_heads, _mlp, _split_heads

__all__ = ["encode_sequence_parallel"]


def _conv_frontend(params, cfg: WhisperConfig, mel: jnp.ndarray,
                   dtype=jnp.float32) -> jnp.ndarray:
    p = params["encoder"]
    x = mel.astype(dtype)
    x = jax.nn.gelu(lax.conv_general_dilated(
        x, p["conv1"]["kernel"].astype(dtype), window_strides=(1,),
        padding=((1, 1),), dimension_numbers=("NHC", "HIO", "NHC"))
        + p["conv1"]["bias"].astype(dtype), approximate=False)
    x = jax.nn.gelu(lax.conv_general_dilated(
        x, p["conv2"]["kernel"].astype(dtype), window_strides=(2,),
        padding=((1, 1),), dimension_numbers=("NHC", "HIO", "NHC"))
        + p["conv2"]["bias"].astype(dtype), approximate=False)
    return x + p["pos"].astype(dtype)[None, : x.shape[1]]


def encode_sequence_parallel(
    params, cfg: WhisperConfig, mel: jnp.ndarray, mesh: Mesh,
    *, seq_axis: str = "seq", data_axis: str = "data", dtype=jnp.float32,
) -> jnp.ndarray:
    """mel [B, T_frames, n_mels] -> encoder states, with the frame axis
    sharded over ``seq_axis`` inside the transformer stack.

    Requires (T_frames // 2) divisible by the seq-axis size.
    """
    x = _conv_frontend(params, cfg, mel, dtype)      # [B, S, d]
    s = x.shape[1]
    n_seq = mesh.shape[seq_axis]
    if s % n_seq:
        raise ValueError(f"sequence {s} not divisible by seq axis {n_seq}")

    enc_layers = params["encoder"]["layers"]
    enc_ln = params["encoder"]["ln"]

    def local_stack(x_local, layers, ln):
        """Runs on each device: x_local [B, S/p, d]."""

        def body(x, layer):
            h = layer_norm(layer["attn_ln"], x)
            q = _split_heads(dense(layer["attn"]["q"], h), cfg.heads)
            k = _split_heads(dense(layer["attn"]["k"], h), cfg.heads)
            v = _split_heads(dense(layer["attn"]["v"], h), cfg.heads)
            # exact bidirectional attention: gather K/V across the ring
            k_all = lax.all_gather(k, seq_axis, axis=2, tiled=True)
            v_all = lax.all_gather(v, seq_axis, axis=2, tiled=True)
            scale = q.shape[-1] ** -0.5
            scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k_all)
            probs = jax.nn.softmax(scores.astype(jnp.float32), -1).astype(x.dtype)
            attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v_all)
            x = x + dense(layer["attn"]["out"], _merge_heads(attn))
            h = layer_norm(layer["mlp_ln"], x)
            x = x + _mlp(layer, h)
            return x, None

        x_local, _ = lax.scan(body, x_local, layers)
        return layer_norm(ln, x_local)

    sharded = shard_map(
        local_stack, mesh=mesh,
        in_specs=(P(data_axis, seq_axis, None), P(), P()),
        out_specs=P(data_axis, seq_axis, None),
    )
    x = jax.device_put(x, NamedSharding(mesh, P(data_axis, seq_axis, None)))
    return sharded(x, enc_layers, enc_ln)
