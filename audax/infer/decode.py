"""Autoregressive decoding: jitted greedy / temperature sampling loops.

The reference decodes by recomputing the full prefix per token with no KV
cache (reference: .charles/music2midi/model.py:293-344) or defers to HF
``generate`` (AB/fineTuneMidiTester.py:26-49). Here decoding is ONE compiled
``lax.while_loop`` over models/whisper.py:decode_step: O(n) work, fixed
shapes, early exit when every sequence has emitted EOS.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from audax.core.config import WhisperConfig
from audax.models.whisper import (KVCache, decode_step, init_kv_cache,
                                  precompute_cross_kv)

__all__ = ["generate", "GenerateResult"]


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray      # [B, max_len] int32 (prompt + generated + pad)
    lengths: jnp.ndarray     # [B] int32 total valid length (incl. prompt)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_len", "eos_id", "temperature", "dtype"))
def generate(
    params,
    cfg: WhisperConfig,
    enc: jnp.ndarray,              # [B, S, d] encoder states
    prompt: jnp.ndarray,           # [B, P] int32 forced prefix (SOT sequence)
    *,
    max_len: int,
    eos_id: int,
    temperature: float = 0.0,      # 0 => greedy
    rng: Optional[jax.Array] = None,
    suppress: Optional[jnp.ndarray] = None,   # [K] token ids never emitted
    dtype=jnp.float32,
) -> GenerateResult:
    """Decode until EOS or ``max_len``. The prompt is teacher-forced through
    the same cached step (cheap: P is tiny), then generation proceeds
    greedily or by temperature sampling (model.py:331-332 semantics)."""
    b, p_len = prompt.shape
    cross_kv = precompute_cross_kv(params, cfg, enc)
    cache = init_kv_cache(cfg, b, max_len, dtype)
    tokens = jnp.zeros((b, max_len), jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompt, (0, 0))
    rng = rng if rng is not None else jax.random.key(0)

    def mask_logits(logits):
        if suppress is not None and suppress.size:
            logits = logits.at[:, suppress].set(jnp.finfo(logits.dtype).min)
        return logits

    def pick(logits, key):
        logits = mask_logits(logits)
        if temperature == 0.0:
            return jnp.argmax(logits, -1).astype(jnp.int32)
        return jax.random.categorical(key, logits / temperature, -1).astype(jnp.int32)

    class Carry(NamedTuple):
        pos: jnp.ndarray
        tokens: jnp.ndarray
        cache: KVCache
        done: jnp.ndarray
        lengths: jnp.ndarray
        rng: jax.Array

    def cond(c: Carry):
        return jnp.logical_and(c.pos < max_len - 1, ~jnp.all(c.done))

    def body(c: Carry):
        logits, cache = decode_step(params, cfg, c.tokens[:, c.pos], c.pos,
                                    c.cache, cross_kv, dtype)
        key = jax.random.fold_in(c.rng, c.pos)
        nxt = pick(logits, key)
        in_prompt = c.pos + 1 < p_len
        nxt = jnp.where(in_prompt, c.tokens[:, c.pos + 1], nxt)
        nxt = jnp.where(c.done, eos_id, nxt)
        tokens = lax.dynamic_update_slice(c.tokens, nxt[:, None], (0, c.pos + 1))
        newly_done = jnp.logical_and(~in_prompt, nxt == eos_id)
        done = jnp.logical_or(c.done, newly_done)
        lengths = jnp.where(jnp.logical_and(newly_done, ~c.done),
                            c.pos + 2, c.lengths)
        return Carry(c.pos + 1, tokens, cache, done, lengths, c.rng)

    init = Carry(jnp.int32(0), tokens, cache,
                 jnp.zeros((b,), bool), jnp.full((b,), max_len, jnp.int32), rng)
    final = lax.while_loop(cond, body, init)
    return GenerateResult(final.tokens, final.lengths)
