"""Speculative decoding: a small draft Whisper proposes K tokens per
iteration; the target model verifies all K in ONE ``decode_span`` pass.

Single-stream greedy decode is HBM-bandwidth bound: every token re-reads
the full decoder weight set for one matvec row (the reference's serving
path regenerates the whole prefix per token on GPU,
/root/reference/.charles/music2midi/model.py:293-344, and AB/wavToWhisper.py
defers to openai-whisper's sequential loop). Here the expensive weight read
is amortised over K rows of the verifier matmul, and the cheap draft
(e.g. whisper-tiny vs large-v3, ~40x fewer decoder bytes) runs the
sequential part.

Token-exactness: every accepted token is the TARGET model's own greedy
argmax given the accepted prefix — the draft only decides how many
arrive per pass — so output, lengths, and scores match
``generate(temperature=0)`` (tested token-exact in
tests/test_speculative.py). Caveat: that guarantee is in exact
arithmetic; on the MXU the K-row verify matmul may tile/accumulate
differently from the 1-row step, and at bf16 that can flip argmax where
the top-2 logits are within rounding distance (random weights hit such
near-ties constantly, trained checkpoints rarely —
``bench-speculative`` reports the measured agreement rate). Rejected-
branch KV cache entries self-heal: spans always rewrite their slots
before attending (see models/whisper.py:decode_span).

Single-sequence (B=1) by design: this is the latency path; throughput
comes from batched serving (infer/streaming.py) where the weight read is
already amortised across streams.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from audax.core.config import WhisperConfig
from audax.infer.decode import GenerateResult
from audax.models.whisper import (decode_span, decode_step, init_kv_cache,
                                  precompute_cross_kv)

__all__ = ["generate_speculative"]


@functools.partial(
    jax.jit,
    static_argnames=("draft_cfg", "cfg", "max_len", "eos_id", "spec_tokens",
                     "dtype", "draft_dtype", "kv_quant"))
def generate_speculative(
    draft_params,
    params,
    draft_cfg: WhisperConfig,
    cfg: WhisperConfig,
    draft_enc: jnp.ndarray,        # [1, S, d_draft] draft encoder states
    enc: jnp.ndarray,              # [1, S, d] target encoder states
    prompt: jnp.ndarray,           # [1, P] int32
    *,
    max_len: int,
    eos_id: int,
    spec_tokens: int = 8,
    suppress: Optional[jnp.ndarray] = None,
    first_suppress: Optional[jnp.ndarray] = None,  # ids banned at the first
    # generated position only (SuppressBlank); applied to BOTH draft and
    # target at absolute position p_len so acceptance stays token-exact
    dtype=jnp.float32,
    draft_dtype=None,
    kv_quant: bool = False,
) -> GenerateResult:
    """Greedy decode, token-exact vs ``generate(temperature=0)``."""
    b, p_len = prompt.shape
    if b != 1:
        raise ValueError("speculative decoding is the B=1 latency path")
    if p_len >= max_len:
        raise ValueError("max_len must exceed the prompt length")
    if max_len - 1 + spec_tokens > min(cfg.n_text_ctx, draft_cfg.n_text_ctx):
        # the last verify span starts at position max_len-1 and reads K
        # rows of the position table; dynamic_slice would CLAMP the start
        # and silently mis-position every span token near the cap
        raise ValueError(
            f"max_len={max_len} + spec_tokens={spec_tokens} overruns the "
            f"position table (n_text_ctx={cfg.n_text_ctx}); cap max_len at "
            f"n_text_ctx - spec_tokens + 1")
    kk = spec_tokens
    draft_dtype = draft_dtype or dtype
    neg_inf = jnp.finfo(jnp.float32).min

    t_ckv = precompute_cross_kv(params, cfg, enc, quant=kv_quant)
    d_ckv = precompute_cross_kv(draft_params, draft_cfg, draft_enc)
    buf = max_len + kk             # span/bonus writes never clip
    t_cache = init_kv_cache(cfg, 1, buf, dtype, quant=kv_quant)
    d_cache = init_kv_cache(draft_cfg, 1, buf, draft_dtype)
    tokens = jnp.zeros((1, buf), jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompt, (0, 0))

    def constrain(logits, produced_pos=None):
        """``produced_pos``: absolute position(s) of the token each logit
        row produces — scalar for draft steps, [K] for the verify span —
        so SuppressBlank hits exactly the first generated position."""
        if suppress is not None and suppress.size:
            logits = logits.at[..., suppress].set(neg_inf)
        if (first_suppress is not None and first_suppress.size
                and produced_pos is not None):
            banned = logits.at[..., first_suppress].set(neg_inf)
            mask = jnp.asarray(produced_pos) == p_len
            if logits.ndim == 3:               # [1, K, V] verify span
                mask = mask[None, :, None]
            logits = jnp.where(mask, banned, logits)
        return logits

    # prefill positions 0..P-2; the last prompt token is fed by the first
    # speculative iteration (invariant: caches hold positions 0..l-2)
    if p_len > 1:
        _, t_cache = decode_span(params, cfg, prompt[:, : p_len - 1],
                                 jnp.int32(0), t_cache, t_ckv, dtype)
        _, d_cache = decode_span(draft_params, draft_cfg,
                                 prompt[:, : p_len - 1], jnp.int32(0),
                                 d_cache, d_ckv, draft_dtype)

    class Carry(NamedTuple):
        tokens: jnp.ndarray
        l: jnp.ndarray             # tokens[0..l-1] decided
        done: jnp.ndarray
        lengths: jnp.ndarray
        sum_logprob: jnp.ndarray
        gen_count: jnp.ndarray
        d_cache: object
        t_cache: object

    def cond(c: Carry):
        return jnp.logical_and(~c.done, c.l < max_len)

    def body(c: Carry):
        cur = lax.dynamic_slice(c.tokens, (0, c.l - 1), (1, 1))[:, 0]  # [1]

        # -- draft: K sequential cheap steps ------------------------------
        def draft_step(carry, i):
            dc, tok, pos = carry
            logits, dc = decode_step(draft_params, draft_cfg, tok, pos,
                                     dc, d_ckv, draft_dtype)
            nxt = jnp.argmax(constrain(logits.astype(jnp.float32), pos + 1),
                             -1).astype(jnp.int32)
            return (dc, nxt, pos + 1), nxt[0]

        (d_cache, _, _), d_vec = lax.scan(
            draft_step, (c.d_cache, cur, c.l - 1), jnp.arange(kk))

        # -- target: verify all K in one span pass ------------------------
        span = jnp.concatenate([cur[:, None], d_vec[None, : kk - 1]], 1)
        tlogits, t_cache = decode_span(params, cfg, span, c.l - 1,
                                       c.t_cache, t_ckv, dtype)
        tlogits = constrain(tlogits.astype(jnp.float32),
                            c.l + jnp.arange(kk))             # [1, K, V]
        t_vec = jnp.argmax(tlogits, -1)[0].astype(jnp.int32)  # [K]
        logprobs = jax.nn.log_softmax(tlogits, -1)
        chosen = jnp.take_along_axis(logprobs[0], t_vec[:, None], -1)[:, 0]

        # -- acceptance: longest matching prefix + the bonus token --------
        match = (d_vec == t_vec).astype(jnp.int32)
        m = jnp.sum(jnp.cumprod(match))            # leading matches
        a = jnp.minimum(jnp.minimum(m + 1, kk), max_len - c.l)
        idx = jnp.arange(kk)
        is_eos = jnp.logical_and(t_vec == eos_id, idx < a)
        any_eos = jnp.any(is_eos)
        first_eos = jnp.argmax(is_eos)
        accept_n = jnp.where(any_eos, first_eos + 1, a)

        tokens = lax.dynamic_update_slice(c.tokens, t_vec[None], (0, c.l))
        take = idx < accept_n
        sum_logprob = c.sum_logprob + jnp.sum(jnp.where(take, chosen, 0.0))
        gen_count = c.gen_count + accept_n
        new_l = c.l + accept_n
        done = jnp.logical_or(any_eos, new_l >= max_len)
        lengths = jnp.where(any_eos, new_l, c.lengths)
        return Carry(tokens, new_l, done, lengths, sum_logprob, gen_count,
                     d_cache, t_cache)

    init = Carry(tokens, jnp.int32(p_len), jnp.asarray(False),
                 jnp.int32(max_len), jnp.float32(0.0), jnp.int32(0),
                 d_cache, t_cache)
    final = lax.while_loop(cond, body, init)
    return GenerateResult(final.tokens[:, :max_len], final.lengths[None],
                          final.sum_logprob[None], final.gen_count[None])
