"""Beam-search decoding (fixed-width, fully jitted).

openai-whisper's ``transcribe(beam_size=K)`` path, rebuilt as one
``lax.while_loop``: beams live in the batch dimension ([B*W] rows through
the same KV-cached decode_step), finished hypotheses are frozen in place
(forced EOS, zero score delta), and the loop exits early when every beam of
every item has finished. Length handling follows whisper: hypotheses are
ranked by sum-logprob / length, or by the GNMT penalty
``((5 + len) / 6) ** length_penalty`` when ``length_penalty`` is set
(openai's MaximumLikelihoodRanker).

``patience`` (openai transcribe's beam knob, Kasai et al. 2022): collect
``round(beam_width * patience)`` finished hypotheses before committing.
Here the search runs that many lanes internally — termination still
requires every lane finished — and returns the top ``beam_width`` after
ranking. This keeps the fixed-shape single while_loop (openai maintains a
first-come-first-served finished pool beside ``beam_width`` live beams;
the candidate-count contract is the same, the eviction order differs).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from audax.core.config import WhisperConfig
from audax.infer.decode import (TimestampRules, apply_timestamp_rules,
                                tp_shard_kv)
from audax.models.whisper import (KVCache, decode_step, init_kv_cache,
                                  precompute_cross_kv)

__all__ = ["beam_search", "BeamResult"]


class BeamResult(NamedTuple):
    tokens: jnp.ndarray       # [B, W, max_len] best-first
    lengths: jnp.ndarray      # [B, W]
    scores: jnp.ndarray       # [B, W] ranking score (length-normalized or
    # GNMT-penalized logprob, depending on length_penalty)
    sum_logprob: jnp.ndarray = None  # [B, W] raw sum of token logprobs


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_len", "eos_id", "beam_width", "dtype",
                     "mesh", "timestamps", "kv_quant", "patience",
                     "length_penalty"))
def beam_search(
    params,
    cfg: WhisperConfig,
    enc: jnp.ndarray,             # [B, S, d]
    prompt: jnp.ndarray,          # [B, P] forced prefix
    *,
    max_len: int,
    eos_id: int,
    beam_width: int = 5,
    suppress: Optional[jnp.ndarray] = None,
    first_suppress: Optional[jnp.ndarray] = None,  # ids banned at the first
    # generated position only (whisper's SuppressBlank: ' ' + EOT)
    timestamps: Optional[TimestampRules] = None,
    dtype=jnp.float32,
    mesh=None,                    # jax.sharding.Mesh with a 'model' axis
    kv_quant: bool = False,       # int8 self+cross KV (whisper.QuantKV)
    patience: Optional[float] = None,      # collect round(W*patience) lanes
    length_penalty: Optional[float] = None,  # GNMT alpha; None = 1/length
) -> BeamResult:
    b, p_len = prompt.shape
    if patience is not None and patience < 1.0:
        raise ValueError(f"patience must be >= 1.0, got {patience}")
    w = max(beam_width, int(round(beam_width * (patience or 1.0))))
    bw = b * w
    neg_inf = jnp.finfo(jnp.float32).min

    # replicate encoder state / prompt across beams -> [B*W, ...]
    enc_rep = jnp.repeat(enc, w, axis=0)
    cross_kv = precompute_cross_kv(params, cfg, enc_rep, quant=kv_quant)
    cache = init_kv_cache(cfg, bw, max_len, dtype, quant=kv_quant)
    if mesh is not None:
        # TP: heads over 'model', beam-flattened batch over 'data'
        cross_kv, cache = tp_shard_kv(mesh, cfg, cross_kv, cache, bw)
    tokens = jnp.zeros((bw, max_len), jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, jnp.repeat(prompt, w, 0), (0, 0))

    # beam 0 starts live; others at -inf so the first expansion fans out
    init_scores = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((w - 1,), neg_inf)]), b)

    class Carry(NamedTuple):
        pos: jnp.ndarray
        tokens: jnp.ndarray      # [B*W, max_len]
        cache: KVCache
        scores: jnp.ndarray      # [B*W] sum logprob
        done: jnp.ndarray        # [B*W]
        lengths: jnp.ndarray     # [B*W]
        prev_ts: jnp.ndarray     # [B*W] timestamp-rule carries
        prevprev_ts: jnp.ndarray
        last_ts: jnp.ndarray

    def cond(c: Carry):
        return jnp.logical_and(c.pos < max_len - 1, ~jnp.all(c.done))

    def body(c: Carry):
        logits, cache = decode_step(params, cfg, c.tokens[:, c.pos], c.pos,
                                    c.cache, cross_kv, dtype)
        # suppress/constrain BEFORE log_softmax so remaining logprobs
        # renormalize over the allowed vocabulary (matches decode.py's
        # constrain ordering and whisper's logit filters)
        logits = logits.astype(jnp.float32)
        if suppress is not None and suppress.size:
            logits = logits.at[:, suppress].set(neg_inf)
        if first_suppress is not None and first_suppress.size:
            banned = logits.at[:, first_suppress].set(neg_inf)
            logits = jnp.where(c.pos + 1 == p_len, banned, logits)
        if timestamps is not None:
            logits = apply_timestamp_rules(
                logits, timestamps, first=c.pos + 1 == p_len,
                prev_ts=c.prev_ts, prevprev_ts=c.prevprev_ts,
                last_ts=c.last_ts)
        logp = jax.nn.log_softmax(logits, -1)
        v = logp.shape[-1]
        in_prompt = c.pos + 1 < p_len

        # finished beams contribute exactly one continuation: EOS at score 0
        eos_only = jnp.full((bw, v), neg_inf).at[:, eos_id].set(0.0)
        step_logp = jnp.where(c.done[:, None], eos_only, logp)
        cand = c.scores[:, None] + step_logp                 # [B*W, V]
        cand = cand.reshape(b, w * v)
        top_scores, top_idx = lax.top_k(cand, w)             # [B, W]
        src_beam = top_idx // v                              # within-item beam
        new_tok = (top_idx % v).astype(jnp.int32)

        # gather rows ([B, W] -> flat [B*W] source indices)
        base = (jnp.arange(b) * w)[:, None]
        src = (base + src_beam).reshape(-1)

        def pick(x):
            return x[src]

        tokens = pick(c.tokens)
        scores = top_scores.reshape(-1)
        done = pick(c.done)
        lengths = pick(c.lengths)
        # reorder the POST-step cache (contains this step's new K/V);
        # tree-mapped so float KVCache and int8 QuantKV both reorder
        cache = jax.tree.map(lambda a: a[:, src], cache)

        nxt = new_tok.reshape(-1)
        # during the prompt, force the prompt token and keep scores at init.
        # c.scores must stay UNGATHERED here: during prompt steps every
        # top-k candidate routes through beam 0 (lanes 1..W-1 sit at -inf),
        # so pick(c.scores) would copy beam 0's score 0 into every lane —
        # destroying the -inf lane init and collapsing the search into W
        # identical greedy decodes once real expansion starts.
        nxt = jnp.where(in_prompt, tokens[:, c.pos + 1], nxt)
        scores = jnp.where(in_prompt, c.scores, scores)
        nxt = jnp.where(done, eos_id, nxt)
        tokens = lax.dynamic_update_slice(tokens, nxt[:, None], (0, c.pos + 1))

        if timestamps is not None:
            is_ts = nxt >= timestamps.timestamp_begin
            prevprev_ts = jnp.where(in_prompt, pick(c.prevprev_ts),
                                    pick(c.prev_ts))
            prev_ts = jnp.where(in_prompt, pick(c.prev_ts), is_ts)
            last_ts = jnp.where(jnp.logical_and(is_ts, ~in_prompt),
                                jnp.maximum(pick(c.last_ts), nxt),
                                pick(c.last_ts))
        else:
            prev_ts = pick(c.prev_ts)
            prevprev_ts = pick(c.prevprev_ts)
            last_ts = pick(c.last_ts)

        newly_done = jnp.logical_and(~in_prompt,
                                     jnp.logical_and(~done, nxt == eos_id))
        lengths = jnp.where(newly_done, c.pos + 2, lengths)
        done = jnp.logical_or(done, newly_done)
        return Carry(c.pos + 1, tokens, cache, scores, done, lengths,
                     prev_ts, prevprev_ts, last_ts)

    # last_ts starts one below timestamp_begin: "no timestamp emitted yet"
    ts0 = timestamps.timestamp_begin - 1 if timestamps is not None else 0
    final = lax.while_loop(
        cond, body,
        Carry(jnp.int32(0), tokens, cache, init_scores,
              jnp.zeros((bw,), bool), jnp.full((bw,), max_len, jnp.int32),
              # prev_ts starts True (NOT just prevprev — the first step's
              # shift overwrites prevprev before it is read): the decision
              # after a lone opening timestamp must see a completed pair,
              # openai's len(seq)<2 rule — see decode.py
              jnp.ones((bw,), bool), jnp.ones((bw,), bool),
              jnp.full((bw,), ts0, jnp.int32)))

    tokens = final.tokens.reshape(b, w, max_len)
    lengths = final.lengths.reshape(b, w)
    sum_lp = final.scores.reshape(b, w)
    gen_len = jnp.maximum(lengths - p_len, 1)
    if length_penalty is None:
        penalty = gen_len.astype(jnp.float32)    # whisper default: 1/length
    else:
        penalty = ((5.0 + gen_len.astype(jnp.float32)) / 6.0) \
            ** length_penalty                    # GNMT (openai ranker)
    norm_scores = sum_lp / penalty
    order = jnp.argsort(-norm_scores, axis=1)[:, :beam_width]
    tokens = jnp.take_along_axis(tokens, order[:, :, None], 1)
    lengths = jnp.take_along_axis(lengths, order, 1)
    norm_scores = jnp.take_along_axis(norm_scores, order, 1)
    sum_lp = jnp.take_along_axis(sum_lp, order, 1)
    return BeamResult(tokens, lengths, norm_scores, sum_lp)
