"""Beam-search decoding (fixed-width, fully jitted).

openai-whisper's ``transcribe(beam_size=K)`` path, rebuilt as one
``lax.while_loop``: beams live in the batch dimension ([B*W] rows through
the same KV-cached decode_step). Finished hypotheses follow openai's
BeamSearchDecoder exactly (whisper/decoding.py BeamSearchDecoder.update):
a candidate ending in EOT vacates its lane into a per-item finished pool
and the lane is refilled with the next-best live continuation, so the
search always advances ``beam_width`` LIVE beams. The pool is
first-come-first-served with ``round(beam_width * patience)`` slots
(``patience``, Kasai et al. 2022): once full, later (even better-scoring)
finished candidates are dropped, and the loop exits when every item's pool
is full. Candidates still in flight at ``max_len`` pad any unfull pool in
descending sum-logprob order (openai's ``finalize``).

Candidate iteration order matches openai: within a step, candidates are
scanned best-first; an EOT candidate is pooled iff it outranks the W-th
live candidate (fewer than W non-EOT candidates precede it). Since each of
the W source beams proposes EOT at most once, the top ``2W`` candidates
always contain the W live continuations plus every poolable EOT — the
fixed-shape equivalent of openai's early-broken python loop.

Length handling follows whisper: hypotheses are ranked by
sum-logprob / length, or by the GNMT penalty ``((5 + len) / 6) ** alpha``
when ``length_penalty`` is set (openai's MaximumLikelihoodRanker). The
ranker runs over the full pool; the top ``beam_width`` are returned.
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


def _fcfs_partition(top_idx, v, eos_id, w):
    """Classify the 2W best-first candidates openai-style.

    Returns (is_live, lane, is_pooled, pool_rank):
      - ``is_live[b, j]``: candidate j is one of the first W non-EOT
        candidates (it becomes live lane ``lane[b, j]`` in 0..W-1);
      - ``is_pooled[b, j]``: candidate j ends in EOT AND outranks the W-th
        live candidate (openai scans best-first and breaks after W live,
        so only EOTs seen before that break are saved);
      - ``pool_rank[b, j]``: this step's insertion order among pooled
        candidates (0-based, best-first — openai appends in scan order).

    Pure index math, unit-tested directly in tests/test_beam.py.
    """
    is_eot = (top_idx % v) == eos_id
    nonfin_before = jnp.cumsum(~is_eot, axis=-1) - (~is_eot)  # exclusive
    before_break = nonfin_before < w
    is_live = jnp.logical_and(~is_eot, before_break)
    lane = nonfin_before
    is_pooled = jnp.logical_and(is_eot, before_break)
    pool_rank = jnp.cumsum(is_pooled, axis=-1) - is_pooled    # exclusive
    return is_live, lane, is_pooled, pool_rank


def _pool_slots(is_pooled, pool_rank, cnt, m):
    """FCFS slot assignment for one step's pooled candidates.

    Candidate j appends at ``cnt + pool_rank[j]``; any slot >= m is
    DROPPED (returned as the scatter-drop sentinel ``m``) — a full pool
    never evicts, no matter how well a later candidate scores. This is
    the first-come-first-served contract of openai's finished_sequences
    dict (update() only saves while ``len(sequences) < max_candidates``).
    Returns (clipped slots, inserted mask). Unit-tested directly.
    """
    slot = cnt[:, None] + pool_rank
    ok = jnp.logical_and(is_pooled, slot < m)
    return jnp.where(ok, slot, m), ok


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
    patience: Optional[float] = None,      # pool round(W*patience) finished
    length_penalty: Optional[float] = None,  # GNMT alpha; None = 1/length
) -> BeamResult:
    b, p_len = prompt.shape
    if patience is not None and patience < 1.0:
        raise ValueError(f"patience must be >= 1.0, got {patience}")
    w = beam_width
    m = max(w, int(round(w * (patience or 1.0))))  # finished-pool slots
    bw = b * w
    k2 = 2 * w
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
        tokens: jnp.ndarray      # [B*W, max_len] live lanes
        cache: KVCache
        scores: jnp.ndarray      # [B*W] live sum logprob
        prev_ts: jnp.ndarray     # [B*W] timestamp-rule carries
        prevprev_ts: jnp.ndarray
        last_ts: jnp.ndarray
        pool_tokens: jnp.ndarray  # [B, M, max_len] finished, FCFS order
        pool_sumlp: jnp.ndarray   # [B, M] (-inf = empty slot)
        pool_len: jnp.ndarray     # [B, M]
        pool_cnt: jnp.ndarray     # [B]

    def cond(c: Carry):
        return jnp.logical_and(c.pos < max_len - 1, ~jnp.all(c.pool_cnt >= m))

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

        cand = c.scores[:, None] + logp                      # [B*W, V]
        cand = cand.reshape(b, w * v)
        # top 2W best-first candidates: contains the W live continuations
        # plus every EOT candidate that outranks the W-th live one (each
        # source beam proposes EOT at most once -> <= W EOTs total)
        top_scores, top_idx = lax.top_k(cand, k2)            # [B, 2W]
        src_beam = top_idx // v                              # within-item beam
        new_tok = (top_idx % v).astype(jnp.int32)
        is_live, lane, is_pooled, pool_rank = _fcfs_partition(
            top_idx, v, eos_id, w)

        bidx = jnp.arange(b)[:, None]                        # [B, 1]

        # ---- finished pool: FCFS insert of this step's EOT candidates ----
        slot, ok = _pool_slots(jnp.logical_and(is_pooled, ~in_prompt),
                               pool_rank, c.pool_cnt, m)     # [B, 2W]
        # full candidate sequence: source-beam tokens, EOT from pos+1 on
        # (the eos tail matches generate()'s frozen-lane fill)
        seqs = c.tokens.reshape(b, w, max_len)[bidx, src_beam]  # [B, 2W, L]
        seqs = jnp.where(jnp.arange(max_len) >= c.pos + 1, eos_id, seqs)
        pool_tokens = c.pool_tokens.at[bidx, slot].set(seqs, mode="drop")
        pool_sumlp = c.pool_sumlp.at[bidx, slot].set(top_scores, mode="drop")
        pool_len = c.pool_len.at[bidx, slot].set(c.pos + 2, mode="drop")
        pool_cnt = c.pool_cnt + ok.sum(-1)

        # ---- live lanes: the first W non-EOT candidates refill the beams --
        lane = jnp.where(is_live, lane, w)                   # w -> dropped
        z = jnp.zeros((b, w))
        live_scores = z.at[bidx, lane].set(top_scores, mode="drop")
        live_src = jnp.zeros((b, w), jnp.int32).at[bidx, lane].set(
            src_beam.astype(jnp.int32), mode="drop")
        live_tok = jnp.zeros((b, w), jnp.int32).at[bidx, lane].set(
            new_tok, mode="drop")

        # gather rows ([B, W] -> flat [B*W] source indices)
        base = (jnp.arange(b) * w)[:, None]
        src = (base + live_src).reshape(-1)

        def pick(x):
            return x[src]

        tokens = pick(c.tokens)
        scores = live_scores.reshape(-1)
        # reorder the POST-step cache (contains this step's new K/V);
        # tree-mapped so float KVCache and int8 QuantKV both reorder
        cache = jax.tree.map(lambda a: a[:, src], cache)

        nxt = live_tok.reshape(-1)
        # during the prompt, force the prompt token and keep scores at init.
        # c.scores must stay UNGATHERED here: during prompt steps every
        # top-k candidate routes through beam 0 (lanes 1..W-1 sit at -inf),
        # so pick(c.scores) would copy beam 0's score 0 into every lane —
        # destroying the -inf lane init and collapsing the search into W
        # identical greedy decodes once real expansion starts.
        nxt = jnp.where(in_prompt, tokens[:, c.pos + 1], nxt)
        scores = jnp.where(in_prompt, c.scores, scores)
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

        return Carry(c.pos + 1, tokens, cache, scores,
                     prev_ts, prevprev_ts, last_ts,
                     pool_tokens, pool_sumlp, pool_len, pool_cnt)

    # last_ts starts one below timestamp_begin: "no timestamp emitted yet"
    ts0 = timestamps.timestamp_begin - 1 if timestamps is not None else 0
    final = lax.while_loop(
        cond, body,
        Carry(jnp.int32(0), tokens, cache, init_scores,
              # prev_ts starts True (NOT just prevprev — the first step's
              # shift overwrites prevprev before it is read): the decision
              # after a lone opening timestamp must see a completed pair,
              # openai's len(seq)<2 rule — see decode.py
              jnp.ones((bw,), bool), jnp.ones((bw,), bool),
              jnp.full((bw,), ts0, jnp.int32),
              jnp.zeros((b, m, max_len), jnp.int32),
              jnp.full((b, m), neg_inf),
              jnp.full((b, m), max_len, jnp.int32),
              jnp.zeros((b,), jnp.int32)))

    # openai finalize: ONLY pools with fewer than beam_width finished
    # candidates pad from the in-flight beams (descending sum-logprob),
    # and only up to beam_width total — a patience pool that already holds
    # >= W finished hypotheses takes NO unfinished ones, even if m slots
    # remain (whisper/decoding.py finalize's len(sequences) < beam_size
    # gate). Padded lanes keep length max_len (never emitted EOT).
    live_tokens = final.tokens.reshape(b, w, max_len)
    live_sumlp = final.scores.reshape(b, w)
    order = jnp.argsort(-live_sumlp, axis=1)                 # [B, W]
    bidx = jnp.arange(b)[:, None]
    pad_slot = final.pool_cnt[:, None] + jnp.arange(w)[None, :]
    pad_slot = jnp.where(pad_slot < w, pad_slot, m)          # m -> dropped
    pool_tokens = final.pool_tokens.at[bidx, pad_slot].set(
        live_tokens[bidx, order], mode="drop")
    pool_sumlp = final.pool_sumlp.at[bidx, pad_slot].set(
        live_sumlp[bidx, order], mode="drop")
    pool_len = final.pool_len.at[bidx, pad_slot].set(max_len, mode="drop")

    # rank the pool (openai MaximumLikelihoodRanker over max_candidates)
    gen_len = jnp.maximum(pool_len - p_len, 1)
    if length_penalty is None:
        penalty = gen_len.astype(jnp.float32)    # whisper default: 1/length
    else:
        penalty = ((5.0 + gen_len.astype(jnp.float32)) / 6.0) \
            ** length_penalty                    # GNMT (openai ranker)
    norm_scores = pool_sumlp / penalty
    # empty slots sit at -inf sum_logprob -> -inf/penalty ranks last
    top = jnp.argsort(-norm_scores, axis=1)[:, :beam_width]
    tokens = jnp.take_along_axis(pool_tokens, top[:, :, None], 1)
    lengths = jnp.take_along_axis(pool_len, top, 1)
    norm_scores = jnp.take_along_axis(norm_scores, top, 1)
    sum_lp = jnp.take_along_axis(pool_sumlp, top, 1)
    return BeamResult(tokens, lengths, norm_scores, sum_lp)
