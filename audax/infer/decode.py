"""Autoregressive decoding: jitted greedy / sampling loops with Whisper's
timestamp rules.

The reference decodes by recomputing the full prefix per token with no KV
cache (reference: .charles/music2midi/model.py:293-344) or defers to
openai-whisper's ``model.transcribe`` (AB/wavToWhisper.py:10-13) / HF
``generate`` (AB/fineTuneMidiTester.py:26-49). Here decoding is ONE compiled
``lax.while_loop`` over models/whisper.py:decode_step: O(n) work, fixed
shapes, early exit when every sequence has emitted EOS. Mean log-probability
is accumulated in-loop so the transcription layer can run whisper's
temperature-fallback ladder without a second pass.

Timestamp rules (the structural subset of openai-whisper's
ApplyTimestampRules, active when ``timestamps`` info is passed):
  * the first generated token must be a timestamp;
  * timestamps come in pairs: after a lone timestamp the next token must be
    a timestamp (or EOT); after a timestamp pair the next must be text;
  * the opening timestamp counts as a completed pair (openai-whisper treats
    ``len(seq) < 2`` as penultimate-was-timestamp), so text follows it;
  * timestamps are monotonically non-decreasing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from audax.core.config import WhisperConfig
from audax.models.whisper import KVCache, decode_step, init_kv_cache, precompute_cross_kv

__all__ = ["generate", "GenerateResult", "TimestampRules",
           "apply_timestamp_rules", "tp_shard_kv"]


def tp_shard_kv(mesh, cfg: WhisperConfig, cross_kv, cache, batch: int):
    """Sharding-constrain decode KV tensors [layers, B, H, len, hd] over
    the mesh (policy lives in parallel/sharding.py:constrain_kv — heads on
    'model', batch on 'data' when divisible; QuantKV scales [L, B, H, len]
    shard the same leading axes). Serves generate() and beam_search()."""
    from audax.parallel.sharding import constrain_kv
    return (constrain_kv(mesh, cfg.heads, batch, cross_kv),
            constrain_kv(mesh, cfg.heads, batch, cache))


class TimestampRules(NamedTuple):
    """Static tokenizer facts needed to enforce whisper timestamp structure."""
    timestamp_begin: int
    eot_id: int


def apply_timestamp_rules(logits, rules: TimestampRules, *, first,
                          prev_ts, prevprev_ts, last_ts):
    """Mask ``logits`` [B, V] per whisper's timestamp structure. ``first`` is
    a scalar bool (first generated position); the ``*_ts`` carries are [B],
    with ``last_ts`` initialized to ``timestamp_begin - 1`` (= nothing
    emitted yet). Shared by greedy/sampling decode and beam search.

    Monotonicity follows openai's ApplyTimestampRules exactly: mid-pair the
    closing timestamp may EQUAL the opener, but a new segment's opener must
    be STRICTLY greater than the last timestamp — each segment has nonzero
    width, so a degenerate model can't loop zero-length segments forever."""
    neg_inf = jnp.finfo(jnp.float32).min
    ts0 = rules.timestamp_begin
    vocab_ids = jnp.arange(logits.shape[-1])
    is_ts_col = (vocab_ids >= ts0)[None, :]
    is_eot_col = (vocab_ids == rules.eot_id)[None, :]
    # openai state machine over the last two generated tokens:
    #   first position          -> ONLY a timestamp (openai masks
    #                              logits[:timestamp_begin], so EOT — which
    #                              sits below timestamp_begin — is banned)
    #   <text><ts> (mid pair)   -> the closing timestamp or EOT
    #   <ts><ts> / lone opener  -> timestamps banned, text must follow
    #     (the lone opener is the len(seq)<2 case: penultimate defaults True)
    mid_pair = jnp.logical_and(prev_ts, ~prevprev_ts)   # [B]
    after_pair = jnp.logical_and(prev_ts, prevprev_ts)
    first_col = jnp.asarray(first).reshape(-1, 1)
    ban = jnp.where(
        first_col,
        ~is_ts_col,                                     # only timestamps
        jnp.where(mid_pair[:, None],
                  jnp.logical_and(~is_ts_col, ~is_eot_col),  # text banned
                  jnp.where(after_pair[:, None],
                            is_ts_col,                  # timestamps banned
                            jnp.zeros_like(is_ts_col))))
    min_ts = last_ts + jnp.where(mid_pair, 0, 1)
    below = vocab_ids[None, :] < min_ts[:, None]
    ban = jnp.logical_or(ban, jnp.logical_and(is_ts_col, below))
    return jnp.where(ban, neg_inf, logits)


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray      # [B, max_len] int32 (prompt + generated + pad)
    lengths: jnp.ndarray     # [B] int32 total valid length (incl. prompt)
    sum_logprob: jnp.ndarray  # [B] float32 sum of chosen-token logprobs
    gen_count: jnp.ndarray    # [B] int32 number of generated (scored) tokens
    #: [B] softmax probability of <|nospeech|> at the first generated
    #: position (openai's no_speech_prob; None unless generate() was given
    #: no_speech_id — beam/speculative paths don't compute it)
    no_speech_prob: Optional[jnp.ndarray] = None

    @property
    def avg_logprob(self) -> jnp.ndarray:
        return self.sum_logprob / jnp.maximum(self.gen_count, 1)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "max_len", "eos_id", "temperature", "dtype",
                     "timestamps", "mesh", "kv_quant", "no_speech_id"))
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
    first_suppress: Optional[jnp.ndarray] = None,  # [K2] ids banned at the
    # FIRST generated position only (whisper's SuppressBlank: ' ' + EOT)
    timestamps: Optional[TimestampRules] = None,
    dtype=jnp.float32,
    mesh=None,                     # jax.sharding.Mesh with a 'model' axis
    kv_quant: bool = False,        # int8 self+cross KV (whisper.QuantKV)
    no_speech_id: Optional[int] = None,   # record openai's no_speech_prob
    no_speech_pos: Optional[jnp.ndarray] = None,  # prompt index of <|sot|>
) -> GenerateResult:
    """Decode until EOS or ``max_len``. The prompt is teacher-forced through
    the same cached step (cheap: P is tiny), then generation proceeds
    greedily or by temperature sampling.

    With ``mesh`` set (tensor parallelism), the self- and cross-attention KV
    caches are sharding-constrained over heads on the 'model' axis, matching
    the Megatron-style column/row split of the attention projections
    (parallel/sharding.py:WHISPER_TP_RULES) — the whole while_loop then runs
    head-parallel with one all-reduce per layer, so generation scales with
    the mesh instead of running replicated."""
    b, p_len = prompt.shape
    cross_kv = precompute_cross_kv(params, cfg, enc, quant=kv_quant)
    cache = init_kv_cache(cfg, b, max_len, dtype, quant=kv_quant)
    if mesh is not None:
        cross_kv, cache = tp_shard_kv(mesh, cfg, cross_kv, cache, b)
    tokens = jnp.zeros((b, max_len), jnp.int32)
    tokens = lax.dynamic_update_slice(tokens, prompt, (0, 0))
    rng = rng if rng is not None else jax.random.key(0)
    neg_inf = jnp.finfo(jnp.float32).min

    def constrain(logits, carry):
        if suppress is not None and suppress.size:
            logits = logits.at[:, suppress].set(neg_inf)
        if first_suppress is not None and first_suppress.size:
            banned = logits.at[:, first_suppress].set(neg_inf)
            logits = jnp.where(carry.pos + 1 == p_len, banned, logits)
        if timestamps is not None:
            logits = apply_timestamp_rules(
                logits, timestamps, first=carry.pos + 1 == p_len,
                prev_ts=carry.prev_ts, prevprev_ts=carry.prevprev_ts,
                last_ts=carry.last_ts)
        return logits

    class Carry(NamedTuple):
        pos: jnp.ndarray
        tokens: jnp.ndarray
        cache: KVCache
        done: jnp.ndarray
        lengths: jnp.ndarray
        rng: jax.Array
        sum_logprob: jnp.ndarray
        gen_count: jnp.ndarray
        prev_ts: jnp.ndarray       # [B] last generated token was a timestamp
        prevprev_ts: jnp.ndarray
        last_ts: jnp.ndarray       # [B] highest timestamp id emitted
        nsp: jnp.ndarray           # [B] no-speech prob at first gen position

    def cond(c: Carry):
        return jnp.logical_and(c.pos < max_len - 1, ~jnp.all(c.done))

    def body(c: Carry):
        logits, cache = decode_step(params, cfg, c.tokens[:, c.pos], c.pos,
                                    c.cache, cross_kv, dtype)
        logits = logits.astype(jnp.float32)
        in_prompt = c.pos + 1 < p_len
        if no_speech_id is not None:
            # openai's no_speech_prob: raw softmax mass of <|nospeech|> in
            # the logits AT the <|sot|> position (BEFORE suppression/rules
            # and BEFORE lang/task conditioning — openai reads
            # logits[:, sot_index]; measuring after the full prompt loses
            # most of the no-speech mass). ``no_speech_pos`` is the
            # prompt's sot index; default = the step before the first
            # generated token (plain prompts end ...task/notimestamps, so
            # callers should pass the true sot index).
            at = (jnp.int32(no_speech_pos) if no_speech_pos is not None
                  else jnp.int32(p_len - 1))
            p_ns = jax.nn.softmax(logits, -1)[:, no_speech_id]
            nsp = jnp.where(c.pos == at, p_ns, c.nsp)
        else:
            nsp = c.nsp
        constrained = constrain(logits, c)
        key = jax.random.fold_in(c.rng, c.pos)
        if temperature == 0.0:
            nxt = jnp.argmax(constrained, -1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(key, constrained / temperature,
                                         -1).astype(jnp.int32)
        nxt = jnp.where(in_prompt, c.tokens[:, c.pos + 1], nxt)
        nxt = jnp.where(c.done, eos_id, nxt)
        tokens = lax.dynamic_update_slice(c.tokens, nxt[:, None], (0, c.pos + 1))

        # score the chosen token (skip prompt positions and finished rows)
        logprobs = jax.nn.log_softmax(constrained, -1)
        chosen = jnp.take_along_axis(logprobs, nxt[:, None], -1)[:, 0]
        score = jnp.logical_and(~in_prompt, ~c.done)
        sum_logprob = c.sum_logprob + jnp.where(score, chosen, 0.0)
        gen_count = c.gen_count + score.astype(jnp.int32)

        if timestamps is not None:
            is_ts = nxt >= timestamps.timestamp_begin
            prevprev_ts = jnp.where(in_prompt, c.prevprev_ts, c.prev_ts)
            prev_ts = jnp.where(in_prompt, c.prev_ts, is_ts)
            last_ts = jnp.where(jnp.logical_and(is_ts, ~in_prompt),
                                jnp.maximum(c.last_ts, nxt), c.last_ts)
        else:
            prev_ts, prevprev_ts, last_ts = c.prev_ts, c.prevprev_ts, c.last_ts

        newly_done = jnp.logical_and(~in_prompt, nxt == eos_id)
        done = jnp.logical_or(c.done, newly_done)
        lengths = jnp.where(jnp.logical_and(newly_done, ~c.done),
                            c.pos + 2, c.lengths)
        return Carry(c.pos + 1, tokens, cache, done, lengths, c.rng,
                     sum_logprob, gen_count, prev_ts, prevprev_ts, last_ts,
                     nsp)

    # last_ts starts one below timestamp_begin: "no timestamp emitted yet"
    ts0 = timestamps.timestamp_begin - 1 if timestamps is not None else 0
    init = Carry(jnp.int32(0), tokens, cache,
                 jnp.zeros((b,), bool), jnp.full((b,), max_len, jnp.int32),
                 rng, jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.int32),
                 # prev_ts starts True: the step producing the FIRST
                 # generated token shifts it into prevprev, so the decision
                 # after a lone opening timestamp sees (prev=True,
                 # prevprev=True) = completed pair -> text must follow —
                 # openai's len(seq) < 2 => penultimate_was_timestamp=True.
                 # (Initializing prevprev instead is dead state: the shift
                 # overwrites it before its first read, which forced a
                 # doubled opening timestamp on every window.)
                 jnp.ones((b,), bool), jnp.ones((b,), bool),
                 jnp.full((b,), ts0, jnp.int32),
                 jnp.zeros((b,), jnp.float32))
    final = lax.while_loop(cond, body, init)
    return GenerateResult(final.tokens, final.lengths, final.sum_logprob,
                          final.gen_count,
                          final.nsp if no_speech_id is not None else None)
