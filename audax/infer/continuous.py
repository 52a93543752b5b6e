"""Continuous batching: slot-refill serving over a ragged decode batch.

The fixed-batch paths (infer/decode.py:generate, infer/streaming.py) convoy
every request behind the slowest one in the batch — a slot that emits EOS at
token 12 idles until the longest slot finishes all ~224. Here the decode
loop runs in short compiled chunks over PER-SLOT positions
(models/whisper.py:decode_step_ragged, models/causal_lm.py:lm_decode_step
with a [B] ``pos``), and between chunks the host refills finished slots
with queued requests mid-flight — the vLLM-style serving schedule, built
TPU-first:

  * everything device-side is fixed-shape: [slots] caches, [slots] position
    vector, one compiled chunk program reused forever (no recompiles as
    requests come and go);
  * admits are BATCHED: up to ``slots`` queued requests are featurized and
    encoded in one device call (static power-of-two buckets), their
    cross-KV rows installed via one-hot gather+select (a predicated
    scatter over the big cross-KV lowered to a serial TPU loop — measured
    1.4× wall, reverted); the self-attention cache needs NO clearing on
    refill — stale entries beyond the new position are unreachable under
    the per-slot causal mask (ops/attention.py:decode_attention_stacked
    ``pos`` vector);
  * chunked host sync: ``steps_per_sync`` decode steps run per device call
    (early-exiting when every live slot is done), so the axon tunnel's
    dispatch latency is amortised over many tokens.

Two engines share the scheduling shell (``_SlotEngine``):

  * ``ContinuousBatcher`` — Whisper ASR (greedy, logprob-scored);
  * ``ContinuousGenerator`` — two-tower audio→ABC transcription
    (per-request reproducible temperature sampling).

The reference serves one file per ``model.transcribe`` call with no
batching at all (reference: AB/wavToWhisper.py:10-13) and its music2midi
generation loop is single-sample with no KV cache (reference:
.charles/music2midi/model.py:293-344); this engine is the capability its
serving story was missing.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from audax.core.config import WhisperConfig
from audax.core.logging import get_logger
from audax.frontend import LogMelFrontend
from audax.models.whisper import (decode_step_ragged, encode, init_kv_cache,
                                  precompute_cross_kv)
from audax.symbolic.tokenizer import WhisperTokenizer

log = get_logger("audax.continuous")

__all__ = ["ContinuousBatcher", "ContinuousGenerator", "Result"]


@dataclass
class Result:
    request_id: str
    text: str
    tokens: List[int]
    avg_logprob: float
    audio_seconds: float


from audax.parallel.sharding import constrain_kv as _constrain_kv  # noqa: E402


class _ServeState(NamedTuple):
    """Fixed-shape device state threaded through the chunk program."""
    cache: object          # self-attn KV [L, B, H, max_len, hd] (or QuantKV)
    cross_kv: object       # cross-attn KV [L, B, H, S, hd] (or QuantKV)
    tokens: jnp.ndarray    # [B, max_len] int32
    pos: jnp.ndarray       # [B] int32 — per-slot decode depth
    done: jnp.ndarray      # [B] bool — free OR finished (host refills)
    lengths: jnp.ndarray   # [B] int32 valid length incl. prompt + EOS
    sum_logprob: jnp.ndarray   # [B] f32
    gen_count: jnp.ndarray     # [B] int32
    budget: jnp.ndarray        # [B] int32 per-request max generated tokens


@jax.jit
def _pack_harvest(done, lengths, sum_logprob, gen_count):
    """Per-slot harvest metadata packed into ONE [B, 4] f32 fetch
    (done, length, sum_logprob, gen_count) — lengths/counts are far below
    f32's 2^24 integer range. Four separate small fetches cost four
    ~0.5 s tunnel round-trips per finishing chunk."""
    return jnp.stack([done.astype(jnp.float32),
                      lengths.astype(jnp.float32),
                      sum_logprob.astype(jnp.float32),
                      gen_count.astype(jnp.float32)], axis=1)


def _advance(st, nxt, logits, *, p_len: int, eos_id: int, bidx):
    """Shared post-logits bookkeeping for one ragged decode step: write
    the chosen token, accumulate its logprob, flip ``done`` on
    EOS/budget/overflow, freeze finished slots. ``st`` is any state with
    the common fields (tokens/pos/done/lengths/sum_logprob/gen_count/
    budget); returns the updated common fields as kwargs for
    ``st._replace``."""
    max_len = st.tokens.shape[1]
    in_prompt = st.pos + 1 < p_len                      # [B]
    nxt = jnp.where(st.done, eos_id, nxt)
    # done slots are frozen at their final pos — masking the write
    # keeps them from clobbering their own last real token with EOS
    # while neighbours still decode
    tokens = st.tokens.at[bidx, st.pos + 1].set(
        jnp.where(st.done, st.tokens[bidx, st.pos + 1], nxt))

    logprobs = jax.nn.log_softmax(logits, -1)
    chosen = jnp.take_along_axis(logprobs, nxt[:, None], -1)[:, 0]
    score = jnp.logical_and(~in_prompt, ~st.done)
    sum_logprob = st.sum_logprob + jnp.where(score, chosen, 0.0)
    gen_count = st.gen_count + score.astype(jnp.int32)

    newly = jnp.logical_and(
        ~st.done,
        jnp.logical_or(
            jnp.logical_and(~in_prompt, nxt == eos_id),
            jnp.logical_or(st.pos + 2 >= max_len,
                           gen_count >= st.budget)))
    done = jnp.logical_or(st.done, newly)
    lengths = jnp.where(newly, st.pos + 2, st.lengths)
    # done slots freeze: pos never runs past max_len, cache writes stay
    # in-range, and a later refill resets the slot wholesale
    pos = jnp.where(done, st.pos, st.pos + 1)
    return dict(tokens=tokens, pos=pos, done=done, lengths=lengths,
                sum_logprob=sum_logprob, gen_count=gen_count)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "p_len", "eos_id", "n_steps", "dtype", "mesh"),
    donate_argnames=("state",))
def _decode_chunk(params, cfg: WhisperConfig, state: _ServeState,
                  suppress, first_suppress=None, *, p_len: int, eos_id: int,
                  n_steps: int, dtype, mesh=None) -> _ServeState:
    """Run up to ``n_steps`` ragged decode steps; early-exit when every
    slot is done. Mirrors infer/decode.py:generate's body, with every
    position/flag a per-slot vector. With ``mesh``, KV state is
    head-sharded on 'model' so the whole chunk runs tensor-parallel."""
    b, _ = state.tokens.shape
    bidx = jnp.arange(b)
    neg_inf = jnp.finfo(jnp.float32).min
    if mesh is not None:
        state = state._replace(
            cache=_constrain_kv(mesh, cfg.heads, b, state.cache),
            cross_kv=_constrain_kv(mesh, cfg.heads, b, state.cross_kv))

    def cond(c):
        i, st = c
        return jnp.logical_and(i < n_steps, ~jnp.all(st.done))

    def body(c):
        i, st = c
        tok = st.tokens[bidx, st.pos]
        logits, cache = decode_step_ragged(params, cfg, tok, st.pos,
                                           st.cache, st.cross_kv, dtype)
        logits = logits.astype(jnp.float32)
        if suppress is not None and suppress.size:
            logits = logits.at[:, suppress].set(neg_inf)
        if first_suppress is not None and first_suppress.size:
            # SuppressBlank per slot: positions are per-slot vectors, so
            # each request hits its own first generated position (refills
            # reset pos, keeping this exact across slot reuse)
            banned = logits.at[:, first_suppress].set(neg_inf)
            logits = jnp.where((st.pos + 1 == p_len)[:, None], banned,
                               logits)
        in_prompt = st.pos + 1 < p_len                      # [B]
        nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        nxt = jnp.where(in_prompt, st.tokens[bidx, st.pos + 1], nxt)
        upd = _advance(st, nxt, logits, p_len=p_len, eos_id=eos_id,
                       bidx=bidx)
        return i + 1, st._replace(cache=cache, **upd)

    _, final = lax.while_loop(cond, body, (jnp.int32(0), state))
    return final


def _onehot_select(slot_ids, b):
    """[B] masks for installing K admit rows: (fresh slots, source row)."""
    hit = slot_ids[None, :] == jnp.arange(b)[:, None]      # [B, K]
    return hit.any(1), jnp.argmax(hit, 1)


def _select_rows(fresh, src, full, new, axis=1):
    """full[:, b] <- new[:, src[b]] where fresh[b] (gather+where, no
    scatter; ``axis`` is the slot axis of ``full``)."""
    picked = jnp.take(new.astype(full.dtype), src, axis=axis)
    shape = [1] * full.ndim
    shape[axis] = fresh.shape[0]
    return jnp.where(fresh.reshape(shape), picked, full)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "dtype", "kv_quant", "mesh"),
                   donate_argnames=("state",))
def _admit_many(params, cfg: WhisperConfig, state: _ServeState, mels,
                prompt_rows, slot_ids, budgets, *, dtype,
                kv_quant: bool, mesh=None) -> _ServeState:
    """Encode K requests in ONE encoder pass and install each into its
    slot: cross-KV rows gathered/selected in, position/flags reset.
    Padding rows (the bucket is a static power of two) carry
    ``slot_ids == slots``, which matches no slot in the one-hot and is
    therefore inert. The self-attn cache is NOT cleared on refill —
    entries written by the previous occupant sit at positions the new
    request hasn't reached yet, unreachable under the refilled slot's
    per-slot causal mask, and are overwritten as it advances."""
    enc = encode(params, cfg, mels, dtype)
    new = precompute_cross_kv(params, cfg, enc, quant=kv_quant)
    b = state.tokens.shape[0]
    fresh, src = _onehot_select(slot_ids, b)
    cross_kv = jax.tree.map(
        functools.partial(_select_rows, fresh, src), state.cross_kv, new)
    if mesh is not None:
        cross_kv = _constrain_kv(mesh, cfg.heads, b, cross_kv)
    # prompt_rows [K, max_len]: per-request prompts (e.g. language token)
    tokens = jnp.where(fresh[:, None], prompt_rows[src], state.tokens)
    max_len = state.tokens.shape[1]
    keep = ~fresh
    return _ServeState(
        state.cache, cross_kv, tokens,
        jnp.where(keep, state.pos, 0),
        jnp.where(keep, state.done, False),
        jnp.where(keep, state.lengths, max_len),
        jnp.where(keep, state.sum_logprob, 0.0),
        jnp.where(keep, state.gen_count, 0),
        jnp.where(keep, state.budget, budgets[src]))


# ------------------------------------------------------------ shell -------
class _SlotEngine:
    """Host-side slot-refill scheduling shell shared by both engines:
    request queue, power-of-two admit buckets, chunked decode, harvest.

    Subclass contract: set ``window``, ``sample_rate``, ``slots``,
    ``steps_per_sync``, ``_p_len``, ``_max_len``, ``_stop_id``, and
    ``_state``; implement ``_install(batch, slot_ids, budgets)`` (one
    device call admitting a bucket) and ``_chunk()`` (one compiled chunk
    of ragged decode steps), and ``_text(ids)``."""

    window: int
    sample_rate: int
    slots: int
    steps_per_sync: int
    _p_len: int
    _max_len: int
    _stop_id: int

    def _init_shell(self) -> None:
        # queue entries: (request_id, samples, n_samples, budget, extra)
        self._queue: List[tuple] = []
        self._slot_req: List[Optional[str]] = [None] * self.slots
        self._slot_secs: List[float] = [0.0] * self.slots
        #: decode steps enqueued (telemetry for bench-continuous)
        self.steps_run = 0
        self.chunks_run = 0

    # ---------------------------------------------------------- intake ----
    def submit(self, request_id: str, samples: np.ndarray,
               max_new_tokens: Optional[int] = None,
               extra: tuple = ()) -> None:
        """Queue one utterance (padded/trimmed to the window).
        ``max_new_tokens`` caps THIS request's generation (serving-API
        max_tokens semantics); the engine-level cap still applies.
        ``extra`` is an opaque per-request tuple handed back to
        ``_install`` (e.g. the generator's sampling seed)."""
        x = np.zeros(self.window, np.float32)
        s = np.asarray(samples, np.float32).reshape(-1)[: self.window]
        x[: len(s)] = s
        budget = self._max_len - self._p_len
        if max_new_tokens is not None:
            budget = min(budget, max(int(max_new_tokens), 1))
        self._queue.append((request_id, x, len(s), budget, extra))

    def cancel(self, request_id: str) -> bool:
        """Drop a not-yet-admitted request from the queue (a request
        already in a slot drains normally). True if something was
        removed."""
        for i, entry in enumerate(self._queue):
            if entry[0] == request_id:
                del self._queue[i]
                return True
        return False

    def pending(self) -> int:
        return len(self._queue)

    def live(self) -> int:
        return sum(r is not None for r in self._slot_req)

    # ----------------------------------------------------------- serve ----
    def _bucket(self, n: int) -> int:
        """Static admit batch size: next power of two ≥ n, capped at the
        slot count — ≤ log2(slots)+1 compiled (frontend, encode+install)
        program pairs total, and at most 2× encoder over-compute."""
        return min(1 << (n - 1).bit_length(), self.slots)

    def _admit_waiting(self) -> None:
        free = [i for i in range(self.slots) if self._slot_req[i] is None]
        n = min(len(free), len(self._queue))
        if not n:
            return
        k = self._bucket(n)
        batch = np.zeros((k, self.window), np.float32)
        slot_ids = np.full(k, self.slots, np.int32)   # pad rows: no slot
        budgets = np.ones(k, np.int32)
        extras: List[tuple] = [()] * k
        admitted = []
        for j in range(n):
            rid, samples, n_samples, budget, extra = self._queue.pop(0)
            batch[j] = samples
            slot_ids[j] = free[j]
            budgets[j] = budget
            extras[j] = extra
            admitted.append((free[j], rid, n_samples))
        self._install(batch, slot_ids, budgets, extras)
        for slot, rid, n_samples in admitted:
            self._slot_req[slot] = rid
            self._slot_secs[slot] = n_samples / self.sample_rate

    def _harvest(self) -> List[Result]:
        # ONE small fetched array per chunk (a tunnel round-trip costs
        # ~0.5 s, CLAUDE.md): done/lengths/sum_logprob/gen_count ride a
        # packed [B, 4] f32; token rows transfer only when something
        # actually finished
        meta = np.asarray(_pack_harvest(
            self._state.done, self._state.lengths,
            self._state.sum_logprob, self._state.gen_count))
        done = meta[:, 0] > 0.5
        out: List[Result] = []
        finished = [i for i in range(self.slots)
                    if self._slot_req[i] is not None and done[i]]
        if not finished:
            return out
        tokens = np.asarray(self._state.tokens)
        lengths = meta[:, 1].astype(np.int64)
        slp = meta[:, 2]
        cnt = meta[:, 3]
        for i in finished:
            ids = [int(t) for t in tokens[i, self._p_len: lengths[i]]
                   if t != self._stop_id]
            out.append(Result(
                self._slot_req[i], self._text(ids), ids,
                float(slp[i] / max(int(cnt[i]), 1)),
                self._slot_secs[i]))          # actual clip length, not window
            self._slot_req[i] = None
        return out

    def step(self) -> List[Result]:
        """One serving iteration: refill free slots from the queue, run one
        compiled chunk of ragged decode steps, harvest finished requests."""
        self._admit_waiting()
        if self.live() == 0:
            return []
        self._chunk()
        self.steps_run += self.steps_per_sync
        self.chunks_run += 1
        return self._harvest()

    def run(self) -> List[Result]:
        """Serve until the queue is empty and every slot has drained."""
        out: List[Result] = []
        while self._queue or self.live():
            out.extend(self.step())
        return out

    def warmup(self, all_buckets: bool = True) -> None:
        """Compile the serving programs before the first real request: the
        chunk program plus the admit program at every bucket size (each
        bucket is its own encoder batch shape; with ``all_buckets=False``
        only the single-request bucket is compiled)."""
        buckets = {1}
        if all_buckets:
            k = 1
            while k < self.slots:
                buckets.add(min(k * 2, self.slots))
                k *= 2
        seed0 = getattr(self, "_seed_counter", None)
        for k in sorted(buckets):
            for i in range(k):
                self.submit(f"__warmup{k}_{i}__",
                            np.zeros(16000, np.float32), max_new_tokens=1)
            self.run()
        self.steps_run = self.chunks_run = 0
        if seed0 is not None:
            # warmup must not consume the generator's default seed stream:
            # reproducible replay would otherwise depend on whether/how
            # warmup ran
            self._seed_counter = seed0

    # -- subclass hooks ---------------------------------------------------
    def _install(self, batch: np.ndarray, slot_ids: np.ndarray,
                 budgets: np.ndarray, extras: List[tuple]) -> None:
        raise NotImplementedError

    def _chunk(self) -> None:
        raise NotImplementedError

    def _text(self, ids: List[int]) -> str:
        raise NotImplementedError


# ----------------------------------------------------- whisper engine -----
class ContinuousBatcher(_SlotEngine):
    """Slot-refill batched Whisper transcription (greedy).

    Usage::

        cb = ContinuousBatcher(params, cfg, tokenizer, slots=8)
        cb.submit("req-1", samples)          # any number, any time
        for r in cb.step():                  # admit + decode chunk + harvest
            print(r.request_id, r.text)
        results = cb.run()                   # drain everything
    """

    def __init__(self, params, cfg: WhisperConfig,
                 tokenizer: WhisperTokenizer, *,
                 slots: int = 8, window_seconds: float = 30.0,
                 lang: str = "en", max_new_tokens: int = 224,
                 steps_per_sync: int = 64, dtype=jnp.float32,
                 backend: Optional[str] = None, kv_quant: bool = False,
                 mesh=None, suppress_blank: bool = False,
                 suppress_tokens="-1"):
        """``mesh`` (a jax.sharding.Mesh with 'data'/'model' axes) runs the
        serving programs tensor-parallel: pass params already placed by
        parallel/sharding.py:shard_params; the engine head-shards its KV
        state to match, so every chunk scales with the mesh."""
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.slots = slots
        self.dtype = dtype
        self.kv_quant = kv_quant
        self.steps_per_sync = steps_per_sync
        self.params = params
        self.mesh = mesh
        self.frontend = LogMelFrontend.whisper(cfg.n_mels, backend=backend)
        self.sample_rate = self.frontend.cfg.sample_rate
        self.window = int(window_seconds * self.sample_rate)
        # fail fast: the cross-KV state is sized from cfg.n_audio_ctx but
        # admits install rows sized from the actual window's mel frames —
        # a mismatch would otherwise surface as a broadcast TypeError deep
        # inside the first admit's jit (on the scheduler thread, killing
        # the whole server)
        enc_len = self.frontend.num_frames(self.window) // 2
        if enc_len != cfg.n_audio_ctx:
            raise ValueError(
                f"window_seconds={window_seconds} gives {enc_len} encoder "
                f"positions but cfg.n_audio_ctx={cfg.n_audio_ctx}; pass the "
                f"window matching the model's audio context "
                f"({cfg.n_audio_ctx * 2 * self.frontend.cfg.hop_length / self.sample_rate:.1f}s)")
        prompt = tokenizer.sot_sequence(lang=lang)
        self._p_len = len(prompt)
        self._max_len = min(self._p_len + max_new_tokens, cfg.n_text_ctx)
        self._stop_id = tokenizer.eot
        self._default_row = self._prompt_for(lang)
        # same SuppressTokens default as the Transcriber surface ("-1" =
        # control specials + the vocab's non-speech symbol set) so the
        # serving endpoint and the transcribe CLI emit the same tokens;
        # "" / [] = control specials only, a list = specials + those ids
        if suppress_tokens == "-1":
            extra = tokenizer.non_speech_tokens()
        elif suppress_tokens:
            extra = [int(i) for i in suppress_tokens]
        else:
            extra = []
        self._suppress = jnp.asarray(sorted(
            set([i for i in tokenizer.special_ids() if i != tokenizer.eot]
                + list(extra))), np.int32)
        # whisper's SuppressBlank (' ' + EOT at the first generated
        # position); opt-in here — the Transcriber surface defaults it on
        self._first_suppress = (jnp.asarray(
            sorted(set(tokenizer.encode(" ") + [tokenizer.eot])), np.int32)
            if suppress_blank else None)
        self._state = self._init_state()
        self._init_shell()

    def _init_state(self) -> _ServeState:
        cfg, b = self.cfg, self.slots
        hd = cfg.d_model // cfg.heads
        s = cfg.n_audio_ctx
        cache = init_kv_cache(cfg, b, self._max_len, self.dtype,
                              quant=self.kv_quant)
        shape = (cfg.decoder_layers, b, cfg.heads, s, hd)
        if self.kv_quant:
            from audax.models.whisper import QuantKV
            cross = QuantKV(jnp.zeros(shape, jnp.int8),
                            jnp.ones(shape[:-1], jnp.float32),
                            jnp.zeros(shape, jnp.int8),
                            jnp.ones(shape[:-1], jnp.float32))
        else:
            cross = (jnp.zeros(shape, self.dtype),
                     jnp.zeros(shape, self.dtype))
        if self.mesh is not None:
            cache = _constrain_kv(self.mesh, cfg.heads, b, cache, put=True)
            cross = _constrain_kv(self.mesh, cfg.heads, b, cross, put=True)
        return _ServeState(
            cache, cross,
            jnp.zeros((b, self._max_len), jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.ones((b,), bool),                  # all slots free
            jnp.full((b,), self._max_len, jnp.int32),
            jnp.zeros((b,), jnp.float32),
            jnp.zeros((b,), jnp.int32),
            jnp.full((b,), self._max_len, jnp.int32))

    def _prompt_for(self, lang: str) -> np.ndarray:
        """[max_len] token row opening with the sot sequence for ``lang``
        (every language shares the sot-sequence length, so per-request
        languages never change the compiled shapes)."""
        prompt = self.tokenizer.sot_sequence(lang=lang)
        assert len(prompt) == self._p_len, (lang, prompt)
        row = np.zeros(self._max_len, np.int32)
        row[: self._p_len] = prompt
        return row

    def submit(self, request_id: str, samples: np.ndarray,
               max_new_tokens: Optional[int] = None,
               lang: Optional[str] = None, extra: tuple = ()) -> None:
        """``lang`` overrides the engine default for THIS request (the
        serving-API language parameter): its slot decodes under that
        language's sot prompt."""
        row = self._default_row if lang is None else self._prompt_for(lang)
        super().submit(request_id, samples, max_new_tokens, extra=(row,))

    def _install(self, batch, slot_ids, budgets, extras) -> None:
        rows = np.stack([e[0] if e else self._default_row for e in extras])
        mels = self.frontend(jnp.asarray(batch))
        self._state = _admit_many(
            self.params, self.cfg, self._state, mels, jnp.asarray(rows),
            jnp.asarray(slot_ids), jnp.asarray(budgets),
            dtype=self.dtype, kv_quant=self.kv_quant, mesh=self.mesh)

    def _chunk(self) -> None:
        self._state = _decode_chunk(
            self.params, self.cfg, self._state, self._suppress,
            self._first_suppress,
            p_len=self._p_len, eos_id=self._stop_id,
            n_steps=self.steps_per_sync, dtype=self.dtype, mesh=self.mesh)

    def _text(self, ids) -> str:
        return self.tokenizer.decode(ids)


# ---------------------------------------------------- two-tower engine ----
class _GenState(NamedTuple):
    """Fixed-shape device state for the two-tower generator. The adapter's
    cross-attention K/V depend only on the (frozen) encoder states, so
    they are projected ONCE at admit and carried here — recomputing the
    audio_proj + k/v matmuls per generated token (O(S·d²) per step) was
    measured as the generator's dominant per-step cost."""
    cache: object          # LM self-attn KV [L, B, kvH, max_len, hd]
    cross_k: jnp.ndarray   # [B, H, S, hd] adapter cross-attention keys
    cross_v: jnp.ndarray   # [B, H, S, hd] adapter cross-attention values
    tokens: jnp.ndarray    # [B, max_len] int32
    pos: jnp.ndarray       # [B] int32
    done: jnp.ndarray      # [B] bool
    lengths: jnp.ndarray   # [B] int32
    sum_logprob: jnp.ndarray
    gen_count: jnp.ndarray
    budget: jnp.ndarray
    seed: jnp.ndarray      # [B] int32 per-request sampling seed


@functools.partial(jax.jit, static_argnames=("audio_cfg", "heads", "dtype"),
                   donate_argnames=("state",))
def _gen_admit(audio_params, adapter_params, state: _GenState, mels,
               prompt_row, slot_ids, budgets, seeds, *, audio_cfg,
               heads, dtype) -> _GenState:
    """Encode K clips in ONE frozen-encoder pass, project the adapter's
    cross-K/V once, and install each into its slot (same inert-padding
    one-hot scheme as ``_admit_many``; the LM self-attn cache again needs
    no clearing — per-slot causal mask). The cross-K/V stay replicated
    under TP: only the LM KV cache is worth sharding."""
    from audax.models.two_tower import adapter_cross_kv
    enc = encode(audio_params, audio_cfg, mels, dtype)
    ck, cv = adapter_cross_kv(adapter_params, enc.astype(dtype), heads)
    b = state.tokens.shape[0]
    max_len = state.tokens.shape[1]
    fresh, src = _onehot_select(slot_ids, b)
    keep = ~fresh
    return _GenState(
        state.cache,
        _select_rows(fresh, src, state.cross_k, ck, axis=0),
        _select_rows(fresh, src, state.cross_v, cv, axis=0),
        jnp.where(fresh[:, None], prompt_row[None], state.tokens),
        jnp.where(keep, state.pos, 0),
        jnp.where(keep, state.done, False),
        jnp.where(keep, state.lengths, max_len),
        jnp.where(keep, state.sum_logprob, 0.0),
        jnp.where(keep, state.gen_count, 0),
        jnp.where(keep, state.budget, budgets[src]),
        jnp.where(keep, state.seed, seeds[src]))


@functools.partial(
    jax.jit,
    static_argnames=("lm_cfg", "eos_id", "n_steps", "dtype",
                     "temperature", "mesh"),
    donate_argnames=("state",))
def _gen_chunk(params, lm_cfg, state: _GenState, allowed_mask=None, *,
               eos_id: int, n_steps: int, dtype,
               temperature: float, mesh=None) -> _GenState:
    """Ragged two-tower decode chunk: embed → adapter-fuse (precomputed
    cross-K/V) → LM step → sample. Sampling keys are
    ``fold_in(fold_in(base, seed[b]), pos[b])`` — a function of the
    REQUEST (seed) and its own depth only, so a request's sampled tokens
    are bit-identical regardless of which slot it lands in or what its
    neighbours are doing."""
    from audax.models.causal_lm import embed_tokens, lm_decode_step
    from audax.models.two_tower import adapter_apply_kv

    b, _ = state.tokens.shape
    bidx = jnp.arange(b)
    if mesh is not None:
        state = state._replace(
            cache=_constrain_kv(mesh, lm_cfg.kv_heads, b, state.cache))

    def cond(c):
        i, st = c
        return jnp.logical_and(i < n_steps, ~jnp.all(st.done))

    def body(c):
        i, st = c
        tok = st.tokens[bidx, st.pos]
        text = embed_tokens(params["lm"], tok[:, None], dtype)
        emb = adapter_apply_kv(params["adapter"], text,
                               st.cross_k, st.cross_v)[:, 0]
        logits, cache = lm_decode_step(params["lm"], lm_cfg, emb, st.pos,
                                       st.cache, dtype)
        logits = logits.astype(jnp.float32)
        if allowed_mask is not None:
            # constrained decoding (the reference's abandoned "mask out
            # non-ABC tokens" variant, model.py:346-417, made to work)
            logits = jnp.where(allowed_mask[None], logits,
                               jnp.finfo(jnp.float32).min)
        if temperature == 0.0:
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        else:
            base = jax.random.key(0)
            keys = jax.vmap(
                lambda s, p: jax.random.fold_in(jax.random.fold_in(base, s),
                                                p))(st.seed, st.pos)
            nxt = jax.vmap(jax.random.categorical)(
                keys, logits / temperature).astype(jnp.int32)
        upd = _advance(st, nxt, logits, p_len=1, eos_id=eos_id, bidx=bidx)
        return i + 1, st._replace(cache=cache, **upd)

    _, final = lax.while_loop(cond, body, (jnp.int32(0), state))
    return final


class ContinuousGenerator(_SlotEngine):
    """Slot-refill two-tower audio→ABC generation with per-request
    reproducible temperature sampling.

    The reference's generation loop is single-sample, recomputes the full
    prefix per token, and has no batching (reference:
    .charles/music2midi/model.py:293-344); this engine serves many clips
    concurrently off one compiled chunk program. Usage::

        g = ContinuousGenerator(model, bpe=bpe, start_id=s, end_id=e)
        g.submit("req-1", samples, seed=7)
        results = g.run()
    """

    def __init__(self, model, *, bpe=None, start_id: int, end_id: int,
                 params=None, slots: int = 4, window_seconds: float = 10.0,
                 max_new_tokens: int = 256, temperature: float = 0.7,
                 steps_per_sync: int = 32, dtype=jnp.float32,
                 backend: Optional[str] = None, mesh=None,
                 allowed_ids=None):
        self.model = model
        self.params = params if params is not None else model.params
        self.mesh = mesh
        self.bpe = bpe
        #: constrained decoding: permit only these ids (+ end_id)
        self.allowed_mask = None
        if allowed_ids is not None:
            ids = jnp.asarray(list(allowed_ids) + [end_id], jnp.int32)
            self.allowed_mask = jnp.zeros(
                (model.lm_cfg.vocab_size,), bool).at[ids].set(True)
        self.slots = slots
        self.dtype = dtype
        self.temperature = float(temperature)
        self.steps_per_sync = steps_per_sync
        self.frontend = LogMelFrontend.whisper(model.audio_cfg.n_mels,
                                               backend=backend)
        self.sample_rate = self.frontend.cfg.sample_rate
        self.window = int(window_seconds * self.sample_rate)
        self._p_len = 1
        self._max_len = 1 + max_new_tokens
        self._stop_id = end_id
        row = np.zeros(self._max_len, np.int32)
        row[0] = start_id
        self._prompt_row = jnp.asarray(row)
        self._seed_counter = 0
        # encoder output shape for this window (conv stack halves frames)
        s = self.frontend.num_frames(self.window) // 2
        self._state = self._init_state(s)
        self._init_shell()

    def _init_state(self, s: int) -> _GenState:
        from audax.models.causal_lm import init_lm_cache
        b = self.slots
        heads = self.model.cfg.adapter_heads
        hd = self.model.lm_cfg.d_model // heads
        cache = init_lm_cache(self.model.lm_cfg, b, self._max_len,
                              self.dtype)
        if self.mesh is not None:
            cache = _constrain_kv(self.mesh, self.model.lm_cfg.kv_heads,
                                  b, cache, put=True)
        return _GenState(
            cache,
            jnp.zeros((b, heads, s, hd), self.dtype),
            jnp.zeros((b, heads, s, hd), self.dtype),
            jnp.zeros((b, self._max_len), jnp.int32),
            jnp.zeros((b,), jnp.int32),
            jnp.ones((b,), bool),                  # all slots free
            jnp.full((b,), self._max_len, jnp.int32),
            jnp.zeros((b,), jnp.float32),
            jnp.zeros((b,), jnp.int32),
            jnp.full((b,), self._max_len, jnp.int32),
            jnp.zeros((b,), jnp.int32))

    def submit(self, request_id: str, samples: np.ndarray,
               max_new_tokens: Optional[int] = None,
               seed: Optional[int] = None, extra: tuple = ()) -> None:
        """``seed`` pins this request's sampling stream (reproducible
        replay); default is a fresh per-engine counter value."""
        if seed is None:
            seed = self._seed_counter
            self._seed_counter += 1
        super().submit(request_id, samples, max_new_tokens,
                       extra=(int(seed),))

    def _install(self, batch, slot_ids, budgets, extras) -> None:
        seeds = np.zeros(len(extras), np.int32)
        for j, e in enumerate(extras):
            if e:
                seeds[j] = e[0]
        mels = self.frontend(jnp.asarray(batch))
        self._state = _gen_admit(
            self.model.audio_params, self.params["adapter"], self._state,
            mels, self._prompt_row,
            jnp.asarray(slot_ids), jnp.asarray(budgets),
            jnp.asarray(seeds), audio_cfg=self.model.audio_cfg,
            heads=self.model.cfg.adapter_heads, dtype=self.dtype)

    def _chunk(self) -> None:
        self._state = _gen_chunk(
            self.params, self.model.lm_cfg, self._state, self.allowed_mask,
            eos_id=self._stop_id,
            n_steps=self.steps_per_sync, dtype=self.dtype,
            temperature=self.temperature, mesh=self.mesh)

    def _text(self, ids) -> str:
        if self.bpe is None:
            return ""
        return self.bpe.decode(ids, skip_specials=True)
