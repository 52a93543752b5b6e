"""Transcription API: wav -> text with 30 s chunking, KV-cached decode,
whisper-style temperature fallback, and optional timestamp segments.

Public replacement for the reference's openai-whisper usage
(AB/wavToWhisper.py:7-18 ``transcribe_audio`` and the fine-tuned batch loop
:44-70). ``model.transcribe``'s quality heuristics are reproduced: decoding
starts greedy and falls back through rising temperatures when the mean
log-probability or gzip compression ratio of a chunk looks degenerate
(mode-collapse loops like the reference's "A5 A5 A5 A5",
AB/midiDatasetResults.csv:2-5, trip the compression check).
"""

from __future__ import annotations

import csv
import os
import time
import zlib
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from audax.core.config import WhisperConfig
from audax.core.logging import get_logger
from audax.frontend import LogMelFrontend
from audax.infer.align import (APPEND_PUNCTUATIONS, PREPEND_PUNCTUATIONS,
                               WordTiming,
                               cross_attention_weights,
                               word_timings)
from audax.infer.decode import (GenerateResult, TimestampRules,
                                generate)
from audax.models.whisper import encode
from audax.symbolic.tokenizer import WhisperTokenizer

__all__ = ["Transcriber", "TranscriptionResult", "Segment",
           "batch_transcribe_to_csv"]

log = get_logger("audax.infer")

FALLBACK_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
LOGPROB_THRESHOLD = -1.0
COMPRESSION_THRESHOLD = 2.4


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


# ------------------------------------------- hallucination heuristics -----
# openai-whisper transcribe.py's word_anomaly_score / is_segment_anomaly /
# silence-skip logic, as pure functions over Segment lists (unit-testable
# without a model).

def _word_anomaly_score(w: "WordTiming") -> float:
    score = 0.0
    if w.probability < 0.15:
        score += 1.0
    dur = w.end - w.start
    if dur < 0.133:
        score += (0.133 - dur) * 15
    if dur > 2.0:
        score += dur - 2.0
    return score


def _is_segment_anomaly(seg: Optional["Segment"]) -> bool:
    if seg is None or not seg.words:
        return False
    punct = PREPEND_PUNCTUATIONS + APPEND_PUNCTUATIONS
    ws = [w for w in seg.words if w.word not in punct][:8]
    if not ws:
        return False
    score = sum(_word_anomaly_score(w) for w in ws)
    return score >= 3 or score + 0.01 >= len(ws)


def hallucination_filter(seg_i: List["Segment"], *, offset: float,
                         window_end: float, total_s: float,
                         threshold: float, last_speech_ts: float
                         ) -> Tuple[List["Segment"], Optional[float]]:
    """openai's hallucination_silence_threshold window pass.

    ``seg_i`` is one window's segments (ABSOLUTE times, words attached).
    Returns (segments to keep, forced next-seek time in seconds or None):
    an anomalous first segment preceded by > threshold of silence skips
    the window to the speech onset; an anomalous segment surrounded by
    silence (or more anomalies) truncates the window's output and re-seeks
    to its start so the next window re-reads that audio.
    """
    first = next((s for s in seg_i if s.words), None)
    if first is not None and _is_segment_anomaly(first):
        gap = first.start - offset
        if gap > threshold:
            return [], offset + gap
    kept = list(seg_i)
    hal_last_end = last_speech_ts
    for si, seg in enumerate(kept):
        if not seg.words:
            continue
        if _is_segment_anomaly(seg):
            nxt = next((s for s in kept[si + 1:] if s.words), None)
            hal_next_start = nxt.words[0].start if nxt else window_end
            silence_before = (seg.start - hal_last_end > threshold
                              or seg.start < threshold
                              or seg.start - offset < 2.0)
            silence_after = (hal_next_start - seg.end > threshold
                             or _is_segment_anomaly(nxt)
                             or window_end - seg.end < 2.0)
            if silence_before and silence_after:
                forced = max(offset + 1.0, seg.start)
                if total_s - seg.end < threshold:
                    forced = total_s       # nothing worth re-reading
                return kept[:si], forced
        hal_last_end = seg.words[-1].end
    return kept, None


@dataclass
class Segment:
    text: str
    start: float                 # seconds (chunk offset included)
    end: float
    avg_logprob: float
    temperature: float
    #: word-level timings (filled when Transcriber(word_timestamps=True))
    words: Optional[List["WordTiming"]] = None
    #: per-window quality diagnostics (openai verbose-segment fields):
    #: gzip compression ratio of the window's text and the <|nospeech|>
    #: probability at its first decode position (None when unavailable —
    #: beam/speculative paths don't record it)
    compression_ratio: float = 0.0
    no_speech_prob: Optional[float] = None


@dataclass
class TranscriptionResult:
    text: str
    segments: List[Segment]
    audio_seconds: float
    wall_seconds: float

    @property
    def rtf(self) -> float:
        """Real-time factor (wall / audio); BASELINE target <= 0.05."""
        return self.wall_seconds / max(self.audio_seconds, 1e-9)


def detect_language(params, cfg: WhisperConfig, tokenizer: WhisperTokenizer,
                    enc, dtype=jnp.float32):
    """Language id from one decode step after SOT (whisper's
    detect_language): softmax restricted to the language tokens.

    Returns (lang_code [B] list, probs [B, n_languages])."""
    import jax
    from audax.models.whisper import (decode_step, init_kv_cache,
                                      precompute_cross_kv)

    b = enc.shape[0]
    cross_kv = precompute_cross_kv(params, cfg, enc)
    cache = init_kv_cache(cfg, b, 2, dtype)
    sot = jnp.full((b,), tokenizer.sot, jnp.int32)
    logits, _ = decode_step(params, cfg, sot, jnp.int32(0), cache, cross_kv,
                            dtype)
    langs = tokenizer.languages          # 99- or 100-language layout
    lang_ids = jnp.arange(tokenizer.num_languages) + tokenizer.lang_token(
        langs[0])
    lang_logits = logits[:, lang_ids]
    probs = jax.nn.softmax(lang_logits.astype(jnp.float32), -1)
    import numpy as np
    best = np.asarray(jnp.argmax(probs, -1))
    return [langs[i] for i in best], probs


class Transcriber:
    """Bundled frontend + Whisper params + tokenizer."""

    #: previous-context buckets: lengths are truncated DOWN to one of these,
    #: so conditioning costs at most len(buckets) compiled programs.
    CONTEXT_BUCKETS = (16, 32, 64)

    def __init__(self, params, cfg: WhisperConfig,
                 tokenizer: WhisperTokenizer, *,
                 lang: str = "en", task: str = "transcribe",
                 max_new_tokens: int = 224,
                 timestamps: bool = False,
                 temperature_fallback: bool = True,
                 condition_on_previous: bool = False,
                 chunk_seconds: Optional[float] = None,
                 word_timestamps: bool = False,
                 beam_width: int = 1,
                 best_of: int = 1,
                 patience: Optional[float] = None,
                 length_penalty: Optional[float] = None,
                 dtype=jnp.float32, backend: Optional[str] = None,
                 quantize=False, kv_quant: bool = False,
                 draft=None, spec_tokens: int = 8,
                 no_speech_threshold: Optional[float] = 0.6,
                 initial_prompt: Optional[str] = None,
                 temperatures: Tuple[float, ...] = FALLBACK_TEMPERATURES,
                 logprob_threshold: float = LOGPROB_THRESHOLD,
                 compression_threshold: float = COMPRESSION_THRESHOLD,
                 seek_by_timestamps: bool = False,
                 clip_timestamps=None,
                 hallucination_silence_threshold: Optional[float] = None,
                 prepend_punctuations: str = PREPEND_PUNCTUATIONS,
                 append_punctuations: str = APPEND_PUNCTUATIONS,
                 suppress_tokens="-1", suppress_blank: bool = True,
                 vad_threshold_db: Optional[float] = None,
                 mesh=None):
        #: int8 self+cross KV caches in decode (whisper.QuantKV) — halves
        #: the per-token cache read bytes and per-stream cache memory
        self.kv_quant = kv_quant
        if quantize:
            # weight-only serving (models/quantize.py): decode reads 4x
            # (int8) / 8x (int4 pallas kernel, ops/int4_matmul.py) fewer
            # weight bytes vs f32 — pair with dtype=bfloat16.
            # ``quantize``: True/8/"int8" -> int8; 4/"int4" -> int4.
            from audax.models.quantize import quantize_tree
            if str(quantize) not in ("True", "8", "int8", "4", "int4"):
                raise ValueError(f"quantize={quantize!r}: expected True/8/"
                                 f"'int8' or 4/'int4'")
            bits = 4 if str(quantize) in ("4", "int4") else 8
            params = quantize_tree(params, bits=bits)
        #: tensor-parallel serving: a (data, model) mesh Megatron-shards
        #: the weights (quantized trees keep their replication rules) and
        #: every decode path constrains its KV caches over heads on
        #: 'model' — batch transcription scales with the mesh, token-equal
        #: to replicated (tests/test_cli_mesh.py). The speculative-draft
        #: shortcut is disabled under a mesh (its verify spans have no TP
        #: KV layout); plain generate covers that case.
        self.mesh = mesh
        if mesh is not None:
            from audax.parallel.sharding import shard_params
            params = shard_params(params, mesh)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.lang = lang
        if task not in ("transcribe", "translate"):
            raise ValueError(f"task must be transcribe/translate, got {task!r}")
        #: whisper task token: "transcribe" (same language) or "translate"
        #: (any language -> English)
        self.task = task
        self.max_new_tokens = max_new_tokens
        self.timestamps = timestamps
        self.temperature_fallback = temperature_fallback
        self.condition_on_previous = condition_on_previous
        self.word_timestamps = word_timestamps
        #: >1 enables beam search at temperature 0 (whisper's
        #: transcribe(beam_size=K): beam first, sampling on fallback)
        self.beam_width = beam_width
        #: n-best sampling on the t>0 fallback rungs (openai DecodingOptions
        #: best_of, default 5 under model.transcribe — the reference rides
        #: that default, AB/wavToWhisper.py:10-13): sample best_of
        #: candidates per window batched in the free decode batch dim and
        #: keep the best by the ranker below
        if best_of < 1:
            raise ValueError(f"best_of must be >= 1, got {best_of}")
        self.best_of = best_of
        #: beam patience (FCFS finished pool of round(W*patience)) and the
        #: GNMT length penalty exponent (None = plain 1/length ranking) —
        #: openai DecodingOptions patience/length_penalty
        self.patience = patience
        self.length_penalty = length_penalty
        #: openai's silence gate: a window whose <|nospeech|> probability
        #: exceeds this AND whose avg_logprob is below LOGPROB_THRESHOLD
        #: is emitted as silence instead of hallucinated text (None = off)
        self.no_speech_threshold = no_speech_threshold
        #: user context/vocabulary hint fed as <|startofprev|> text. With
        #: condition_on_previous it seeds the rolling context for the first
        #: window (openai initial_prompt semantics); without it, it applies
        #: to EVERY window (hotwords-style — openai resets context per
        #: window when not conditioning, so first-window-only would be a
        #: no-op beyond 30 s)
        self.initial_prompt_ids: List[int] = (
            tokenizer.encode(" " + initial_prompt.strip())
            if initial_prompt else [])
        #: openai transcribe knobs (the ladder + its quality gates)
        self.temperatures = tuple(temperatures)
        self.logprob_threshold = logprob_threshold
        self.compression_threshold = compression_threshold
        #: openai's seek loop (requires timestamps): advance each window to
        #: the last complete segment's end instead of a fixed 30 s stride,
        #: so no word is cut at a window boundary. Sequential by nature —
        #: throughput-critical batch work should leave this off.
        self.seek_by_timestamps = seek_by_timestamps
        #: openai clip_timestamps: "start,end,start,end,..." seconds (or a
        #: list of floats; last end defaults to end-of-file) — only these
        #: ranges are transcribed, each with its own absolute offsets
        self.clip_timestamps = clip_timestamps
        #: openai hallucination_silence_threshold (needs word_timestamps):
        #: skip silent gaps longer than this when a segment looks
        #: hallucinated (anomalous word probabilities/durations)
        if hallucination_silence_threshold is not None and not (
                word_timestamps and timestamps):
            raise ValueError("hallucination_silence_threshold requires "
                             "word_timestamps=True and timestamps=True "
                             "(openai transcribe contract)")
        self.hallucination_silence_threshold = hallucination_silence_threshold
        #: punctuation merge sets for word timings (openai defaults)
        self.prepend_punctuations = prepend_punctuations
        self.append_punctuations = append_punctuations
        #: (draft_params, draft_cfg) enables speculative decoding on the
        #: single-chunk greedy path (infer/speculative.py) — token-exact,
        #: lower latency when the draft tracks the target
        self.draft = draft
        self.spec_tokens = spec_tokens
        self.dtype = dtype
        self.frontend = LogMelFrontend.whisper(cfg.n_mels, backend=backend)
        self.draft_frontend = (
            LogMelFrontend.whisper(draft[1].n_mels, backend=backend)
            if draft is not None and draft[1].n_mels != cfg.n_mels else None)
        # chunk window defaults to the model's audio capacity: n_audio_ctx
        # encoder positions x conv stride 2 x hop samples — exactly 30 s for
        # the published whisper family, shorter for compact custom models
        if chunk_seconds is None:
            chunk_seconds = (cfg.n_audio_ctx * 2 * self.frontend.cfg.hop_length
                             / self.frontend.cfg.sample_rate)
        self.chunk_seconds = float(chunk_seconds)
        self.chunk_samples = int(self.chunk_seconds
                                 * self.frontend.cfg.sample_rate)
        # whisper's SuppressTokens filter: control tokens are never *emitted*
        # (EOT excepted; timestamps are governed by TimestampRules instead),
        # plus the openai ``suppress_tokens`` knob: "-1" (default) adds the
        # tokenizer's non-speech symbol set, a sequence adds those ids,
        # None/() adds nothing
        if suppress_tokens == "-1":
            extra = tokenizer.non_speech_tokens()
        elif suppress_tokens:
            extra = [int(i) for i in suppress_tokens]
        else:
            extra = []
        specials = [i for i in tokenizer.special_ids() if i != tokenizer.eot]
        self.suppress = np.asarray(sorted(set(specials + extra)), np.int32)
        # openai's SuppressBlank: ' ' and EOT banned at the first GENERATED
        # position only (a window never opens with silence-as-text)
        self.first_suppress = (np.asarray(
            sorted(set(tokenizer.encode(" ") + [tokenizer.eot])), np.int32)
            if suppress_blank else None)
        #: energy VAD (beyond openai, which decodes every window and gates
        #: afterwards via <|nospeech|>): a window whose PEAK 100 ms-frame
        #: RMS is below this dBFS level is emitted as silence WITHOUT a
        #: decode — long quiet stretches cost zero device work. Typical
        #: setting -45..-55; None disables. The no-speech gate still covers
        #: low-level non-speech noise the energy test can't.
        self.vad_threshold_db = vad_threshold_db

    def _prompt(self, n: int, prev: Optional[List[int]] = None,
                lang: Optional[str] = None) -> np.ndarray:
        """SOT sequence, optionally preceded by <|startofprev|> + bucketed
        previous-text tokens (whisper condition_on_previous_text).

        Context lengths bucket to fixed XLA shapes (warmup precompiles one
        program per bucket): long context keeps the LATEST bucket-many
        tokens; context shorter than the smallest bucket left-pads with its
        first token instead of being DROPPED entirely (short rolling
        context and short initial prompts used to vanish silently)."""
        tk = self.tokenizer
        seq = tk.sot_sequence(lang=lang or self.lang, task=self.task,
                              timestamps=self.timestamps)
        if prev:
            bucket = max((b for b in self.CONTEXT_BUCKETS if b <= len(prev)),
                         default=min(self.CONTEXT_BUCKETS))
            ctx = list(prev[-bucket:])
            ctx = [ctx[0]] * (bucket - len(ctx)) + ctx
            seq = [tk.sot_prev] + ctx + seq
        return np.asarray([seq] * n, np.int32)

    def _decode_once(self, enc, prompt, temperature: float, denc=None):
        tk = self.tokenizer
        fs = (jnp.asarray(self.first_suppress)
              if self.first_suppress is not None else None)
        rules = (TimestampRules(tk.timestamp_begin, tk.eot)
                 if self.timestamps else None)
        max_len = min(prompt.shape[1] + self.max_new_tokens, self.cfg.n_text_ctx)
        if (denc is not None and temperature == 0.0 and rules is None
                and self.beam_width == 1 and enc.shape[0] == 1
                and self.mesh is None):
            # token-exact draft-verified greedy (single-stream latency path).
            # Verify spans read K positional rows starting at l-1, and
            # dynamic_slice CLAMPS at the table edge — cap max_len so the
            # last span (start max_len-1) still has K real rows, else tail
            # tokens would silently get wrong position embeddings.
            max_len = min(max_len,
                          min(self.cfg.n_text_ctx, self.draft[1].n_text_ctx)
                          - self.spec_tokens + 1)
            from audax.infer.speculative import generate_speculative
            return generate_speculative(
                self.draft[0], self.params, self.draft[1], self.cfg,
                denc, enc, jnp.asarray(prompt), max_len=max_len,
                eos_id=tk.eot, spec_tokens=self.spec_tokens,
                suppress=jnp.asarray(self.suppress), first_suppress=fs,
                dtype=self.dtype, kv_quant=self.kv_quant)
        if self.beam_width > 1 and temperature == 0.0:
            # whisper's ladder: beam at t=0, sampling on hotter retries
            from audax.infer.beam import beam_search
            res = beam_search(self.params, self.cfg, enc,
                              jnp.asarray(prompt), max_len=max_len,
                              eos_id=tk.eot, beam_width=self.beam_width,
                              suppress=jnp.asarray(self.suppress),
                              first_suppress=fs,
                              timestamps=rules, dtype=self.dtype,
                              kv_quant=self.kv_quant, mesh=self.mesh,
                              patience=self.patience,
                              length_penalty=self.length_penalty)
            # top hypothesis, shaped like a GenerateResult
            lengths = res.lengths[:, 0]
            gen_count = jnp.maximum(lengths - prompt.shape[1], 1)
            return GenerateResult(res.tokens[:, 0], lengths,
                                  res.sum_logprob[:, 0], gen_count)
        ns_id = (tk.no_speech if self.no_speech_threshold is not None
                 else None)
        # openai reads no_speech_prob from the logits AT <|sot|> (not after
        # the full lang/task prompt); locate sot in this prompt layout
        ns_pos = (int(np.where(np.asarray(prompt)[0] == tk.sot)[0][-1])
                  if ns_id is not None else None)
        bo = self.best_of if temperature > 0.0 else 1
        if bo > 1:
            # n-best sampling batched in the decode batch dim (free on the
            # MXU): tile each window best_of times — categorical sampling
            # draws independent gumbel noise per row, so duplicated rows
            # explore different candidates — and keep the ranker's best
            out = generate(self.params, self.cfg,
                           jnp.repeat(enc, bo, axis=0),
                           jnp.asarray(np.repeat(prompt, bo, axis=0)),
                           max_len=max_len, eos_id=tk.eot,
                           temperature=temperature, timestamps=rules,
                           suppress=jnp.asarray(self.suppress),
                           first_suppress=fs,
                           dtype=self.dtype, kv_quant=self.kv_quant,
                           mesh=self.mesh, no_speech_id=ns_id,
                           no_speech_pos=ns_pos)
            n = enc.shape[0]
            gen_count = np.maximum(np.asarray(out.gen_count), 1)
            sum_lp = np.asarray(out.sum_logprob)
            if self.length_penalty is None:
                score = sum_lp / gen_count       # whisper avg-logprob ranker
            else:
                score = sum_lp / ((5.0 + gen_count) / 6.0) \
                    ** self.length_penalty       # GNMT (openai ranker)
            pick = score.reshape(n, bo).argmax(1) + np.arange(n) * bo
            nsp = (out.no_speech_prob[pick]
                   if out.no_speech_prob is not None else None)
            return GenerateResult(out.tokens[pick], out.lengths[pick],
                                  out.sum_logprob[pick], out.gen_count[pick],
                                  nsp)
        return generate(self.params, self.cfg, enc, jnp.asarray(prompt),
                        max_len=max_len, eos_id=tk.eot,
                        temperature=temperature, timestamps=rules,
                        suppress=jnp.asarray(self.suppress),
                        first_suppress=fs,
                        dtype=self.dtype, kv_quant=self.kv_quant,
                        mesh=self.mesh, no_speech_id=ns_id,
                        no_speech_pos=ns_pos)

    def _align_words(self, enc_row, prompt_len: int, prompt_and_ids,
                     n_valid_samples: int) -> List[WordTiming]:
        """Word timings for one chunk via cross-attention DTW. Tokens are
        padded to the fixed decode length so the teacher-forced alignment
        pass compiles once per model."""
        max_len = min(prompt_len + self.max_new_tokens, self.cfg.n_text_ctx)
        n_ids = len(prompt_and_ids) - prompt_len
        toks = (list(prompt_and_ids) + [self.tokenizer.eot] * max_len)[:max_len]
        n_frames = max(1, min(n_valid_samples
                              // (2 * self.frontend.cfg.hop_length),
                              enc_row.shape[0]))
        w, mass = cross_attention_weights(
            self.params, self.cfg, jnp.asarray([toks], jnp.int32),
            enc_row[None], n_frames=jnp.int32(n_frames), dtype=self.dtype)
        # each token's row is the attention at its own input position
        # (openai-whisper find_alignment slicing)
        sl = slice(prompt_len, prompt_len + n_ids)
        rows = np.asarray(w[0])[sl]
        mass_rows = np.asarray(mass[0])[sl]
        return word_timings(rows, prompt_and_ids[prompt_len:],
                            self.tokenizer, n_frames=n_frames,
                            mass=mass_rows,
                            prepend_punctuations=self.prepend_punctuations,
                            append_punctuations=self.append_punctuations)

    def _attach_words(self, segments: List[Segment],
                      words: List[WordTiming], offset: float) -> None:
        """Distribute a chunk's words into its segments by midpoint time;
        words aligned outside every segment span (DTW can place the first
        word before the first emitted timestamp) clamp to the NEAREST
        segment rather than vanishing."""
        shifted = [WordTiming(w.word, round(w.start + offset, 3),
                              round(w.end + offset, 3), w.probability)
                   for w in words]
        if not self.timestamps or not segments:
            for seg in segments:
                seg.words = shifted
            return
        for seg in segments:
            seg.words = []
        for w in shifted:
            mid = (w.start + w.end) / 2
            inside = [s for s in segments if s.start <= mid < s.end]
            target = inside[0] if inside else min(
                segments, key=lambda s: min(abs(mid - s.start),
                                            abs(mid - s.end)))
            target.words.append(w)

    def warmup(self, *, batch_chunks: int = 4) -> None:
        """Precompile every XLA program the serving path can hit — encoder,
        each temperature rung (beam at t=0 when beam_width>1), language
        detection, context-bucket prompts, word alignment — so the first
        real request never pays a compile. With the persistent compilation
        cache (core/runtime.setup) the artifacts survive process restarts;
        call this at server startup (cli/stream_server.py does)."""
        tk = self.tokenizer
        ladder = (self.temperatures if self.temperature_fallback
                  else (0.0,))
        lang = "en" if self.lang == "auto" else self.lang
        out = None
        sizes = {1} if self.condition_on_previous else {1, batch_chunks}
        for n in sorted(sizes):
            mel = self.frontend(jnp.zeros((n, self.chunk_samples),
                                          jnp.float32))
            enc = encode(self.params, self.cfg, mel, self.dtype)
            if self.lang == "auto":
                detect_language(self.params, self.cfg, tk, enc, self.dtype)
            enc[np.asarray(list(range(n)))]   # the ladder's slot gather
            denc = None
            if self.draft is not None and n == 1:
                dmel = (self.draft_frontend(
                    jnp.zeros((n, self.chunk_samples), jnp.float32))
                    if self.draft_frontend is not None else mel)
                denc = encode(self.draft[0], self.draft[1], dmel, self.dtype)
            prompts = [self._prompt(n, None, lang)]
            if self.condition_on_previous and n == 1:
                # the conditioned path decodes chunks sequentially (B=1):
                # warm one program per context bucket
                filler = tk.encode("a") * max(self.CONTEXT_BUCKETS)
                prompts += [self._prompt(n, filler[:b], lang)
                            for b in self.CONTEXT_BUCKETS]
            for prompt in prompts:
                for temp in ladder:
                    out = self._decode_once(enc, prompt, temp, denc=denc)
            if self.word_timestamps:
                row = list(prompts[0][0])
                self._align_words(enc[0], len(row), row, self.chunk_samples)
        if out is not None:
            np.asarray(out.avg_logprob)      # force (incl. the lazy props)

    def _decode_chunk_batch(
        self, audio_chunks: np.ndarray,
        prev: Optional[List[int]] = None,
        lang: Optional[str] = None,
    ) -> Tuple[List[Tuple[List[int], float, float]], "jnp.ndarray"]:
        """[N, chunk_samples] -> (per-chunk (token ids, avg_logprob, temp)
        results via whisper's temperature-fallback ladder, encoder states
        [N, S, d] for downstream word alignment)."""
        mel = self.frontend(jnp.asarray(audio_chunks))
        enc = encode(self.params, self.cfg, mel, self.dtype)
        n = len(audio_chunks)
        denc = None
        if self.draft is not None and n == 1:
            dmel = (self.draft_frontend(jnp.asarray(audio_chunks))
                    if self.draft_frontend is not None else mel)
            denc = encode(self.draft[0], self.draft[1], dmel, self.dtype)
        prompt = self._prompt(n, prev, lang)
        p = prompt.shape[1]
        tk = self.tokenizer

        results: List[Optional[Tuple[List[int], float, float]]] = [None] * n
        pending = list(range(n))
        ladder = (self.temperatures if self.temperature_fallback
                  else (self.temperatures[0],))
        for ti, temp in enumerate(ladder):
            if not pending:
                break
            # fixed batch slots: always decode n rows (unfinished chunks first,
            # the rest duplicate padding) so len(pending) never leaks into XLA
            # shapes — the whole ladder compiles at most len(ladder) programs
            # per chunk-batch size instead of one per distinct pending count
            idx = pending + [pending[0]] * (n - len(pending))
            sub_enc = enc[np.asarray(idx)]
            out = self._decode_once(sub_enc, prompt, temp, denc=denc)
            tokens = np.asarray(out.tokens)
            lengths = np.asarray(out.lengths)
            avg_lp = np.asarray(out.avg_logprob)
            nsp = (np.asarray(out.no_speech_prob)
                   if out.no_speech_prob is not None else None)
            still = []
            for row_i, chunk_i in enumerate(pending):
                ids = [int(t) for t in tokens[row_i, p: lengths[row_i]]
                       if t != tk.eot]
                text = tk.decode(ids)
                cr = compression_ratio(text)
                ok = (avg_lp[row_i] >= self.logprob_threshold
                      and cr <= self.compression_threshold)
                # openai's silence gate: high <|nospeech|> mass + low
                # confidence -> this window is silence, not a fallback
                # candidate (hallucinated text on quiet audio)
                silent = (nsp is not None
                          and nsp[row_i] > self.no_speech_threshold
                          and avg_lp[row_i] < self.logprob_threshold)
                last = ti == len(ladder) - 1
                nsv = float(nsp[row_i]) if nsp is not None else None
                if silent:
                    results[chunk_i] = ([], float(avg_lp[row_i]), temp,
                                        0.0, nsv)
                elif ok or last:
                    results[chunk_i] = (ids, float(avg_lp[row_i]), temp,
                                        cr, nsv)
                else:
                    still.append(chunk_i)
            pending = still
        return results, enc

    def _parse_clips(self, total_s: float) -> List[Tuple[float, float]]:
        """openai clip_timestamps: comma-separated (or list of) seconds,
        consumed as start,end pairs; a missing last end means end-of-file.
        Ranges clamp to the audio and must be non-overlapping ascending."""
        raw = self.clip_timestamps
        if isinstance(raw, str):
            vals = [float(v) for v in raw.split(",") if v.strip()]
        else:
            vals = [float(v) for v in raw]
        if not vals:
            return [(0.0, total_s)]
        if len(vals) % 2:
            vals.append(total_s)
        if any(b < a for a, b in zip(vals, vals[1:])):
            raise ValueError(f"clip_timestamps must be ascending "
                             f"non-overlapping pairs, got {raw!r}")
        pairs = []
        for s, e in zip(vals[::2], vals[1::2]):
            s = max(min(s, total_s), 0.0)
            e = max(min(e, total_s), 0.0)
            if e > s:
                pairs.append((s, e))
        return pairs or [(0.0, total_s)]

    def detect(self, audio: np.ndarray) -> Tuple[str, Dict[str, float]]:
        """Language id over the first window (whisper detect_language):
        returns (best code, {code: probability})."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        first = audio[:self.chunk_samples]
        if len(first) < self.chunk_samples:
            first = np.pad(first, (0, self.chunk_samples - len(first)))
        mel0 = self.frontend(jnp.asarray(first)[None])
        enc0 = encode(self.params, self.cfg, mel0, self.dtype)
        detected, probs = detect_language(self.params, self.cfg,
                                          self.tokenizer, enc0, self.dtype)
        row = np.asarray(probs[0], np.float64)
        return detected[0], {c: float(p)
                             for c, p in zip(self.tokenizer.languages, row)}

    def transcribe(self, audio: np.ndarray, *, batch_chunks: int = 4
                   ) -> TranscriptionResult:
        """audio: 1-D float waveform at 16 kHz. Long audio is split into 30 s
        windows (whisper's native context; the reference chunked at data-prep
        time instead, SURVEY.md §5)."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        t0 = time.perf_counter()
        sr = self.frontend.cfg.sample_rate
        total_s = len(audio) / sr
        lang = self.lang
        if lang == "auto":
            # detection stays local to this call: a reused Transcriber (e.g.
            # batch_transcribe_to_csv) must re-detect per file
            lang, _ = self.detect(audio)
            log.info("detected language: %s", lang)
        if self.clip_timestamps:
            segments = []
            for cs, ce in self._parse_clips(total_s):
                sub = audio[int(cs * sr): int(ce * sr)]
                for s in self._transcribe_segments(sub, batch_chunks, lang):
                    s.start = round(s.start + cs, 3)
                    s.end = round(s.end + cs, 3)
                    if s.words:
                        s.words = [WordTiming(w.word, round(w.start + cs, 3),
                                              round(w.end + cs, 3),
                                              w.probability)
                                   for w in s.words]
                    segments.append(s)
        else:
            segments = self._transcribe_segments(audio, batch_chunks, lang)
        wall = time.perf_counter() - t0
        return TranscriptionResult(
            text="".join(s.text for s in segments).strip(),
            segments=segments,
            audio_seconds=total_s,
            wall_seconds=wall)

    def _is_silent(self, chunk: np.ndarray) -> bool:
        """Energy VAD over one window (infer/vad.py); False when off."""
        if self.vad_threshold_db is None:
            return False
        from audax.infer.vad import is_silent
        return is_silent(chunk, self.frontend.cfg.sample_rate,
                         self.vad_threshold_db)

    def _transcribe_segments(self, audio: np.ndarray, batch_chunks: int,
                             lang: str) -> List[Segment]:
        """Chunked decode of one contiguous waveform -> Segments with times
        relative to ``audio``'s start (``transcribe`` adds clip offsets)."""
        n = len(audio)
        chunks = []
        for start in range(0, max(n, 1), self.chunk_samples):
            chunk = audio[start: start + self.chunk_samples]
            # host-side pad: a device pad would compile one tiny program
            # per distinct trailing-chunk length
            if len(chunk) < self.chunk_samples:
                chunk = np.pad(chunk, (0, self.chunk_samples - len(chunk)))
            chunks.append(chunk)
        tk = self.tokenizer
        segments: List[Segment] = []
        seq_mode = self.condition_on_previous or (
            self.timestamps and self.seek_by_timestamps) or (
            self.hallucination_silence_threshold is not None)
        if seq_mode:
            # sequential: each window's prompt carries the previous text
            # (reset after a high-temperature fallback, whisper convention);
            # initial_prompt seeds the first window's context. With
            # seek_by_timestamps the next window starts at the last
            # COMPLETE segment's end instead of a fixed 30 s stride
            # (openai's seek loop) — no word is cut at a window boundary.
            # Window shapes stay fixed (always chunk_samples), so seeking
            # costs no extra compiled programs.
            prev: List[int] = list(self.initial_prompt_ids)
            sr = self.frontend.cfg.sample_rate
            seek = 0
            last_speech = 0.0          # hallucination filter's speech cursor
            while seek < max(n, 1):
                chunk = audio[seek: seek + self.chunk_samples]
                valid = len(chunk)
                if valid < self.chunk_samples:
                    chunk = np.pad(chunk,
                                   (0, self.chunk_samples - valid))
                if self._is_silent(chunk):
                    # energy VAD: silence advances the seek (and leaves the
                    # rolling context untouched) without a decode
                    seek += self.chunk_samples
                    if n == 0:
                        break
                    continue
                (res_one, enc1) = self._decode_chunk_batch(
                    chunk[None], prev=prev, lang=lang)
                ids, avg_lp, temp, cr, nsv = res_one[0]
                prompt_row = list(self._prompt(1, prev, lang)[0])
                offset = seek / sr
                if self.timestamps:
                    seg_i = self._split_segments(ids, offset, avg_lp, temp,
                                                 cr=cr, nsv=nsv)
                else:
                    seg_i = [Segment(tk.decode(ids), offset,
                                     offset + self.chunk_seconds, avg_lp,
                                     temp, compression_ratio=cr,
                                     no_speech_prob=nsv)]
                if self.word_timestamps and ids:
                    self._attach_words(
                        seg_i, self._align_words(enc1[0], len(prompt_row),
                                                 prompt_row + ids, valid),
                        offset)
                forced_seek: Optional[float] = None
                dropped = False
                thr = self.hallucination_silence_threshold
                if thr is not None and self.word_timestamps:
                    window_end = offset + valid / sr
                    n_before = len(seg_i)
                    seg_i, forced_seek = hallucination_filter(
                        seg_i, offset=offset, window_end=window_end,
                        total_s=n / sr, threshold=thr,
                        last_speech_ts=last_speech)
                    dropped = len(seg_i) < n_before
                    word_ends = [w.end for s in seg_i
                                 for w in (s.words or [])]
                    if word_ends:
                        last_speech = max(last_speech, word_ends[-1])
                        # trailing-silence skip: re-seek to the last spoken
                        # word instead of past >threshold of silence
                        if (forced_seek is None
                                and valid == self.chunk_samples
                                and window_end - word_ends[-1] > thr):
                            forced_seek = word_ends[-1]
                if self.condition_on_previous:
                    # the rolling context takes only SURVIVING segments —
                    # extending it before the hallucination filter would
                    # re-prompt the next window with the very text the
                    # filter just rejected (openai extends all_tokens from
                    # kept segments only)
                    if temp > 0.5:
                        prev = []
                    elif dropped:
                        prev = prev + tk.encode(
                            "".join(s.text for s in seg_i))
                    else:
                        prev = prev + [t for t in ids
                                       if not tk.is_timestamp(t)]
                segments.extend(seg_i)
                advance = self.chunk_samples
                if forced_seek is not None:
                    # a floor of 1 s guarantees forward progress
                    advance = max(int(forced_seek * sr) - seek, sr)
                elif (self.timestamps and self.seek_by_timestamps and seg_i
                        and valid == self.chunk_samples):
                    last_end = max(s.end for s in seg_i) - offset
                    # seek to the last segment boundary; a floor of 1 s
                    # guarantees forward progress on degenerate output
                    if 1.0 <= last_end < self.chunk_seconds:
                        advance = int(last_end * sr)
                seek += advance
                if n == 0:
                    break
        else:
            # fixed group shape: short groups (including files with fewer
            # chunks than batch_chunks) are padded with duplicate chunks so
            # every group runs the ONE warmed batch_chunks-sized program —
            # shrinking the group would compile a fresh XLA shape at serve
            # time (minutes over the tunnel) despite warmup()
            group_size = batch_chunks
            init_ctx = self.initial_prompt_ids or None
            prompt_row = list(self._prompt(1, init_ctx, lang)[0])
            # energy VAD: silent windows never reach the device (their
            # index gap keeps surviving windows at their true offsets)
            speech = [(k, ch) for k, ch in enumerate(chunks)
                      if not self._is_silent(ch)]
            for i in range(0, len(speech), group_size):
                part = speech[i: i + group_size]
                n_valid = len(part)
                group = np.stack([ch for _, ch in part]
                                 + [part[-1][1]] * (group_size - n_valid))
                res_grp, enc_grp = self._decode_chunk_batch(group,
                                                            prev=init_ctx,
                                                            lang=lang)
                for j, (ids, avg_lp, temp, cr, nsv) in enumerate(
                        res_grp[:n_valid]):
                    k = part[j][0]
                    offset = k * self.chunk_seconds
                    if self.timestamps:
                        seg_i = self._split_segments(ids, offset, avg_lp,
                                                     temp, cr=cr, nsv=nsv)
                    else:
                        seg_i = [Segment(tk.decode(ids), offset,
                                         offset + self.chunk_seconds,
                                         avg_lp, temp,
                                         compression_ratio=cr,
                                         no_speech_prob=nsv)]
                    if self.word_timestamps and ids:
                        valid = min(len(audio) - k * self.chunk_samples,
                                    self.chunk_samples)
                        self._attach_words(
                            seg_i,
                            self._align_words(enc_grp[j], len(prompt_row),
                                              prompt_row + ids, valid),
                            offset)
                    segments.extend(seg_i)
        total_s = n / self.frontend.cfg.sample_rate
        # the final chunk is zero-padded to chunk_seconds: clamp segment
        # spans to the real audio duration (a 35 s file must not report a
        # segment ending at 60 s)
        for s in segments:
            if s.end > total_s:
                s.end = total_s
            if s.start > s.end:
                s.start = s.end
        return segments

    def _split_segments(self, ids: List[int], offset: float, avg_lp: float,
                        temp: float, *, cr: float = 0.0,
                        nsv: Optional[float] = None) -> List[Segment]:
        """Cut a chunk's tokens at timestamp pairs into timed segments."""
        tk = self.tokenizer
        segments: List[Segment] = []
        start_t: Optional[float] = None
        text_ids: List[int] = []
        for t in ids:
            if tk.is_timestamp(t):
                ts = tk.timestamp_seconds(t)
                if start_t is None:
                    start_t = ts
                else:
                    segments.append(Segment(tk.decode(text_ids),
                                            offset + start_t, offset + ts,
                                            avg_lp, temp,
                                            compression_ratio=cr,
                                            no_speech_prob=nsv))
                    start_t = None
                    text_ids = []
            else:
                text_ids.append(t)
        if text_ids:
            segments.append(Segment(tk.decode(text_ids),
                                    offset + (start_t or 0.0),
                                    offset + self.chunk_seconds, avg_lp, temp,
                                    compression_ratio=cr,
                                    no_speech_prob=nsv))
        return segments


def batch_transcribe_to_csv(
    transcriber: Transcriber, wav_paths: Sequence[str], csv_path: str,
    *, write_sidecars: bool = True,
    previous: Optional[dict] = None,
    output_format: Optional[str] = None,
    output_dir: Optional[str] = None,
    writer_opts: Optional[dict] = None,
    verbose: bool = False) -> List[dict]:
    """Transcribe a set of wavs; write per-file .txt sidecars and a summary
    CSV (the reference's transcriptions.csv/transcriptions2.csv artifacts,
    AB/wavToWhisper.py:85-103). ``previous`` maps filename -> prior
    transcription for before/after comparison columns.

    ``output_format`` ('txt'/'srt'/'vtt'/'tsv'/'json'/'all') additionally
    emits per-file transcripts into ``output_dir`` (default: alongside the
    CSV) via :mod:`audax.infer.writers`; ``writer_opts`` forwards subtitle
    line options (max_line_width / max_line_count / max_words_per_line /
    highlight_words)."""
    from audax.data.audio_io import read_wav, resample, to_mono

    writer = None
    if output_format:
        from audax.infer.writers import get_writer
        writer = get_writer(output_format,
                            output_dir or os.path.dirname(csv_path) or ".")

    rows = []
    sr = transcriber.frontend.cfg.sample_rate
    for path in wav_paths:
        try:
            x, rate = read_wav(path)
            x = to_mono(x)
            if rate != sr:
                x = resample(x, rate, sr)
            result = transcriber.transcribe(x)
            row = {"file": os.path.basename(path), "text": result.text,
                   "rtf": round(result.rtf, 4)}
            if previous:
                row["previous"] = previous.get(os.path.basename(path), "")
            rows.append(row)
            if write_sidecars:
                with open(os.path.splitext(path)[0] + ".txt", "w") as fh:
                    fh.write(result.text + "\n")
            if writer is not None:
                writer(result, path, **(writer_opts or {}))
            if verbose:
                # openai CLI's live segment lines
                from audax.infer.writers import _ts
                print(os.path.basename(path))
                for seg in result.segments:
                    print(f"[{_ts(seg.start, sep='.')} --> "
                          f"{_ts(seg.end, sep='.')}] {seg.text.strip()}")
        except Exception as e:
            log.warning("skip %s: %s", path, e)
            rows.append({"file": os.path.basename(path), "text": "",
                         "rtf": -1.0, "error": str(e)})
    if rows:
        os.makedirs(os.path.dirname(csv_path) or ".", exist_ok=True)
        keys = sorted({k for r in rows for k in r})
        with open(csv_path, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=keys)
            writer.writeheader()
            writer.writerows(rows)
    return rows
