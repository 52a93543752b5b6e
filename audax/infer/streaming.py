"""Batched streaming transcription over a device mesh.

The stretch config in BASELINE.json: "Whisper-large-v3 batched streaming
inference, pjit over a v5e slice". The reference has no streaming at all —
long audio was ffmpeg-segmented offline (SURVEY.md §5 long-context). Here:

  * N independent audio streams feed per-stream ring buffers on host;
  * whenever streams have a full window (or are flushed), up to
    ``batch_slots`` chunks are packed into ONE fixed-shape batch — a single
    compiled encode+generate serves every step (no recompiles, XLA-friendly);
  * model params can be TP-sharded over the mesh 'model' axis
    (parallel/sharding.py) and the batch rides the 'data' axis, so the same
    code serves 1 chip or a slice.

Deliberately fixed-shape: short final chunks are zero-padded to the window
(Whisper's native convention) rather than specializing shapes.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audax.core.config import WhisperConfig
from audax.core.logging import get_logger
from audax.frontend import LogMelFrontend
from audax.infer.decode import generate
from audax.models.whisper import encode
from audax.symbolic.tokenizer import WhisperTokenizer

log = get_logger("audax.streaming")

__all__ = ["StreamingTranscriber", "Segment"]


@dataclass
class Segment:
    stream_id: str
    index: int                  # chunk index within the stream
    text: str
    audio_seconds: float


@dataclass
class _Stream:
    buffer: np.ndarray
    filled: int = 0
    chunk_index: int = 0
    #: (chunk index, window-sized samples, valid sample count)
    pending: List[Tuple[int, np.ndarray, int]] = field(default_factory=list)


class StreamingTranscriber:
    """Fixed-slot batched streaming ASR.

    Usage::

        st = StreamingTranscriber(params, cfg, tokenizer, batch_slots=8)
        st.feed("mic0", samples)          # any sample counts, any time
        for seg in st.step():             # one batched device pass
            print(seg.stream_id, seg.text)
        st.flush("mic0")                  # emit trailing partial chunk
    """

    def __init__(self, params, cfg: WhisperConfig,
                 tokenizer: WhisperTokenizer, *,
                 batch_slots: int = 8, window_seconds: float = 30.0,
                 lang: str = "en", max_new_tokens: int = 224,
                 mesh=None, dtype=jnp.float32, backend: Optional[str] = None,
                 kv_quant: bool = False,
                 vad_threshold_db: Optional[float] = None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.batch_slots = batch_slots
        self.lang = lang
        self.max_new_tokens = max_new_tokens
        self.dtype = dtype
        #: int8 KV caches — halves per-slot decode cache memory/bandwidth
        self.kv_quant = kv_quant
        self.frontend = LogMelFrontend.whisper(cfg.n_mels, backend=backend)
        self.window = int(window_seconds * self.frontend.cfg.sample_rate)
        self.streams: Dict[str, _Stream] = {}
        self._mesh = mesh
        if mesh is not None:
            from audax.parallel.sharding import shard_params
            params = shard_params(params, mesh)
        self.params = params
        prompt = tokenizer.sot_sequence(lang=lang)
        self._prompt = np.asarray([prompt] * batch_slots, np.int32)
        self._max_len = min(len(prompt) + max_new_tokens, cfg.n_text_ctx)
        # control tokens are never emitted (whisper SuppressTokens)
        self._suppress = np.asarray(
            [i for i in tokenizer.special_ids() if i != tokenizer.eot],
            np.int32)
        #: energy VAD (infer/vad.py): windows under this dBFS answer as
        #: empty segments WITHOUT consuming a batch slot or a decode —
        #: idle mics cost nothing. None disables.
        self.vad_threshold_db = vad_threshold_db

    # ---------------------------------------------------------- feeding ---
    def feed(self, stream_id: str, samples: np.ndarray) -> None:
        s = self.streams.setdefault(
            stream_id, _Stream(np.zeros(self.window, np.float32)))
        samples = np.asarray(samples, np.float32).reshape(-1)
        pos = 0
        while pos < len(samples):
            take = min(self.window - s.filled, len(samples) - pos)
            s.buffer[s.filled: s.filled + take] = samples[pos: pos + take]
            s.filled += take
            pos += take
            if s.filled == self.window:
                s.pending.append((s.chunk_index, s.buffer.copy(),
                                  self.window))
                s.chunk_index += 1
                s.filled = 0

    def flush(self, stream_id: str) -> None:
        """Queue the trailing partial window (zero-padded)."""
        s = self.streams.get(stream_id)
        if s and s.filled > 0:
            chunk = np.zeros(self.window, np.float32)
            chunk[: s.filled] = s.buffer[: s.filled]
            s.pending.append((s.chunk_index, chunk, s.filled))
            s.chunk_index += 1
            s.filled = 0

    def remove(self, stream_id: str) -> None:
        """Drop a finished stream's ring buffer and queued chunks. Serving
        layers MUST call this on disconnect: streams are never evicted
        implicitly, so each leaked entry pins a window-sized float32 buffer
        (~1.9 MB at 30 s) for the life of the process."""
        self.streams.pop(stream_id, None)

    def pending_chunks(self) -> int:
        return sum(len(s.pending) for s in self.streams.values())

    # ----------------------------------------------------------- device ---
    def _run_batch(self, audio: np.ndarray) -> List[List[int]]:
        mel = self.frontend(jnp.asarray(audio))
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            # batch rides the data axis when divisible; otherwise replicate
            spec = (P("data", None, None)
                    if mel.shape[0] % self._mesh.shape["data"] == 0 else P())
            mel = jax.device_put(mel, NamedSharding(self._mesh, spec))
        enc = encode(self.params, self.cfg, mel, self.dtype)
        result = generate(self.params, self.cfg, enc,
                          jnp.asarray(self._prompt),
                          max_len=self._max_len, eos_id=self.tokenizer.eot,
                          suppress=jnp.asarray(self._suppress),
                          dtype=self.dtype, kv_quant=self.kv_quant)
        tokens = np.asarray(result.tokens)
        lengths = np.asarray(result.lengths)
        p = self._prompt.shape[1]
        return [[int(t) for t in row[p: n] if t != self.tokenizer.eot]
                for row, n in zip(tokens, lengths)]

    def step(self) -> List[Segment]:
        """Drain up to ``batch_slots`` pending chunks in one device pass.
        Empty slots are zero-filled (fixed shape, one compiled program).
        With ``vad_threshold_db`` set, silent windows are answered inline
        (empty text) and never consume a slot."""
        sr = self.frontend.cfg.sample_rate
        work: List[Tuple[str, int, np.ndarray, int]] = []
        silent: List[Segment] = []
        for sid in sorted(self.streams):
            s = self.streams[sid]
            while s.pending and len(work) < self.batch_slots:
                idx, chunk, valid = s.pending.pop(0)
                if self.vad_threshold_db is not None:
                    from audax.infer.vad import is_silent
                    if is_silent(chunk, sr, self.vad_threshold_db):
                        silent.append(Segment(sid, idx, "", valid / sr))
                        continue
                work.append((sid, idx, chunk, valid))
            if len(work) >= self.batch_slots:
                break
        if not work:
            return silent
        audio = np.zeros((self.batch_slots, self.window), np.float32)
        for i, (_, _, chunk, _) in enumerate(work):
            audio[i] = chunk
        t0 = time.perf_counter()
        decoded = self._run_batch(audio)
        dt = time.perf_counter() - t0
        # audio_seconds is the REAL content, not the padded window — a
        # flushed 3 s tail must not report 30 s to downstream consumers
        segs = silent + [Segment(sid, idx, self.tokenizer.decode(ids),
                                 valid / sr)
                         for (sid, idx, _, valid), ids in zip(work, decoded)]
        real_s = sum(v for _, _, _, v in work) / sr
        log.info("streamed %d chunks in %.2fs (batch rtf %.3f)",
                 len(work), dt, dt / max(real_s, 1e-9))
        return segs

    def drain(self) -> List[Segment]:
        """Run steps until no pending work remains."""
        out: List[Segment] = []
        while self.pending_chunks():
            out.extend(self.step())
        return out

    def warmup(self) -> None:
        """Compile the (only) batch program — frontend + encoder + decode at
        the fixed slot shape — before the first client connects. The
        persistent compilation cache makes this a no-op after the first
        process (core/runtime.setup)."""
        self._run_batch(np.zeros((self.batch_slots, self.window),
                                 np.float32))
