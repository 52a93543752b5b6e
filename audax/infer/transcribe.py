"""Transcription API: wav -> text with 30 s chunking and KV-cached decode.

Public replacement for the reference's openai-whisper usage
(AB/wavToWhisper.py:7-18 ``transcribe_audio`` and the fine-tuned-model batch
loop :44-70): one jit-compiled encode+generate per 30 s window, host-side
chunk stitching, CSV batch driver.
"""

from __future__ import annotations

import csv
import os
import time
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from audax.core.config import WhisperConfig
from audax.core.logging import get_logger
from audax.frontend import LogMelFrontend, pad_or_trim
from audax.infer.decode import generate
from audax.models.whisper import encode
from audax.symbolic.tokenizer import WhisperTokenizer

__all__ = ["Transcriber", "TranscriptionResult", "batch_transcribe_to_csv"]

log = get_logger("audax.infer")

CHUNK_SECONDS = 30.0


@dataclass
class TranscriptionResult:
    text: str
    segments: List[str]
    audio_seconds: float
    wall_seconds: float

    @property
    def rtf(self) -> float:
        """Real-time factor (wall / audio); BASELINE target <= 0.05."""
        return self.wall_seconds / max(self.audio_seconds, 1e-9)


class Transcriber:
    """Bundled frontend + Whisper params + tokenizer."""

    def __init__(self, params, cfg: WhisperConfig,
                 tokenizer: WhisperTokenizer, *,
                 lang: str = "en", max_new_tokens: int = 224,
                 dtype=jnp.float32, backend: Optional[str] = None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.lang = lang
        self.max_new_tokens = max_new_tokens
        self.dtype = dtype
        self.frontend = LogMelFrontend.whisper(cfg.n_mels, backend=backend)
        self.chunk_samples = int(CHUNK_SECONDS * self.frontend.cfg.sample_rate)

    def _decode_chunk_batch(self, audio_chunks: np.ndarray) -> List[List[int]]:
        """[N, chunk_samples] -> token id lists (specials stripped later)."""
        mel = self.frontend(jnp.asarray(audio_chunks))
        enc = encode(self.params, self.cfg, mel, self.dtype)
        tk = self.tokenizer
        prompt = np.asarray([tk.sot_sequence(lang=self.lang)] * len(audio_chunks),
                            np.int32)
        max_len = prompt.shape[1] + self.max_new_tokens
        result = generate(
            self.params, self.cfg, enc, jnp.asarray(prompt),
            max_len=min(max_len, self.cfg.n_text_ctx),
            eos_id=tk.eot, dtype=self.dtype)
        tokens = np.asarray(result.tokens)
        lengths = np.asarray(result.lengths)
        out = []
        for row, n in zip(tokens, lengths):
            out.append([int(t) for t in row[prompt.shape[1]: n]
                        if t != tk.eot])
        return out

    def transcribe(self, audio: np.ndarray, *, batch_chunks: int = 4
                   ) -> TranscriptionResult:
        """audio: 1-D float waveform at 16 kHz. Long audio is split into 30 s
        windows (whisper's native context; the reference chunked at data-prep
        time instead, SURVEY.md §5 long-context)."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        t0 = time.perf_counter()
        n = len(audio)
        chunks = []
        for start in range(0, max(n, 1), self.chunk_samples):
            chunk = audio[start: start + self.chunk_samples]
            chunks.append(np.asarray(
                pad_or_trim(jnp.asarray(chunk), self.chunk_samples)))
        segments: List[str] = []
        for i in range(0, len(chunks), batch_chunks):
            group = np.stack(chunks[i: i + batch_chunks])
            for ids in self._decode_chunk_batch(group):
                segments.append(self.tokenizer.decode(ids))
        wall = time.perf_counter() - t0
        return TranscriptionResult(
            text="".join(segments).strip(), segments=segments,
            audio_seconds=n / self.frontend.cfg.sample_rate, wall_seconds=wall)


def batch_transcribe_to_csv(
    transcriber: Transcriber, wav_paths: Sequence[str], csv_path: str,
    *, write_sidecars: bool = True,
    previous: Optional[dict] = None) -> List[dict]:
    """Transcribe a set of wavs; write per-file .txt sidecars and a summary
    CSV (the reference's transcriptions.csv/transcriptions2.csv artifacts,
    AB/wavToWhisper.py:85-103). ``previous`` maps filename -> prior
    transcription for before/after comparison columns."""
    from audax.data.audio_io import read_wav, resample, to_mono

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
