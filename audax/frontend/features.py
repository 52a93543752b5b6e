"""Public audio feature-extraction API.

``LogMelFrontend`` is the single entry point both pipelines use:

  * UrbanSound contract — pad/trim to 4.0 s then log-mel [n_mels, T]
    (reference: .charles/spectrogram.py:152-162; shapes [128,501] v2 /
    [64,126] v1, .charles/urbansound8k_sql.md:80-136).
  * Whisper contract — pad/trim to 30 s, log-mel with the final STFT frame
    dropped -> exactly 3000 frames, Whisper log10/max-clamp/scale
    (reference constants quoted at .charles/urbansound8k_sql.md:19-31).

Backend selection: the fused Pallas kernel on TPU, the XLA twin elsewhere
(CPU tests, interpret debugging). Both share constants and are parity-tested
against a numpy oracle (tests/test_frontend.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

import functools

from audax.core.config import MelConfig
from audax.ops.pallas_mel import log_mel_pallas, whisper_post_clamp
from audax.ops.stft import log_mel_xla

__all__ = ["LogMelFrontend", "pad_or_trim"]


@functools.partial(jax.jit, static_argnames=("cfg", "backend",
                                             "whisper_frames", "mel_first"))
def _frontend_impl(audio: jax.Array, *, cfg: MelConfig, backend: str,
                   whisper_frames: bool, mel_first: bool) -> jax.Array:
    """The whole frontend under ONE jit (eager slices/transposes cost a
    ~0.5 s dispatch each over the tunnel). Whisper ordering matters: the
    final STFT frame is dropped BEFORE the max-8 clamp — the reference's
    WhisperFeatureExtractor trims, then takes the max, so a loud trimmed
    frame must not set the clamp floor for the 3000 retained frames."""
    fn = log_mel_pallas if backend == "pallas" else log_mel_xla
    whisper_mode = cfg.log_mode == "whisper"
    mel = fn(audio, cfg, whisper_post=not whisper_frames)
    if whisper_frames:
        mel = mel[..., :-1, :]
        if whisper_mode:
            mel = whisper_post_clamp(mel)
    if mel_first:
        mel = jnp.swapaxes(mel, -1, -2)
    return mel


def pad_or_trim(x: jax.Array, n_samples: int, axis: int = -1) -> jax.Array:
    """Zero-pad or cut to exactly ``n_samples`` (reference pad/trim:
    .charles/spectrogram.py:152-157; whisper.pad_or_trim equivalent)."""
    n = x.shape[axis]
    if n > n_samples:
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(0, n_samples)
        return x[tuple(sl)]
    if n < n_samples:
        pad = [(0, 0)] * x.ndim
        pad[axis % x.ndim] = (0, n_samples - n)
        return jnp.pad(x, pad)
    return x


def _default_backend() -> str:
    from audax.ops.common import on_tpu
    return "pallas" if on_tpu() else "xla"


class LogMelFrontend:
    """Batched waveform -> log-mel features.

    Call with ``[..., n_samples]`` float audio at ``cfg.sample_rate``;
    returns ``[..., T, n_mels]`` (time-major; transpose for the reference's
    [n_mels, T] layout via ``mel_first=True``).
    """

    def __init__(self, cfg: Optional[MelConfig] = None, *,
                 backend: Optional[str] = None,
                 whisper_frames: bool = False):
        self.cfg = cfg or MelConfig()
        self.backend = backend or _default_backend()
        #: Whisper drops the final centre-padded STFT frame so 30 s -> 3000.
        self.whisper_frames = whisper_frames

    @classmethod
    def whisper(cls, n_mels: int = 80, **kw) -> "LogMelFrontend":
        return cls(MelConfig.whisper(n_mels), whisper_frames=True, **kw)

    @classmethod
    def urbansound(cls, version: int = 2, **kw) -> "LogMelFrontend":
        cfg = MelConfig.urbansound_v2() if version == 2 else MelConfig.urbansound_v1()
        return cls(cfg, **kw)

    def __call__(self, audio: jax.Array, *, mel_first: bool = False) -> jax.Array:
        return _frontend_impl(audio, cfg=self.cfg, backend=self.backend,
                              whisper_frames=self.whisper_frames,
                              mel_first=mel_first)

    def num_frames(self, n_samples: int) -> int:
        t = self.cfg.frames_for(n_samples)
        return t - 1 if self.whisper_frames else t
