"""Framing + pure-XLA log-mel path (the Pallas kernel's oracle twin).

This path is correct everywhere (CPU tests, interpret mode) and is itself a
good TPU program: framing is one gather, the DFT/mel are MXU matmuls, and XLA
fuses the elementwise epilogue. ops/pallas_mel.py goes further by keeping the
power spectrum in VMEM. Both share the constants from ops/mel.py.

Reference semantics reproduced (SURVEY.md hard part #1):
  * center=True reflect padding (torch.stft default used by torchaudio's
    MelSpectrogram, .charles/spectrogram.py:79-87)
  * power=2.0 spectrogram
  * log modes: log(x+1e-6) (spectrogram.py:162), Whisper log10 + max-8 clamp
    + (x+4)/4, plain log10.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from audax.core.config import MelConfig
from audax.ops.mel import frontend_constants

__all__ = ["frame_signal", "log_mel_xla", "apply_log", "num_frames"]


def num_frames(cfg: MelConfig, n_samples: int) -> int:
    return cfg.frames_for(n_samples)


def frame_signal(x: jax.Array, cfg: MelConfig) -> jax.Array:
    """[..., n_samples] -> [..., T, n_fft] overlapping frames.

    With center=True, reflect-pads n_fft//2 on both sides so frame ``t`` is
    centred on sample ``t*hop`` (torch.stft convention).
    """
    n_fft, hop = cfg.n_fft, cfg.hop_length
    if cfg.center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n = x.shape[-1]
    t = (n - n_fft) // hop + 1
    starts = np.arange(t) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]        # [T, n_fft] static
    return x[..., idx]


def apply_log(mel: jax.Array, mode: str) -> jax.Array:
    """Log compression variants. ``mel`` is a power-mel spectrogram
    [..., T, n_mels]; the Whisper max-clamp is per-item (over the last two
    axes), matching per-sample WhisperFeatureExtractor behavior."""
    if mode == "log1e6":
        return jnp.log(mel + 1e-6)
    if mode == "log10":
        return jnp.log10(jnp.maximum(mel, 1e-10))
    if mode == "whisper":
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        gmax = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        log_spec = jnp.maximum(log_spec, gmax - 8.0)
        return (log_spec + 4.0) / 4.0
    raise ValueError(f"unknown log mode: {mode}")


@functools.partial(jax.jit,
                   static_argnames=("cfg", "out_dtype", "whisper_post"))
def log_mel_xla(x: jax.Array, cfg: MelConfig, out_dtype=jnp.float32,
                *, whisper_post: bool = True) -> jax.Array:
    """Pure-XLA fused log-mel: [..., n_samples] -> [..., T, n_mels].

    Constants are baked in at trace time (they are functions of the static
    cfg), so XLA keeps them device-resident across calls.
    """
    cos_w, sin_w, fb = frontend_constants(cfg)
    cos_w, sin_w, fb = jnp.asarray(cos_w), jnp.asarray(sin_w), jnp.asarray(fb)
    frames = frame_signal(x.astype(jnp.float32), cfg)         # [..., T, n_fft]
    # HIGHEST (default) = exact f32: on TPU, default-precision f32 matmuls
    # run as bf16 passes, too coarse for log-domain parity (hard part #1).
    # cfg.matmul_precision="high" opts into 3-pass bf16 for training speed.
    hi = getattr(jax.lax.Precision, cfg.matmul_precision.upper())
    real = jnp.matmul(frames, cos_w, precision=hi)            # MXU
    imag = jnp.matmul(frames, sin_w, precision=hi)            # MXU
    power = real * real + imag * imag
    if cfg.power != 2.0:
        power = jnp.power(jnp.sqrt(jnp.maximum(power, 0.0)), cfg.power)
    mel = jnp.matmul(power, fb, precision=hi)                 # MXU
    mode = cfg.log_mode
    if mode == "whisper" and not whisper_post:
        # raw log10; the caller trims frames first, then applies the
        # per-item max-clamp epilogue (pallas_mel.whisper_post_clamp)
        mode = "log10"
    return apply_log(mel, mode).astype(out_dtype)
