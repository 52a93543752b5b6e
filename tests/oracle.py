"""Independent numpy oracle for the log-mel frontend.

Implements the torchaudio-MelSpectrogram / Whisper-WhisperFeatureExtractor
semantics from first principles with numpy's rfft — sharing NO code with
audax.ops (different FFT algorithm, different filterbank code path is
cross-checked against torch.stft in tests). SURVEY.md §4 calls for exactly
this kernel-vs-oracle strategy.
"""

from __future__ import annotations

import numpy as np


def hz_to_mel(f, htk):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    out = 3.0 * f / 200.0
    mask = f >= 1000.0
    out = np.where(mask, 15.0 + 27.0 * np.log(np.maximum(f, 1e-9) / 1000.0) / np.log(6.4), out)
    return out


def mel_to_hz(m, htk):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    out = 200.0 * m / 3.0
    mask = m >= 15.0
    out = np.where(mask, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), out)
    return out


def mel_fb(n_freqs, n_mels, sr, fmin, fmax, htk, norm_slaney):
    freqs = np.linspace(0, sr / 2, n_freqs)
    pts = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk)
    fb = np.zeros((n_freqs, n_mels))
    for i in range(n_mels):
        lo, mid, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / max(mid - lo, 1e-10)
        down = (hi - freqs) / max(hi - mid, 1e-10)
        fb[:, i] = np.maximum(0.0, np.minimum(up, down))
        if norm_slaney:
            fb[:, i] *= 2.0 / (hi - lo)
    return fb


def log_mel_oracle(x: np.ndarray, cfg, *, whisper_frames: bool = False
                   ) -> np.ndarray:
    """x: [n_samples] float -> [T, n_mels] float64 log-mel via numpy rfft.

    ``whisper_frames=True`` reproduces the full WhisperFeatureExtractor
    contract: the final STFT frame is dropped BEFORE the max-8 clamp (the
    reference trims, then takes the max — a loud trimmed frame must not set
    the clamp floor)."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(cfg.win) / cfg.win))
    if cfg.win < n_fft:
        pl = (n_fft - cfg.win) // 2
        win = np.pad(win, (pl, n_fft - cfg.win - pl))
    x = np.asarray(x, dtype=np.float64)
    if cfg.center:
        x = np.pad(x, n_fft // 2, mode="reflect")
    t = (len(x) - n_fft) // hop + 1
    spec = np.empty((t, n_fft // 2 + 1))
    for i in range(t):
        frame = x[i * hop: i * hop + n_fft] * win
        fft = np.fft.rfft(frame)
        spec[i] = np.abs(fft) ** 2
    if cfg.power != 2.0:
        spec = np.sqrt(spec) ** cfg.power
    fb = mel_fb(n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate, cfg.fmin, cfg.fmax,
                cfg.htk, cfg.norm_slaney)
    mel = spec @ fb
    if whisper_frames:
        mel = mel[:-1]
    if cfg.log_mode == "log1e6":
        return np.log(mel + 1e-6)
    if cfg.log_mode == "log10":
        return np.log10(np.maximum(mel, 1e-10))
    if cfg.log_mode == "whisper":
        ls = np.log10(np.maximum(mel, 1e-10))
        ls = np.maximum(ls, ls.max() - 8.0)
        return (ls + 4.0) / 4.0
    raise ValueError(cfg.log_mode)
