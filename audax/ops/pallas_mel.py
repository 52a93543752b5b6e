"""Fused Pallas log-mel kernel: window·DFT -> power -> mel -> log in one pass.

This is the BASELINE.json north-star kernel. The torchaudio reference streams
each clip through four separate CUDA ops with HBM round-trips between them
(reference: .charles/spectrogram.py:144-162, one clip at a time). Here a tile
of frames is loaded into VMEM once and the whole chain runs on-chip:

    frames[T,  N]  @ cos_w[N, F]   (MXU)   -> real
    frames[T,  N]  @ sin_w[N, F]   (MXU)   -> imag
    real^2 + imag^2                (VPU)   -> power      (never leaves VMEM)
    power[T, F]    @ fb[F, M]      (MXU)   -> mel
    log(mel)                       (VPU)   -> out[T, M]

The window is folded into the DFT basis (ops/mel.py:dft_matrices) so there is
no separate elementwise pass. All dims are zero-padded to lane/sublane
alignment; padded frequency columns have zero basis so they contribute zero
power, and padded outputs are sliced off by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audax.core.config import MelConfig
from audax.ops.mel import frontend_constants
from audax.ops.stft import apply_log, frame_signal

__all__ = ["log_mel_pallas", "fused_logmel_frames"]

_LANE = 128


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref, *, log_mode: str):
    frames = frames_ref[:]
    # HIGHEST precision: full-f32 MXU passes; default would be bf16 inputs.
    hi = jax.lax.Precision.HIGHEST
    real = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32,
                   precision=hi)
    imag = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32,
                   precision=hi)
    power = real * real + imag * imag
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    if log_mode == "log1e6":
        out_ref[:] = jnp.log(mel + 1e-6)
    else:  # "log10" and the in-kernel half of "whisper"
        out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("log_mode", "tile_t", "interpret"))
def fused_logmel_frames(
    frames: jax.Array,     # [N, n_fft] windowable frames (window folded in consts)
    cos_w: jax.Array,      # [n_fft, F]
    sin_w: jax.Array,
    fb: jax.Array,         # [F, M]
    *,
    log_mode: str = "log1e6",
    tile_t: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused kernel over padded frames. Returns [N_pad, M_pad] in
    float32; caller slices to [N, M]."""
    n, n_fft = frames.shape
    f = cos_w.shape[1]
    m = fb.shape[1]
    n_pad = _pad_to(max(n, 8), tile_t)
    fft_pad = _pad_to(n_fft, _LANE)
    f_pad = _pad_to(f, _LANE)
    m_pad = _pad_to(m, _LANE)

    frames = jnp.pad(frames, ((0, n_pad - n), (0, fft_pad - n_fft)))
    cos_w = jnp.pad(cos_w, ((0, fft_pad - n_fft), (0, f_pad - f)))
    sin_w = jnp.pad(sin_w, ((0, fft_pad - n_fft), (0, f_pad - f)))
    fb = jnp.pad(fb, ((0, f_pad - f), (0, m_pad - m)))

    grid = (n_pad // tile_t,)
    kernel = functools.partial(_kernel, log_mode=log_mode)
    flops = 2 * n_pad * fft_pad * f_pad * 2 + 2 * n_pad * f_pad * m_pad
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_t, fft_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (n_pad * fft_pad + 2 * fft_pad * f_pad
                                + f_pad * m_pad + n_pad * m_pad),
            transcendentals=n_pad * m_pad,
        ),
        interpret=interpret,
    )(frames, cos_w, sin_w, fb)
    return out


@functools.partial(jax.jit, static_argnames=("cfg", "out_dtype", "interpret"))
def log_mel_pallas(
    x: jax.Array, cfg: MelConfig, out_dtype=jnp.float32, interpret: bool = False,
) -> jax.Array:
    """Fused-Pallas log-mel: [..., n_samples] -> [..., T, n_mels].

    Numerically matched against ops/stft.py:log_mel_xla and the numpy oracle
    (tests/test_frontend.py). Framing stays in XLA (a single static gather that
    fuses into the HBM layout); everything downstream is the fused kernel.
    """
    cos_w, sin_w, fb = frontend_constants(cfg)
    frames = frame_signal(x.astype(jnp.float32), cfg)          # [..., T, n_fft]
    lead = frames.shape[:-2]
    t = frames.shape[-2]
    flat = frames.reshape((-1, cfg.n_fft))
    kernel_mode = "log1e6" if cfg.log_mode == "log1e6" else "log10"
    out = fused_logmel_frames(
        flat, jnp.asarray(cos_w), jnp.asarray(sin_w), jnp.asarray(fb),
        log_mode=kernel_mode, interpret=interpret,
    )
    mel = out[: flat.shape[0], : cfg.n_mels].reshape(lead + (t, cfg.n_mels))
    if cfg.log_mode == "whisper":
        gmax = jnp.max(mel, axis=(-2, -1), keepdims=True)
        mel = (jnp.maximum(mel, gmax - 8.0) + 4.0) / 4.0
    return mel.astype(out_dtype)
