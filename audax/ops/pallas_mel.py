"""Fused Pallas log-mel kernel: window·DFT -> power -> mel -> log in one pass.

This is the BASELINE.json north-star kernel. The torchaudio reference streams
each clip through four separate CUDA ops with HBM round-trips between them
(reference: .charles/spectrogram.py:144-162, one clip at a time). Here a tile
of frames is loaded into VMEM once and the whole chain runs on-chip:

    frames[T, N] @ dft[N, 2F']   (MXU)  -> packed real|imag columns
    ri * ri                      (VPU)  -> squared  (never leaves VMEM)
    r2[T, 2F'] @ fb2[2F', M]     (MXU)  -> mel      (power fold-in)
    log(mel)                     (VPU)  -> out[T, M]

Two structural tricks keep the MXU dense (ops/mel.py:packed_frontend_constants):
the window is folded into the DFT basis (no elementwise pre-pass), and the
real/imag split is packed to exactly 2*(n_fft//2) lanes with the Nyquist
basis occupying the always-zero imag(k=0) column — for n_fft=1024 the DFT
matmul is [1024, 1024] lane-exact, ~20% fewer MXU passes than the naive
513-padded-to-640 layout. The |X|^2 reduction rides the mel matmul for free
because fb2 routes real^2 and imag^2 columns of the same bin to the same
mel rows.

The generic (power != 2) path keeps the explicit real/imag kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audax.core.config import MelConfig
from audax.ops.mel import frontend_constants, packed_frontend_constants
from audax.ops.stft import frame_signal

__all__ = ["log_mel_pallas", "fused_logmel_frames", "fused_logmel_packed"]

_LANE = 128


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# --------------------------------------------------------------- packed ----
def _kernel_packed(frames_ref, dft_ref, fb2_ref, out_ref, *, log_mode: str,
                   precision: str = "highest"):
    hi = getattr(jax.lax.Precision, precision.upper())
    ri = jnp.dot(frames_ref[:], dft_ref[:],
                 preferred_element_type=jnp.float32, precision=hi)
    mel = jnp.dot(ri * ri, fb2_ref[:],
                  preferred_element_type=jnp.float32, precision=hi)
    if log_mode == "log1e6":
        out_ref[:] = jnp.log(mel + 1e-6)
    else:  # "log10" and the in-kernel half of "whisper"
        out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("log_mode", "tile_t", "interpret",
                                              "precision"))
def fused_logmel_packed(
    frames: jax.Array,     # [N, n_fft]
    dft: jax.Array,        # [n_fft, 2F'] packed basis
    fb2: jax.Array,        # [2F', M] power-routing filterbank
    *,
    log_mode: str = "log1e6",
    tile_t: int = 256,
    interpret: bool = False,
    precision: str = "highest",
) -> jax.Array:
    n, n_fft = frames.shape
    two_f = dft.shape[1]
    m = fb2.shape[1]
    n_pad = _pad_to(max(n, 8), tile_t)
    fft_pad = _pad_to(n_fft, _LANE)
    f_pad = _pad_to(two_f, _LANE)
    m_pad = _pad_to(m, _LANE)

    frames = jnp.pad(frames, ((0, n_pad - n), (0, fft_pad - n_fft)))
    dft = jnp.pad(dft, ((0, fft_pad - n_fft), (0, f_pad - two_f)))
    fb2 = jnp.pad(fb2, ((0, f_pad - two_f), (0, m_pad - m)))

    out = pl.pallas_call(
        functools.partial(_kernel_packed, log_mode=log_mode,
                          precision=precision),
        grid=(n_pad // tile_t,),
        in_specs=[
            pl.BlockSpec((tile_t, fft_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * fft_pad * f_pad + 2 * n_pad * f_pad * m_pad,
            bytes_accessed=4 * (n_pad * fft_pad + fft_pad * f_pad
                                + f_pad * m_pad + n_pad * m_pad),
            transcendentals=n_pad * m_pad,
        ),
        interpret=interpret,
    )(frames, dft, fb2)
    return out


# -------------------------------------------------------------- generic ----
def _kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref, *, log_mode: str,
            power: float):
    hi = jax.lax.Precision.HIGHEST
    frames = frames_ref[:]
    real = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32,
                   precision=hi)
    imag = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32,
                   precision=hi)
    p = real * real + imag * imag
    if power != 2.0:
        p = jnp.power(jnp.sqrt(jnp.maximum(p, 0.0)), power)
    mel = jnp.dot(p, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    if log_mode == "log1e6":
        out_ref[:] = jnp.log(mel + 1e-6)
    else:
        out_ref[:] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit,
                   static_argnames=("log_mode", "power", "tile_t", "interpret"))
def fused_logmel_frames(
    frames: jax.Array, cos_w: jax.Array, sin_w: jax.Array, fb: jax.Array,
    *, log_mode: str = "log1e6", power: float = 2.0, tile_t: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Generic real/imag kernel (any spectrogram power)."""
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

    out = pl.pallas_call(
        functools.partial(_kernel, log_mode=log_mode, power=power),
        grid=(n_pad // tile_t,),
        in_specs=[
            pl.BlockSpec((tile_t, fft_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_pad, f_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, m_pad), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * fft_pad * f_pad * 2 + 2 * n_pad * f_pad * m_pad,
            bytes_accessed=4 * (n_pad * fft_pad + 2 * fft_pad * f_pad
                                + f_pad * m_pad + n_pad * m_pad),
            transcendentals=n_pad * m_pad,
        ),
        interpret=interpret,
    )(frames, cos_w, sin_w, fb)
    return out


# --------------------------------------------------------------- public ----
@functools.partial(jax.jit, static_argnames=("cfg", "out_dtype", "interpret"))
def log_mel_pallas(
    x: jax.Array, cfg: MelConfig, out_dtype=jnp.float32, interpret: bool = False,
) -> jax.Array:
    """Fused-Pallas log-mel: [..., n_samples] -> [..., T, n_mels].

    Numerically matched against ops/stft.py:log_mel_xla and the numpy oracle
    (tests/test_frontend.py). Framing stays in XLA (a single static gather
    that fuses into the HBM layout); everything downstream is one fused
    kernel. power==2 configs (all in-tree presets) take the packed
    zero-waste layout.
    """
    frames = frame_signal(x.astype(jnp.float32), cfg)          # [..., T, n_fft]
    lead = frames.shape[:-2]
    t = frames.shape[-2]
    flat = frames.reshape((-1, cfg.n_fft))
    kernel_mode = "log1e6" if cfg.log_mode == "log1e6" else "log10"
    if cfg.power == 2.0:
        dft, fb2 = packed_frontend_constants(cfg)
        out = fused_logmel_packed(flat, jnp.asarray(dft), jnp.asarray(fb2),
                                  log_mode=kernel_mode, interpret=interpret,
                                  precision=cfg.matmul_precision)
    else:
        cos_w, sin_w, fb = frontend_constants(cfg)
        out = fused_logmel_frames(flat, jnp.asarray(cos_w), jnp.asarray(sin_w),
                                  jnp.asarray(fb), log_mode=kernel_mode,
                                  power=cfg.power, interpret=interpret)
    mel = out[: flat.shape[0], : cfg.n_mels].reshape(lead + (t, cfg.n_mels))
    if cfg.log_mode == "whisper":
        gmax = jnp.max(mel, axis=(-2, -1), keepdims=True)
        mel = (jnp.maximum(mel, gmax - 8.0) + 4.0) / 4.0
    return mel.astype(out_dtype)
