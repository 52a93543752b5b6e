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

When hop divides n_fft (hop << n_fft is exactly when framing is wasteful),
the OVERLAP-REUSE kernel goes NB = n_fft/hop times further: each hop-block
of raw signal is zoom-DFT'd once, frames are recombined with NB-periodic
twiddles, and the periodic-Hann window is applied as an exact 3-tap
spectral convolution (math in ops/mel.py:overlap_frontend_constants). Per
frame the DFT matmul shrinks NB-fold and the signal is read once instead
of NB times. All at f32 HIGHEST — bit-comparable to the direct oracle.

The generic (power != 2) path keeps the explicit real/imag kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audax.core.config import MelConfig
from audax.ops.mel import (frontend_constants, overlap_frontend_constants,
                           packed_frontend_constants)
from audax.ops.stft import frame_signal

__all__ = ["log_mel_pallas", "fused_logmel_frames", "fused_logmel_packed",
           "log_mel_overlap", "overlap_applicable", "whisper_post_clamp"]

_LANE = 128

from audax.ops.common import pad_to as _pad_to  # noqa: E402 - shared policy


def whisper_post_clamp(log_spec: jax.Array) -> jax.Array:
    """Whisper's per-item log-mel epilogue: clamp to (global max - 8) over
    the last two axes, then (x + 4) / 4. Must run over exactly the frames
    the model sees — i.e. AFTER the final STFT frame is dropped (the
    reference's WhisperFeatureExtractor trims, then takes the max)."""
    gmax = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    return (jnp.maximum(log_spec, gmax - 8.0) + 4.0) / 4.0


# -------------------------------------------------------------- overlap ----
def overlap_applicable(cfg: MelConfig) -> bool:
    """The overlap-reuse kernel needs: power spectrogram, full-width
    periodic Hann window, a useful block decomposition (g = gcd(n_fft, hop)
    sublane-aligned, with real reuse nb > a), and the a-plane layout
    implemented for a = hop/g in {1, 2} — which covers every in-tree
    preset (UrbanSound g=128/512 a=1; Whisper g=80 a=2)."""
    from audax.ops.mel import overlap_block_size
    if not (cfg.power == 2.0 and cfg.win == cfg.n_fft):
        return False
    g = overlap_block_size(cfg)
    nb, adv = cfg.n_fft // g, cfg.hop_length // g
    return g % 8 == 0 and adv in (1, 2) and nb > adv


def _kernel_overlap(sig_ref, dftc_ref, dfts_ref, tw_ref, fb_ref, out_ref, *,
                    nb: int, adv: int, n_freqs: int, log_mode: str,
                    precision: str = "highest"):
    """One (clip, frame-tile) program: zoom-DFT the tile's g-blocks (MXU),
    recombine frames via NB twiddle-shifted accumulations (VPU), apply the
    periodic-Hann 3-tap spectral conv, square, mel-project (MXU), log.

    ``sig_ref`` carries ``adv`` block planes (plane p holds blocks with
    index = p mod adv), so frame t's block ``t*adv + j`` is plane
    ``j % adv`` at row offset ``t + j // adv`` — every in-kernel slice
    stays unit-stride."""
    hi = getattr(jax.lax.Precision, precision.upper())
    rows = out_ref.shape[1]
    zs = []
    for pl_idx in range(adv):
        sig = sig_ref[0, pl_idx]                         # [rows+halo, G]
        zs.append((
            jnp.dot(sig, dftc_ref[:], preferred_element_type=jnp.float32,
                    precision=hi),                       # [rows+halo, FP]
            jnp.dot(sig, dfts_ref[:], preferred_element_type=jnp.float32,
                    precision=hi)))
    fp = zs[0][0].shape[1]
    xr = jnp.zeros((rows, fp), jnp.float32)
    xi = jnp.zeros((rows, fp), jnp.float32)
    for j in range(nb):
        c = tw_ref[j, :][None, :]
        s = tw_ref[nb + j, :][None, :]
        zr, zi = zs[j % adv]
        off = j // adv
        zrj = zr[off:off + rows]
        zij = zi[off:off + rows]
        xr = xr + c * zrj - s * zij
        xi = xi + c * zij + s * zrj
    # periodic hann == exact spectral 3-tap: 0.5 X_k - 0.25 (X_{k-1}+X_{k+1})
    # with conjugate-symmetric edges X_{-1} = conj(X_1), X_F = conj(X_{F-2})
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, fp), 1)
    rp_r = pltpu.roll(xr, 1, 1)
    rm_r = pltpu.roll(xr, fp - 1, 1)
    rp_i = pltpu.roll(xi, 1, 1)
    rm_i = pltpu.roll(xi, fp - 1, 1)
    left_r = jnp.where(lane == 0, rm_r, rp_r)
    left_i = jnp.where(lane == 0, -rm_i, rp_i)
    right_r = jnp.where(lane == n_freqs - 1, rp_r, rm_r)
    right_i = jnp.where(lane == n_freqs - 1, -rp_i, rm_i)
    wr = 0.5 * xr - 0.25 * (left_r + right_r)
    wi = 0.5 * xi - 0.25 * (left_i + right_i)
    p = wr * wr + wi * wi
    p = jnp.where(lane < n_freqs, p, 0.0)
    mel = jnp.dot(p, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    if log_mode == "log1e6":
        out_ref[0] = jnp.log(mel + 1e-6)
    else:
        out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_t", "whisper_post",
                                    "interpret"))
def log_mel_overlap(
    x: jax.Array,            # [..., n_samples]
    cfg: MelConfig,
    *,
    tile_t: int = 512,
    whisper_post: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Overlap-reuse fused log-mel: [..., n_samples] -> [..., T, n_mels].

    Numerically EXACT vs the direct windowed-DFT oracle (f32 HIGHEST
    throughout); NB/a-fold less MXU work and no NB/a-fold HBM framing
    duplication (docstring math in ops/mel.py:overlap_frontend_constants).
    Replaces the reference's per-clip torchaudio MelSpectrogram hot loop
    (reference: .charles/spectrogram.py:136-175) and the WhisperProcessor
    mel path (AB/fineTune.py:88).
    """
    from audax.ops.mel import overlap_block_size

    g = overlap_block_size(cfg)
    nb, adv = cfg.n_fft // g, cfg.hop_length // g
    # plane p needs row offsets up to (nb - 1 - p) // adv past the frame row
    halo = _pad_to(-(-(nb - 1) // adv), 8)
    lead = x.shape[:-1]
    n = x.shape[-1]
    b = 1
    for d in lead:
        b *= d
    x = x.reshape(b, n).astype(jnp.float32)

    dftc, dfts, tw, fb = [jnp.asarray(a)
                          for a in overlap_frontend_constants(cfg, _LANE)]
    fp, mp = fb.shape

    if cfg.center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        t_true = n // cfg.hop_length + 1
    else:
        t_true = max(0, (n - cfg.n_fft) // cfg.hop_length + 1)
    if t_true == 0:                     # sub-window input, center=False
        return jnp.zeros(lead + (0, cfg.n_mels), jnp.float32)
    rows = min(tile_t, _pad_to(max(t_true, 8), 8))
    n_tiles = -(-t_true // rows)
    # block planes: plane p holds blocks p, p+adv, ... — each plane needs
    # rows + halo rows per tile. The (center-)padded signal can be LONGER
    # than need*g when the halo has no rounding slack (e.g. nb-1 already a
    # multiple of 8): pad or trim to exactly need*g
    need = (n_tiles * rows + halo) * adv               # blocks to cover
    total = need * g
    x = jnp.pad(x, ((0, 0), (0, max(0, total - x.shape[1]))))[:, :total]
    blocks = x.reshape(b, need, g)
    planes = jnp.stack([blocks[:, pl_idx::adv] for pl_idx in range(adv)], 1)
    # halo rows are duplicated per tile host-side in XLA: a halo/rows (~2%)
    # HBM overhead, which buys clean non-overlapping BlockSpecs
    tiles = [planes[:, :, i * rows: i * rows + rows + halo]
             for i in range(n_tiles)]
    sig_tiles = jnp.stack(tiles, 1).reshape(b * n_tiles, adv,
                                            rows + halo, g)

    kernel_mode = "log1e6" if cfg.log_mode == "log1e6" else "log10"
    out = pl.pallas_call(
        functools.partial(_kernel_overlap, nb=nb, adv=adv,
                          n_freqs=cfg.n_freqs, log_mode=kernel_mode,
                          precision=cfg.matmul_precision),
        grid=(b * n_tiles,),
        in_specs=[
            pl.BlockSpec((1, adv, rows + halo, g), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * nb, fp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, mp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n_tiles, rows, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=b * n_tiles * (2 * adv * (rows + halo) * g * fp * 2
                                 + 2 * rows * fp * mp),
            bytes_accessed=4 * b * n_tiles * (adv * (rows + halo) * g
                                              + rows * mp),
            transcendentals=b * n_tiles * rows * mp,
        ),
        interpret=interpret,
    )(sig_tiles, dftc, dfts, tw, fb)
    out = (out.reshape(b, n_tiles, rows, mp)
              .reshape(b, n_tiles * rows, mp)[:, :t_true, : cfg.n_mels])
    out = out.reshape(lead + (t_true, cfg.n_mels))
    if cfg.log_mode == "whisper" and whisper_post:
        out = whisper_post_clamp(out)
    return out


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
@functools.partial(jax.jit, static_argnames=("cfg", "out_dtype", "interpret",
                                             "whisper_post"))
def log_mel_pallas(
    x: jax.Array, cfg: MelConfig, out_dtype=jnp.float32, interpret: bool = False,
    *, whisper_post: bool = True,
) -> jax.Array:
    """Fused-Pallas log-mel: [..., n_samples] -> [..., T, n_mels].

    Numerically matched against ops/stft.py:log_mel_xla and the numpy oracle
    (tests/test_frontend.py). Three tiers, picked per config:
      1. overlap-reuse kernel (hop | n_fft, lane-aligned hop, power 2,
         full-width hann): NB-fold less DFT work, signal read once —
         the fastest path and the one the bench exercises;
      2. packed zero-waste direct kernel (any power==2 config);
      3. generic real/imag kernel (power != 2).
    """
    if overlap_applicable(cfg):
        mel = log_mel_overlap(x, cfg, whisper_post=whisper_post,
                              interpret=interpret)
        return mel.astype(out_dtype)
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
    if cfg.log_mode == "whisper" and whisper_post:
        mel = whisper_post_clamp(mel)
    return mel.astype(out_dtype)
