"""Int4 weight-only matmul for the decode hot path.

TPU decode is HBM-bandwidth bound: every generated token re-reads every
decoder weight, so bytes-per-weight is tokens/s. ``jnp.int4`` is NOT
bit-packed on this runtime (measured: same HBM bytes as int8 —
CLAUDE.md), so 4-bit storage is done manually: two signed nibbles per
uint8 byte, packed split-half along the contraction axis, with one f32
scale per (group of 128 contraction rows, output channel) — the standard
RTN group-wise scheme (per-channel int4 alone is too lossy).

Layouts (``K`` = contraction/input dim, ``N`` = output dim):
  packed  uint8 [..., K//2, N]   byte (c, n) holds K-row c in the low
                                 nibble and K-row c + K//2 in the high
                                 nibble, each stored as q + 8, q in [-7,7].
                                 K stays on sublanes / N on lanes so the
                                 kernel's dots contract lhs-lanes against
                                 rhs-sublanes — the MXU's native
                                 orientation; an [N, K] layout would force
                                 Mosaic to transpose every weight tile
                                 (measured 3x slower than the int8 einsum)
  scales  f32   [..., G, N]      G = K // group; group never straddles the
                                 split-half boundary (K//2 % group == 0)

The pallas kernel unpacks per N-block in VMEM and runs one small
``x_g @ w_g^T`` MXU dot per group, scaling partials by the group's scale
row — HBM traffic is exactly the packed bytes (0.5x int8, 0.25x bf16).
A leading layer axis is selected in-kernel via scalar prefetch (same
pattern as ops/attention.py:decode_attention_stacked), so a scan-stacked
decoder never materialises a per-layer weight slice.

This is a serving capability with no reference equivalent (the reference
serves f32 torch checkpoints, .charles/music2midi/inference.py:300-369);
it exists because the rebuild targets production TPU serving
(models/quantize.py holds the int8 tier and the tree walker).

Why ~8-10 us at [8,1280]x[1280,5120] is this kernel's floor (the
selected-bytes HBM floor is ~4.3 us): the gap is VPU unpack latency,
and every layout/precision attack on it has been measured and rejected —
  * u8-native mask/shift (no widen): Mosaic cannot shift packed u8
    vectors (tools/int4_unpack_probe.py);
  * dequant-in-kernel single full-K dot: slower (same probe);
  * W4A8 s8xs8 MXU dots: no win + activation-quant noise
    (tools/w4a8_probe.py);
  * plane-interleaved i32 packing, 8 nibbles/word, single shift+mask
    per plane and NO widen (round 5, tools/int4_plane_probe.py):
    bit-exact vs this kernel but 0.95x — the u8->i32 widen this layout
    removes was never the cost; i32 loads + per-plane extraction pay
    slightly more than the widen saved.
The remaining unpack work (one cast per nibble into the dot dtype) is
irreducible on this VPU: the MXU's hardware int8->bf16 ingestion cast is
unreachable for sub-byte packings, so K*N nibble->bf16 casts must run as
vector ops regardless of how the nibbles are laid out in HBM.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fit_group", "quantize_int4", "dequantize_int4", "int4_matmul"]

_ENV_BACKEND = os.environ.get("AUDAX_INT4_BACKEND") or None


from audax.ops.common import on_tpu as _on_tpu  # noqa: E402 - shared policy


def fit_group(k_dim: int, group: int = 128) -> int:
    """Largest divisor of ``k_dim // 2`` that is <= ``group``, found by
    halving (so it is ``group`` itself when that divides, else possibly
    non-power-of-two, e.g. fit_group(160) == 80). Split-half packing
    requires groups not to straddle the half boundary."""
    if k_dim % 2:
        raise ValueError(f"int4 packing needs an even contraction dim, "
                         f"got {k_dim}")
    g = min(group, k_dim // 2)
    while (k_dim // 2) % g:
        g //= 2
    if g < 1:
        raise ValueError(f"no valid int4 group for K={k_dim}")
    return g


def quantize_int4(w: jnp.ndarray, *, group: int = 128
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize ``w`` [..., K, N] (contraction axis -2, as stored by the
    model inits) to (packed [..., K//2, N] uint8, scales [..., G, N] f32).
    """
    w = jnp.asarray(w)
    k_dim, n = w.shape[-2], w.shape[-1]
    g = fit_group(k_dim, group)
    num_g = k_dim // g
    grouped = w.reshape(*w.shape[:-2], num_g, g, n)      # [..., G, g, N]
    s = jnp.max(jnp.abs(grouped), axis=-2)               # [..., G, N]
    s = jnp.maximum(s / 7.0, 1e-12)
    q = jnp.clip(jnp.round(grouped / s[..., None, :]), -7, 7)
    q = q.reshape(*w.shape[:-2], k_dim, n)                # [..., K, N]
    lo = (q[..., : k_dim // 2, :] + 8).astype(jnp.uint8)
    hi = (q[..., k_dim // 2:, :] + 8).astype(jnp.uint8)
    packed = jnp.bitwise_or(lo, hi << 4)                  # [..., K//2, N]
    return packed, s.astype(jnp.float32)


def dequantize_int4(packed: jnp.ndarray, scales: jnp.ndarray,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Inverse of ``quantize_int4`` -> [..., K, N] in ``dtype`` (the
    model kernels' natural contraction-major layout)."""
    kh = packed.shape[-2]
    num_g = scales.shape[-2]
    g = 2 * kh // num_g
    pi = packed.astype(jnp.int32)
    lo = (pi & 0xF) - 8
    hi = (pi >> 4) - 8
    q = jnp.concatenate([lo, hi], axis=-2).astype(dtype)  # [..., K, N]
    s = jnp.repeat(scales.astype(dtype), g, axis=-2)       # [..., K, N]
    return q * s


# ----------------------------------------------------------- kernel -------

def _int4_kernel(l_ref, x_ref, w_ref, s_ref, o_ref, *, group: int):
    """One [M, nb] output block: nibble unpack + per-group dots + scale.

    x [M, K]; w [1, K//2, nb] uint8 (layer-selected by the index map);
    s [1, G, nb] f32. Group g < G/2 lives in low nibbles at packed rows
    [g*group, (g+1)*group); g >= G/2 in high nibbles at the same rows
    relative to the half — in both cases the x columns are
    [g*group, (g+1)*group) because the halves are contiguous in K.

    The dots contract lhs-lanes against rhs-sublanes (the MXU's native
    orientation — an [N, K] weight layout measured 3x slower from the
    per-tile transpose). The unpack is the remaining VPU cost, kept to
    one widen + one mask/shift + one cast per half; the nibble's -8
    zero-point never touches the weights — it folds into the dot as
    ``-8 * sum(x_g)`` per group (dot(x, n - 8) = dot(x, n) - 8*sum(x))."""
    x = x_ref[...]
    w = w_ref[0]                                   # [K//2, nb] uint8
    s = s_ref[0]                                   # [G, nb] f32
    m, k_dim = x.shape
    num_g = s.shape[0]
    # f32 activations ask for HIGHEST so the MXU doesn't truncate them
    # to bf16 (the int weights are exact in bf16 either way); these
    # matvecs are bandwidth-bound so the extra passes are free. bf16
    # activations must use DEFAULT — Mosaic rejects an fp32-precision
    # contract on bf16 operands ("Bad lhs type").
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    wi = w.astype(jnp.int32)                       # [K//2, nb], one widen
    halves = ((wi & 0xF).astype(x.dtype), (wi >> 4).astype(x.dtype))
    # per-(row, group) sum of x for the zero-point correction (f32: a
    # bf16 128-term sum would inject ~1% noise into the correction)
    xs = jnp.sum(x.astype(jnp.float32).reshape(m, num_g, group), axis=-1)
    acc = jnp.zeros((m, w.shape[1]), jnp.float32)
    for gi in range(num_g):
        half = halves[0] if gi < num_g // 2 else halves[1]
        base = (gi if gi < num_g // 2 else gi - num_g // 2) * group
        wg = half[base:base + group, :]            # [group, nb] raw nibble
        xg = x[:, gi * group:(gi + 1) * group]     # [M, group]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                         # [M, nb]
        part = part - 8.0 * xs[:, gi:gi + 1]
        acc = acc + part * s[gi:gi + 1, :]
    o_ref[...] = acc.astype(o_ref.dtype)


from audax.ops.common import pad_to as _pad_to  # noqa: E402 - shared policy


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scales: jnp.ndarray,
                *, layer=None, block_n: int = 1024,
                backend: Optional[str] = None,
                interpret: bool = False) -> jnp.ndarray:
    """``x @ dequant(packed, scales)`` -> [..., N] (dequant is [K, N]).

    x [..., K] (leading dims flattened to M); ``packed``/``scales`` as
    produced by ``quantize_int4``, optionally with ONE leading stacked
    axis selected by the ``layer`` scalar (scan-stacked decoders; the
    selection happens inside the kernel's index maps, never as a slice).
    The pallas path is built for small M (decode/speculative spans); large
    M or non-TPU fall back to an XLA dequant-then-matmul.
    """
    stacked = packed.ndim == 3
    if not stacked:
        packed = packed[None]
        scales = scales[None]
        layer = 0
    elif layer is None:
        raise ValueError("stacked int4 weights need a layer index")
    kh, n = packed.shape[-2:]
    k_dim = 2 * kh
    num_g = scales.shape[-2]
    group = k_dim // num_g
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k_dim)
    backend = backend or _ENV_BACKEND or ("pallas" if _on_tpu() else "xla")
    if backend != "pallas" or m > 256:
        w = dequantize_int4(
            jax.lax.dynamic_index_in_dim(packed, layer, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(scales, layer, 0, keepdims=False),
            dtype=x.dtype)
        y = jax.lax.dot_general(x2, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return y.astype(x.dtype).reshape(*lead, n)

    layv = jnp.asarray(layer, jnp.int32).reshape(1)
    m_p = _pad_to(m, 8)
    x2 = jnp.pad(x2, ((0, m_p - m), (0, 0)))
    nb = min(block_n, _pad_to(n, 128))
    grid = (-(-n // nb),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_p, k_dim), lambda j, lref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, nb), lambda j, lref: (lref[0], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_g, nb), lambda j, lref: (lref[0], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_p, nb), lambda j, lref: (0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_int4_kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_p, grid[0] * nb), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(layv, x2, packed, scales)
    return out[:m, :n].reshape(*lead, n)
