"""Round-5 int4 unpack attempt: plane-interleaved i32 packing (VERDICT r4 #6).

The shipped kernel (ops/int4_matmul.py) stores two nibbles per uint8 in a
split-half layout and unpacks with ONE u8->i32 widen + mask/shift/cast per
half. Measured 7.8-9.9 us at [8,1280]x[1280,5120] vs the ~4 us
selected-bytes HBM floor — the gap is VPU elementwise. Prior rejected
attempts (tools/int4_unpack_probe.py, tools/w4a8_probe.py): u8-native
shifts (Mosaic can't), dequant-in-kernel single dot, W4A8 s8xs8 dots.

This probe tests the one remaining layout idea: pack 8 nibbles per i32
word in a SPLIT-EIGHTH layout (word (c, n) bit-field [4p, 4p+4) holds
K-row c + p*K/8), so the kernel loads native i32 lanes — NO widen — and
each plane unpacks with a single shift+mask+cast. Total cast count is
identical (K*N nibbles either way); the candidate saving is the widen
(K/2*N u8->i32 lane ops) plus any layout-change cost Mosaic attaches to
sub-word loads.

Cost of the layout: quant groups must divide K/8 (vs K/2), so scale rows
can get finer, e.g. K=1280: group 80 instead of 128 (+10% scale bytes vs
+6.4%) — the probe accounts for that in its parity and byte math.

Verdict goes into results/int4_plane_probe.json and (if reject) the
ops/int4_matmul.py docstring; keep = port the layout into the kernel.

Run on the real chip: python tools/int4_plane_probe.py
"""

import functools
import json
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audax.core.runtime import setup

setup()

from audax.ops.int4_matmul import int4_matmul, quantize_int4  # noqa: E402
from audax.utils.profiling import slope_timed  # noqa: E402


# ------------------------------------------------- plane-split packing ----

def quantize_int4_planes(w, *, group: int = 128):
    """w [K, N] -> (packed i32 [K/8, N], scales f32 [G, N]).

    Word (c, n) bit-field [4p, 4p+4) stores K-row c + p*K/8 as q+8,
    q in [-7, 7] (same RTN grid and group-128 scales as quantize_int4 —
    quant groups are independent of the plane structure; a group that
    straddles a plane boundary is handled in-kernel by splitting its
    extraction into two (shift, word-range) sub-slices on sublanes)."""
    k_dim, n = w.shape
    if k_dim % 8:
        raise ValueError(f"plane packing needs K % 8 == 0, got {k_dim}")
    g = group
    while k_dim % g:
        g //= 2
    num_g = k_dim // g
    grouped = w.reshape(num_g, g, n)
    s = jnp.maximum(jnp.max(jnp.abs(grouped), axis=1) / 7.0, 1e-12)
    q = jnp.clip(jnp.round(grouped / s[:, None, :]), -7, 7)
    q = (q.reshape(k_dim, n) + 8).astype(jnp.int32)       # [K, N] in [1,15]
    kk = k_dim // 8
    packed = jnp.zeros((kk, n), jnp.int32)
    for p in range(8):
        packed = packed | (q[p * kk:(p + 1) * kk, :] << (4 * p))
    return packed, s.astype(jnp.float32), g


def _plane_kernel(x_ref, w_ref, s_ref, o_ref, *, group: int):
    """One [M, nb] block: native-i32 load, single shift+mask per plane
    sub-slice (x slices stay 128-lane-aligned; weight sub-slices are on
    sublanes, where odd offsets are cheap)."""
    x = x_ref[...]                                  # [M, K]
    w = w_ref[...]                                  # [K/8, nb] int32
    s = s_ref[...]                                  # [G, nb] f32
    m, k_dim = x.shape
    kk = w.shape[0]                                 # K/8 = plane length
    num_g = s.shape[0]
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc = jnp.zeros((m, w.shape[1]), jnp.float32)
    for gi in range(num_g):
        lo, hi = gi * group, (gi + 1) * group       # K rows of this group
        parts = []
        r = lo
        while r < hi:                               # <= 2 static sub-slices
            p = r // kk
            w0 = r % kk
            take = min(hi - r, (p + 1) * kk - r)
            parts.append(((w[w0:w0 + take, :] >> (4 * p)) & 0xF)
                         .astype(x.dtype))
            r += take
        wg = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)
        xg = x[:, lo:hi]
        xs = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        part = part - 8.0 * xs
        acc = acc + part * s[gi:gi + 1, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def plane_matmul(x, packed, scales, *, group: int, block_n: int = 1024):
    m, k_dim = x.shape
    kk, n = packed.shape
    grid = (n // block_n,)
    return pl.pallas_call(
        functools.partial(_plane_kernel, group=group),
        grid=grid,
        in_specs=[pl.BlockSpec((m, k_dim), lambda j: (0, 0)),
                  pl.BlockSpec((kk, block_n), lambda j: (0, j)),
                  pl.BlockSpec((scales.shape[0], block_n), lambda j: (0, j))],
        out_specs=pl.BlockSpec((m, block_n), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, packed, scales)


def main():
    out_path = "results/int4_plane_probe.json"
    rows = {}
    r = np.random.default_rng(0)
    m, k_dim, n = 8, 1280, 5120
    w = jnp.asarray(r.standard_normal((k_dim, n)) / np.sqrt(k_dim),
                    jnp.float32)
    x = jnp.asarray(r.standard_normal((m, k_dim)), jnp.bfloat16)

    # --- parity: same group-128 RTN grid as the shipped kernel, so the
    # two kernels must agree to bf16 dot noise ---------------------------
    pk8, s8 = quantize_int4(w)
    g8 = 128
    pkp, sp, gp = quantize_int4_planes(w)
    y_cur = int4_matmul(x, pk8, s8)
    y_pl = plane_matmul(x, pkp, sp, group=gp)
    err = float(jnp.max(jnp.abs(y_pl.astype(jnp.float32)
                                - y_cur.astype(jnp.float32))))
    scale_ref = float(jnp.max(jnp.abs(y_cur)))
    rows["parity_max_abs_err"] = err
    rows["parity_rel"] = err / scale_ref
    assert err / scale_ref < 2e-2, f"plane kernel parity broke: {err}"

    # --- bytes ---------------------------------------------------------
    rows["bytes_current"] = int(pk8.size * 1 + s8.size * 4)
    rows["bytes_plane"] = int(pkp.size * 4 + sp.size * 4)
    rows["group_current"], rows["group_plane"] = g8, gp

    # --- slope timing (pallas custom calls: safe from narrowing) -------
    f_cur = jax.jit(lambda xx: int4_matmul(xx, pk8, s8))
    f_pl = jax.jit(lambda xx: plane_matmul(xx, pkp, sp, group=gp))
    t_cur = slope_timed(f_cur, (x,))
    t_pl = slope_timed(f_pl, (x,))
    rows["us_current"] = round(1e6 * t_cur, 2)
    rows["us_plane"] = round(1e6 * t_pl, 2)
    rows["floor_us_selected_bytes"] = round(
        rows["bytes_plane"] / 819e9 * 1e6, 2)
    rows["speedup"] = round(t_cur / t_pl, 3)
    rows["verdict"] = ("keep" if t_pl < 0.85 * t_cur else "reject")
    os.makedirs("results", exist_ok=True)
    json.dump(rows, open(out_path, "w"), indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
