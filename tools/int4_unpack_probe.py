"""Probe: can the int4 kernel's VPU nibble-unpack cost be cut?

Measured (tools/w4a8_probe.py, loop-carried slope timing): w4a16 kernel
9.9 us = 331 GB/s packed at 8x1280x5120 vs ~4 us HBM speed-of-light —
~6 us of VPU unpack + small-dot overhead. W4A8 (int8 MXU dots) gave no
win, so the dots aren't it. Variants here attack the unpack itself:

  v0  current kernel (int32 widen, then mask/shift, per-group dots)
  v1  uint8-native mask/shift (no explicit widen; Mosaic may pack 4/lane)
  v2  dequant-in-kernel: unpack + scale to activation dtype, ONE dot per
      block over full K (no per-group loop; scale folded into weights)
  v3  v1 + block_n sweep

Run on the real chip: python tools/int4_unpack_probe.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audax.core.runtime import setup
setup()

from audax.ops.int4_matmul import quantize_int4, dequantize_int4, int4_matmul


def _kernel_v1(l_ref, x_ref, w_ref, s_ref, o_ref, *, group: int):
    """uint8-native mask/shift; rest identical to the current kernel."""
    x = x_ref[...]
    w = w_ref[0]
    s = s_ref[0]
    m, k_dim = x.shape
    num_g = s.shape[0]
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    wi = w.astype(jnp.int32)
    halves = ((wi & 0xF).astype(x.dtype), (wi >> 4).astype(x.dtype))
    xs = jnp.sum(x.astype(jnp.float32).reshape(m, num_g, group), axis=-1)
    acc = jnp.zeros((m, w.shape[1]), jnp.float32)
    for gi in range(num_g):
        half = halves[0] if gi < num_g // 2 else halves[1]
        base = (gi if gi < num_g // 2 else gi - num_g // 2) * group
        wg = half[base:base + group, :]
        xg = x[:, gi * group:(gi + 1) * group]
        part = jax.lax.dot_general(
            xg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        part = part - 8.0 * xs[:, gi:gi + 1]
        acc = acc + part * s[gi:gi + 1, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_v2(l_ref, x_ref, w_ref, s_ref, o_ref, *, group: int):
    """Dequant-in-kernel to one [K, nb] weight tile, single dot.

    Scale rows are expanded with jnp.repeat (G -> K on sublanes); the -8
    zero point is subtracted in the activation dtype before scaling."""
    x = x_ref[...]
    w = w_ref[0]
    s = s_ref[0]
    num_g = s.shape[0]
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    wi = w.astype(jnp.int32)
    lo = (wi & 0xF).astype(x.dtype)
    hi = (wi >> 4).astype(x.dtype)
    q = jnp.concatenate([lo, hi], axis=0) - jnp.asarray(8.0, x.dtype)
    sk = jnp.repeat(s.astype(x.dtype), group, axis=0)       # [K, nb]
    wd = q * sk
    o_ref[...] = jax.lax.dot_general(
        x, wd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec
    ).astype(o_ref.dtype)


def run_variant(kernel, x, packed, scales, *, block_n=1024):
    kh, n = packed.shape[-2:]
    k_dim = 2 * kh
    num_g = scales.shape[-2]
    group = k_dim // num_g
    m = x.shape[0]
    m_p = max(8, -(-m // 8) * 8)
    x2 = jnp.pad(x, ((0, m_p - m), (0, 0)))
    nb = min(block_n, -(-n // 128) * 128)
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
    layv = jnp.zeros((1,), jnp.int32)
    out = pl.pallas_call(
        functools.partial(kernel, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_p, grid[0] * nb), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(layv, x2, packed[None], scales[None])
    return out[:m, :n]


from audax.utils.profiling import slope_timed as loop_timed  # noqa: E402


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    m, k_dim, n = 8, 1280, 5120
    w = jnp.asarray(rng.standard_normal((k_dim, n)).astype(np.float32))
    xbf = jnp.asarray(rng.standard_normal((m, k_dim))
                      .astype(np.float32)).astype(jnp.bfloat16)
    packed, sc = quantize_int4(w)
    ref = np.asarray(xbf.astype(jnp.float32)
                     @ dequantize_int4(packed, sc)).astype(np.float32)

    def check(name, out):
        nrmse = np.sqrt(((np.asarray(out, np.float32) - ref) ** 2).mean()
                        ) / ref.std()
        print(f"  {name} NRMSE vs exact dequant: {nrmse:.5f}", flush=True)

    check("v1", run_variant(_kernel_v1, xbf, packed, sc))
    check("v2", run_variant(_kernel_v2, xbf, packed, sc))

    pk = k_dim * n * 0.5 / 2**30
    rows = [
        ("v0 current      ", lambda x_, p_, s_: int4_matmul(x_, p_, s_),
         1024),
        ("v1 u8-native    ", lambda x_, p_, s_: run_variant(
            _kernel_v1, x_, p_, s_), 1024),
        ("v2 one-dot      ", lambda x_, p_, s_: run_variant(
            _kernel_v2, x_, p_, s_), 1024),
        ("v1 block_n=2560 ", lambda x_, p_, s_: run_variant(
            _kernel_v1, x_, p_, s_, block_n=2560), 2560),
        ("v2 block_n=2560 ", lambda x_, p_, s_: run_variant(
            _kernel_v2, x_, p_, s_, block_n=2560), 2560),
        ("v2 block_n=512  ", lambda x_, p_, s_: run_variant(
            _kernel_v2, x_, p_, s_, block_n=512), 512),
    ]
    for name, fn, _bn in rows:
        dt = loop_timed(fn, (xbf, packed, sc))
        print(f"{m}x{k_dim}x{n} {name}: {dt*1e6:7.2f} us  "
              f"{pk/dt:6.1f} GB/s packed", flush=True)
