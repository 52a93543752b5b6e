"""Probe: W4A8 variant of the int4 decode matmul.

Hypothesis (ROADMAP rounds-3+ #2): the int4 weight-only pallas kernel is
VPU-bound on nibble unpack + f32/bf16 group dots (186 GB/s packed), while
the int8 einsum streams at ~600 GB/s. If activations are dynamically
quantized to int8 per row, the group dots become s8 x s8 -> s32 MXU ops
and the unpacked nibbles only need a cheap cast to int8 — the kernel
should approach HBM-bound on the packed bytes, i.e. ~2x fewer bytes than
int8 at comparable streaming efficiency.

Run on the real chip: python tools/w4a8_probe.py
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


def w4a8_matmul(x, packed, scales, *, block_n=1024, interpret=False):
    stacked = packed.ndim == 3
    if not stacked:
        packed = packed[None]
        scales = scales[None]
    kh, n = packed.shape[-2:]
    k_dim = 2 * kh
    num_g = scales.shape[-2]
    group = k_dim // num_g
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k_dim).astype(jnp.float32)
    # dynamic per-row symmetric int8 activation quant
    xs = jnp.maximum(jnp.max(jnp.abs(x2), axis=-1, keepdims=True), 1e-12)
    xs = xs / 127.0
    xq = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)
    m_p = max(8, -(-m // 8) * 8)
    xq = jnp.pad(xq, ((0, m_p - m), (0, 0)))
    xs_p = jnp.pad(xs, ((0, m_p - m), (0, 0)))
    nb = min(block_n, -(-n // 128) * 128)
    grid = (-(-n // nb),)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_p, k_dim), lambda j, lref: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_p, 1), lambda j, lref: (0, 0),
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
        functools.partial(_w4a8_kernel_zp, group=group),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_p, grid[0] * nb), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(layv, xq, xs_p, packed, scales)
    return out[:m, :n].reshape(*lead, n)


def _w4a8_kernel_zp(l_ref, xq_ref, xs_ref, w_ref, s_ref, o_ref, *,
                    group: int):
    """int8 activations x int4-unpacked-to-int8 weights; the -8 nibble
    zero point is subtracted during the unpack itself (int8 range is
    wide enough), so no separate correction term is needed."""
    xq = xq_ref[...]
    xs = xs_ref[...]
    w = w_ref[0]
    s = s_ref[0]
    m = xq.shape[0]
    num_g = s.shape[0]
    wi = w.astype(jnp.int32)
    lo = ((wi & 0xF) - 8).astype(jnp.int8)
    hi = ((wi >> 4) - 8).astype(jnp.int8)
    halves = (lo, hi)
    acc = jnp.zeros((m, w.shape[1]), jnp.float32)
    for gi in range(num_g):
        half = halves[0] if gi < num_g // 2 else halves[1]
        base = (gi if gi < num_g // 2 else gi - num_g // 2) * group
        wg = half[base:base + group, :]
        xqg = xq[:, gi * group:(gi + 1) * group]
        part = jax.lax.dot_general(
            xqg, wg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + part.astype(jnp.float32) * s[gi:gi + 1, :]
    o_ref[...] = (acc * xs).astype(o_ref.dtype)


from audax.utils.profiling import slope_timed as loop_timed  # noqa: E402


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    m, k_dim, n = 8, 1280, 5120
    w = jnp.asarray(rng.standard_normal((k_dim, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((m, k_dim)).astype(np.float32))
    xbf = x.astype(jnp.bfloat16)
    packed, sc = quantize_int4(w)
    wbf = w.astype(jnp.bfloat16)
    wq8 = jnp.clip(jnp.round(w / (jnp.max(jnp.abs(w), 0) / 127)), -127,
                   127).astype(jnp.int8)
    s8 = (jnp.max(jnp.abs(w), 0) / 127)

    # correctness: w4a8 vs float-on-dequant reference
    ref = np.asarray(x @ dequantize_int4(packed, sc))
    got = np.asarray(w4a8_matmul(xbf, packed, sc))
    nrmse = np.sqrt(((got - ref) ** 2).mean()) / ref.std()
    print(f"w4a8 vs int4-dequant: NRMSE {nrmse:.4f} "
          f"(activation-quant noise, expected <1%)", flush=True)

    pk = k_dim * n * 0.5 / 2**30
    rows = [
        ("w4a16 (current)", lambda x_, p_, s_: int4_matmul(x_, p_, s_),
         (xbf, packed, sc), pk),
        ("w4a8  (probe)  ", lambda x_, p_, s_: w4a8_matmul(x_, p_, s_),
         (xbf, packed, sc), pk),
        ("int8 einsum    ", lambda x_, q_, s_: (
            jnp.einsum("mk,kn->mn", x_, q_.astype(x_.dtype)) * s_),
         (xbf, wq8, s8), k_dim * n / 2**30),
        ("bf16 einsum    ", lambda x_, w_: jax.lax.dot_general(
            x_, w_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16),
         (xbf, wbf), k_dim * n * 2 / 2**30),
    ]
    for name, fn, args, byts in rows:
        dt = loop_timed(fn, args)
        print(f"{m}x{k_dim}x{n} {name}: {dt*1e6:7.2f} us  "
              f"{byts/dt:6.1f} GB/s", flush=True)
