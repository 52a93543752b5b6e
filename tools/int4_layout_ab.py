"""EXPERIMENT (not wired into the package): int4 matmul with int32-word
packing (8 nibbles/word, split-eighth layout) vs the shipping uint8
split-half kernel (audax/ops/int4_matmul.py).

Hypothesis: the shipping kernel runs at ~186 GB/s packed vs ~620 GB/s for
the int8/bf16 einsums because the uint8->int32 widen forces Mosaic
sub-word relayouts; unpacking from native int32 lanes avoids them.
Numerics verified exact in interpret mode (``check``); the ``bench`` A/B
needs the real chip (run tools/int4_layout_ab_bench.py when the tunnel is
up — it was down when this experiment was staged). If v2 wins, fold the
packing into ops/int4_matmul.py behind the existing quantize/dequant API.

Usage: python tools/int4_layout_ab.py check   (CPU numerics)
       python tools/int4_layout_ab_bench.py   (TPU A/B timing)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- pack v2 --
def quantize_int4_v2(w, *, group=None):
    """w [K, N] -> (packed int32 [K//8, N], scales f32 [G, N]).

    Split-eighth: nibble slot i of word c holds K-row i*(K//8) + c, stored
    as q+8 in [1,15]. Groups never straddle slab boundaries: group divides
    K//8.
    """
    k_dim, n = w.shape
    assert k_dim % 8 == 0, k_dim
    slab = k_dim // 8
    g = min(group or 128, slab)
    while slab % g:
        g //= 2
    num_g = k_dim // g
    grouped = w.reshape(num_g, g, n)
    s = jnp.maximum(jnp.max(jnp.abs(grouped), axis=-2) / 7.0, 1e-12)
    q = jnp.clip(jnp.round(grouped / s[:, None, :]), -7, 7)
    q = (q.reshape(k_dim, n) + 8).astype(jnp.int32)       # [K, N] in [1,15]
    word = jnp.zeros((slab, n), jnp.int32)
    for i in range(8):
        word = word | (q[i * slab:(i + 1) * slab] << (4 * i))
    return word, s.astype(jnp.float32)


def dequantize_int4_v2(word, scales):
    slab, n = word.shape
    k_dim = slab * 8
    num_g = scales.shape[0]
    g = k_dim // num_g
    outs = []
    for i in range(8):
        outs.append(((word >> (4 * i)) & 0xF) - 8)
    q = jnp.concatenate(outs, axis=0).astype(jnp.float32)   # [K, N]
    s = jnp.repeat(scales, g, axis=0)
    return q * s


# ---------------------------------------------------------------- kernel --
def _int4v2_kernel(x_ref, w_ref, s_ref, o_ref, *, group):
    x = x_ref[...]                   # [M, K]
    w = w_ref[...]                   # [slab, nb] int32
    s = s_ref[...]                   # [G, nb] f32
    m, k_dim = x.shape
    slab = w.shape[0]
    num_g = s.shape[0]
    gps = slab // group              # groups per slab
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    xs = jnp.sum(x.astype(jnp.float32).reshape(m, num_g, group), axis=-1)
    acc = jnp.zeros((m, w.shape[1]), jnp.float32)
    for i in range(8):
        nib = ((w >> (4 * i)) & 0xF).astype(x.dtype)   # [slab, nb]
        for j in range(gps):
            gi = i * gps + j
            wg = nib[j * group:(j + 1) * group, :]
            xg = x[:, gi * group:(gi + 1) * group]
            part = jax.lax.dot_general(
                xg, wg, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            acc = acc + (part - 8.0 * xs[:, gi:gi + 1]) * s[gi:gi + 1, :]
    o_ref[...] = acc.astype(o_ref.dtype)


def _pad_to(n, m):
    return -(-n // m) * m


def int4_matmul_v2(x, word, scales, *, block_n=1024, interpret=False):
    slab, n = word.shape
    k_dim = slab * 8
    num_g = scales.shape[0]
    group = k_dim // num_g
    lead = x.shape[:-1]
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k_dim)
    m_p = _pad_to(m, 8)
    x2 = jnp.pad(x2, ((0, m_p - m), (0, 0)))
    nb = min(block_n, _pad_to(n, 128))
    grid = (-(-n // nb),)
    out = pl.pallas_call(
        functools.partial(_int4v2_kernel, group=group),
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_p, k_dim), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((slab, nb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_g, nb), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_p, nb), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_p, grid[0] * nb), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, word, scales)
    return out[:m, :n].reshape(*lead, n)


def check():
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(0)
    k_dim, n, m = 1280, 1536, 8
    w = jnp.asarray(rng.standard_normal((k_dim, n)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((m, k_dim)).astype(np.float32))
    word, s = quantize_int4_v2(w)
    wd = dequantize_int4_v2(word, s)
    ref = x @ wd
    out = int4_matmul_v2(x, word, s, interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)))
    rel = err / float(jnp.max(jnp.abs(ref)))
    print("interpret max abs err:", err, "rel:", rel)
    assert rel < 2e-5, rel
    # quant quality vs f32 weights comparable to v1 group scheme
    qerr = float(jnp.max(jnp.abs(wd - w)))
    print("quant max abs err vs f32 weights:", qerr)
    print("CHECK OK")


def bench():
    from audax.core.runtime import setup
    setup()
    from audax.ops.int4_matmul import int4_matmul, quantize_int4
    rng = np.random.default_rng(0)
    # large-v3-ish decode shapes
    shapes = [(8, 1280, 5120), (8, 5120, 1280), (8, 1280, 1280)]
    for m, k_dim, n in shapes:
        w = jnp.asarray(rng.standard_normal((k_dim, n)).astype(np.float32))
        xb = jnp.asarray(rng.standard_normal((m, k_dim)).astype(np.float32))
        xbf = xb.astype(jnp.bfloat16)
        p1, s1 = quantize_int4(w)
        p2, s2 = quantize_int4_v2(w)
        wbf = w.astype(jnp.bfloat16)

        def timed(fn, *args, iters=(40, 200)):
            f = jax.jit(fn)
            r = f(*args)

            @jax.jit
            def chk(r):
                return jnp.sum(r.astype(jnp.float32) * 0 + r.ravel()[0])
            np.asarray(chk(r))
            ts = []
            for it in iters:
                t0 = time.perf_counter()
                for _ in range(it):
                    r = f(*args)
                np.asarray(chk(r))
                ts.append(time.perf_counter() - t0)
            return (ts[1] - ts[0]) / (iters[1] - iters[0])

            # slope cancels dispatch overhead

        def loop_timed(fn, *args, iters=(40, 200)):
            # in-loop slope timing: lax.fori_loop chains iterations
            def make(nit):
                @jax.jit
                def run(*a):
                    def body(i, acc):
                        r = fn(*a)
                        return acc + r.astype(jnp.float32).ravel()[0]
                    return jax.lax.fori_loop(0, nit, body, jnp.float32(0))
                return run
            f1, f2 = make(iters[0]), make(iters[1])
            np.asarray(f1(*args)); np.asarray(f2(*args))
            best = []
            for f, nit in ((f1, iters[0]), (f2, iters[1])):
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    np.asarray(f(*args))
                    ts.append(time.perf_counter() - t0)
                best.append(min(ts))
            return (best[1] - best[0]) / (iters[1] - iters[0])

        pkb = k_dim * n * 0.5 / 2**30
        for name, fn, args in [
            ("v1-u8 ", lambda x_, p_, s_: int4_matmul(x_, p_, s_), (xbf, p1, s1)),
            ("v2-i32", lambda x_, p_, s_: int4_matmul_v2(x_, p_, s_), (xbf, p2, s2)),
            ("bf16  ", lambda x_, w_: jax.lax.dot_general(
                x_, w_, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16),
             (xbf, wbf)),
        ]:
            dt = loop_timed(fn, *args)
            bw = (pkb if name.startswith(("v1", "v2")) else k_dim * n * 2 / 2**30) / dt
            print(f"{m}x{k_dim}x{n} {name}: {dt*1e6:7.2f} us  "
                  f"{bw:6.1f} GB/s")


if __name__ == "__main__":
    (check if sys.argv[1:] == ["check"] else bench)()
