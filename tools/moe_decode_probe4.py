"""Probe 4: int8-expert MoE decode — does the full `astype` dequant before
lax.ragged_dot materialize an all-expert bf16 copy (making quantized decode
SLOWER than float), and does a slice-scan with per-slot dequant recover the
int8 bandwidth win (half the selected bytes)?

Variants (slope-timed):
  ragged_bf16 — probe-3 baseline
  ragged_int8 — kernel_q.astype(bf16) -> ragged_dot (the current
                _moe_block int8 path shape)
  slice_int8  — scan over selected slots, dynamic_slice the int8 expert,
                dequant in-register, matmul (traffic = selected int8 bytes)
"""

import jax
import jax.numpy as jnp
import numpy as np

from audax.core.runtime import setup
from audax.utils.profiling import slope_timed

setup()

D, E, K, FE = 2048, 128, 8, 768
DTYPE = jnp.bfloat16


def init_weights(key):
    ks = jax.random.split(key, 3)
    s = D ** -0.5
    w = {
        "gate": jax.random.normal(ks[0], (E, D, FE), DTYPE) * s,
        "up": jax.random.normal(ks[1], (E, D, FE), DTYPE) * s,
        "down": jax.random.normal(ks[2], (E, FE, D), DTYPE) * s,
    }
    q = {}
    for k, v in w.items():
        amax = jnp.abs(v.astype(jnp.float32)).max(axis=-2, keepdims=True)
        sc = amax / 127.0
        q[k] = {"q": jnp.round(v.astype(jnp.float32) / sc).astype(jnp.int8),
                "scale": sc[..., 0, :].astype(jnp.float32)}
    return w, q


def ragged_bf16(h, w, widx, wgt):
    n = h.shape[0]
    fidx = widx.reshape(-1)
    order = jnp.argsort(fidx)
    xr = h[order // K]
    gs = jnp.bincount(fidx, length=E)
    g = jax.lax.ragged_dot(xr, w["gate"], gs)
    u = jax.lax.ragged_dot(xr, w["up"], gs)
    o = jax.lax.ragged_dot(jax.nn.silu(g) * u, w["down"], gs)
    o = o[jnp.argsort(order)].reshape(n, K, D)
    return jnp.einsum("nkd,nk->nd", o, wgt)


def ragged_int8(h, q, widx, wgt):
    n = h.shape[0]
    fidx = widx.reshape(-1)
    order = jnp.argsort(fidx)
    xr = h[order // K]
    gs = jnp.bincount(fidx, length=E)
    row_e = fidx[order]

    def mm(name, x):
        p = q[name]
        y = jax.lax.ragged_dot(x, p["q"].astype(x.dtype), gs)
        return y * p["scale"][row_e].astype(y.dtype)

    g = mm("gate", xr)
    u = mm("up", xr)
    o = mm("down", jax.nn.silu(g) * u)
    o = o[jnp.argsort(order)].reshape(n, K, D)
    return jnp.einsum("nkd,nk->nd", o, wgt)


def slice_int8(h, q, widx, wgt):
    n = h.shape[0]
    fidx = widx.reshape(-1)
    tok = jnp.arange(n * K) // K
    ww = wgt.reshape(-1)

    def one(name, e, x, kdim, ndim):
        p = q[name]
        m = jax.lax.dynamic_slice(p["q"], (e, 0, 0), (1, kdim, ndim))[0]
        s = jax.lax.dynamic_slice(p["scale"], (e, 0), (1, ndim))[0]
        return (x @ m.astype(x.dtype)) * s.astype(x.dtype)

    def body(acc, sl):
        e, t, wi = sl
        x = h[t]
        g = jax.nn.silu(one("gate", e, x, D, FE)) * one("up", e, x, D, FE)
        acc = acc.at[t].add(one("down", e, g, FE, D) * wi.astype(acc.dtype))
        return acc, None

    acc = jnp.zeros((n, D), h.dtype)
    acc, _ = jax.lax.scan(body, acc, (fidx, tok, ww))
    return acc


def main():
    w, q = jax.jit(init_weights)(jax.random.key(0))
    for n in (1, 8):
        h = jax.random.normal(jax.random.key(1), (n, D), DTYPE)
        widx = jax.random.randint(jax.random.key(2), (n, K), 0, E)
        wgt = jax.nn.softmax(
            jax.random.normal(jax.random.key(3), (n, K), jnp.float32))
        sel8_ms = n * K * 3 * D * FE * 1 / 810e9 * 1e3
        line = [f"n={n:3d} floor(sel,int8)={sel8_ms:6.3f}ms"]
        for name, fn, ww in (("ragged_bf16", ragged_bf16, w),
                             ("ragged_int8", ragged_int8, q),
                             ("slice_int8", slice_int8, q)):
            dt = slope_timed(fn, (h, ww, widx, wgt), iters=(50, 250),
                             repeats=4)
            line.append(f"{name}={dt*1e3:7.3f}ms")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
