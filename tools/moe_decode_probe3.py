"""Probe 3: MoE decode FFN latency with SLOPE timing (device-side fori_loop,
dispatch/fetch overhead cancelled — probe 1/2's host loop measured ~0.8 ms of
tunnel dispatch, not the kernel). Compares ragged / dense / slice-scan at
decode batch sizes against the selected-bytes HBM floor.
"""

import time

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
    return {
        "gate": jax.random.normal(ks[0], (E, D, FE), DTYPE) * s,
        "up": jax.random.normal(ks[1], (E, D, FE), DTYPE) * s,
        "down": jax.random.normal(ks[2], (E, FE, D), DTYPE) * s,
    }


def ragged_impl(h, w, widx, wgt):
    n = h.shape[0]
    fidx = widx.reshape(-1)
    order = jnp.argsort(fidx)
    tok = order // K
    xr = h[tok]
    gs = jnp.bincount(fidx, length=E)
    g = jax.lax.ragged_dot(xr, w["gate"], gs)
    u = jax.lax.ragged_dot(xr, w["up"], gs)
    o = jax.lax.ragged_dot(jax.nn.silu(g) * u, w["down"], gs)
    o = o[jnp.argsort(order)].reshape(n, K, D)
    return jnp.einsum("nkd,nk->nd", o, wgt)


def dense_impl(h, w, widx, wgt):
    n = h.shape[0]
    comb = jnp.zeros((n, E), wgt.dtype)
    comb = comb.at[jnp.arange(n)[:, None], widx].add(wgt)
    g = jnp.einsum("nd,edf->enf", h, w["gate"])
    u = jnp.einsum("nd,edf->enf", h, w["up"])
    o = jnp.einsum("enf,efd->end", jax.nn.silu(g) * u, w["down"])
    return jnp.einsum("end,ne->nd", o, comb)


def slice_impl(h, w, widx, wgt):
    n = h.shape[0]
    fidx = widx.reshape(-1)
    tok = jnp.arange(n * K) // K
    ww = wgt.reshape(-1)

    def body(acc, sl):
        e, t, wi = sl
        ge = jax.lax.dynamic_slice(w["gate"], (e, 0, 0), (1, D, FE))[0]
        ue = jax.lax.dynamic_slice(w["up"], (e, 0, 0), (1, D, FE))[0]
        de = jax.lax.dynamic_slice(w["down"], (e, 0, 0), (1, FE, D))[0]
        x = h[t]
        g = jax.nn.silu(x @ ge) * (x @ ue)
        acc = acc.at[t].add((g @ de) * wi.astype(acc.dtype))
        return acc, None

    acc = jnp.zeros((n, D), h.dtype)
    acc, _ = jax.lax.scan(body, acc, (fidx, tok, ww))
    return acc


def main():
    w = jax.jit(init_weights)(jax.random.key(0))
    for n in (1, 8):
        h = jax.random.normal(jax.random.key(1), (n, D), DTYPE)
        widx = jax.random.randint(jax.random.key(2), (n, K), 0, E)
        wgt = jax.nn.softmax(
            jax.random.normal(jax.random.key(3), (n, K), jnp.float32))
        sel_ms = n * K * 3 * D * FE * 2 / 810e9 * 1e3
        all_ms = E * 3 * D * FE * 2 / 810e9 * 1e3
        line = [f"n={n:3d} floor(sel)={sel_ms:6.3f}ms floor(all)={all_ms:6.3f}ms"]
        for name, fn in (("ragged", ragged_impl), ("dense", dense_impl),
                         ("slice", slice_impl)):
            dt = slope_timed(fn, (h, w, widx, wgt), iters=(50, 250),
                             repeats=4)
            line.append(f"{name}={dt*1e3:7.3f}ms")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
