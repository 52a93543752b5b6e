"""Probe 2: selected-expert MoE FFN via scan + dynamic_slice, vs ragged.

If XLA fuses the dynamic-slice into the dot operand, per-step traffic is
exactly the selected experts' bytes (75 MB at n=1,k=8 vs 1.2 GB all-expert)
-> ~0.1 ms floor. Also probe an int8-weight variant (half the bytes) and a
k-batched slice (slice k experts per token in one scan step).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from audax.core.runtime import setup

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


def ragged_impl(w, h, widx, wgt):
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


def slice_impl(w, h, widx, wgt):
    """scan over the n*k selected slots; dynamic_slice one expert's mats."""
    n = h.shape[0]
    fidx = widx.reshape(-1)                    # [n*k]
    tok = jnp.arange(n * K) // K
    ww = wgt.reshape(-1)

    def body(acc, sl):
        e, t, wi = sl
        ge = jax.lax.dynamic_slice(w["gate"], (e, 0, 0), (1, D, FE))[0]
        ue = jax.lax.dynamic_slice(w["up"], (e, 0, 0), (1, D, FE))[0]
        de = jax.lax.dynamic_slice(w["down"], (e, 0, 0), (1, FE, D))[0]
        x = h[t]                               # [d]
        g = jax.nn.silu(x @ ge) * (x @ ue)
        acc = acc.at[t].add((g @ de) * wi.astype(acc.dtype))
        return acc, None

    acc = jnp.zeros((n, D), h.dtype)
    acc, _ = jax.lax.scan(body, acc, (fidx, tok, ww))
    return acc


@jax.jit
def checksum(x):
    return jnp.sum(x.astype(jnp.float32))


def bench(fn, *args, iters=50):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(checksum(out))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(*args)
        np.asarray(checksum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, np.asarray(out, np.float32)


def main():
    w = jax.jit(init_weights)(jax.random.key(0))
    for n in (1, 8):
        h = jax.random.normal(jax.random.key(1), (n, D), DTYPE)
        widx = jax.random.randint(jax.random.key(2), (n, K), 0, E)
        wgt = jax.nn.softmax(
            jax.random.normal(jax.random.key(3), (n, K), jnp.float32))
        t_r, o_r = bench(ragged_impl, w, h, widx, wgt)
        t_s, o_s = bench(slice_impl, w, h, widx, wgt)
        err = np.abs(o_s - o_r).max()
        print(f"n={n:3d}  ragged={t_r*1e3:7.3f}ms  slice={t_s*1e3:7.3f}ms"
              f"  |diff|max={err:.3e}")


if __name__ == "__main__":
    main()
