"""Probe: MoE FFN cost at DECODE batch sizes on the real chip.

Question: both _moe_block impls (models/causal_lm.py) touch every expert's
weights — ragged via lax.ragged_dot over all E groups, dense via the full
[E, ...] einsum. At decode (n = B tokens, n*k << E selected slots) the
speed-of-light is reading only the selected experts' bytes, i.e. an
(E / (n*k))-ish win for single-stream decode. Measure:

  1. ragged impl (current default)    — per-step latency
  2. dense impl                       — per-step latency
  3. gather impl: w[idx] -> [n,k,d,f] gathered operand + small einsums
     (materializes a copy of the selected experts, so traffic ~2-3x the
     selected bytes, still << all-expert bytes when n*k << E)

Shape: Qwen3-30B-A3B-like layer (d=2048, E=128, k=8, fe=768), bf16.
HBM floor: selected 8 experts * 3 mats * 2048*768*2B = 75 MB; all experts
= 1.2 GB. v5e ~810 GB/s -> floors ~0.09 ms vs ~1.5 ms per layer-step.
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


def dense_impl(w, h, widx, wgt):
    n = h.shape[0]
    comb = jnp.zeros((n, E), wgt.dtype)
    comb = comb.at[jnp.arange(n)[:, None], widx].add(wgt)
    g = jnp.einsum("nd,edf->enf", h, w["gate"])
    u = jnp.einsum("nd,edf->enf", h, w["up"])
    o = jnp.einsum("enf,efd->end", jax.nn.silu(g) * u, w["down"])
    return jnp.einsum("end,ne->nd", o, comb)


def gather_impl(w, h, widx, wgt):
    gk = w["gate"][widx]                     # [n, k, d, fe]
    uk = w["up"][widx]
    dk = w["down"][widx]                     # [n, k, fe, d]
    g = jnp.einsum("nd,nkdf->nkf", h, gk)
    u = jnp.einsum("nd,nkdf->nkf", h, uk)
    o = jnp.einsum("nkf,nkfd->nkd", jax.nn.silu(g) * u, dk)
    return jnp.einsum("nkd,nk->nd", o, wgt)


@jax.jit
def checksum(x):
    return jnp.sum(x.astype(jnp.float32))


def bench(fn, w, h, widx, wgt, iters=50):
    f = jax.jit(fn)
    out = f(w, h, widx, wgt)
    np.asarray(checksum(out))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(w, h, widx, wgt)
        np.asarray(checksum(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, np.asarray(out, np.float32)


def main():
    key = jax.random.key(0)
    w = jax.jit(init_weights)(key)
    for n in (1, 8, 64):
        h = jax.random.normal(jax.random.key(1), (n, D), DTYPE)
        widx = jax.random.randint(jax.random.key(2), (n, K), 0, E)
        wgt = jax.nn.softmax(
            jax.random.normal(jax.random.key(3), (n, K), jnp.float32))
        rows = {}
        outs = {}
        for name, fn in (("ragged", ragged_impl), ("dense", dense_impl),
                         ("gather", gather_impl)):
            dt, out = bench(fn, w, h, widx, wgt)
            rows[name] = dt
            outs[name] = out
        err = np.abs(outs["gather"] - outs["ragged"]).max()
        sel_mb = n * K * 3 * D * FE * 2 / 1e6
        all_mb = E * 3 * D * FE * 2 / 1e6
        print(f"n={n:3d}  " + "  ".join(
            f"{k}={v*1e3:7.3f}ms" for k, v in rows.items())
            + f"  |gather-ragged|max={err:.3e}"
            + f"  selected={sel_mb:.0f}MB all={all_mb:.0f}MB")


if __name__ == "__main__":
    main()
