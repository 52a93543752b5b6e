"""Flash-attention block-size sweep on the real chip (round-4 MFU work).

The step breakdown's micro stage measured the non-causal flash FORWARD at
~33 TFLOP/s on the whisper-small encoder shape [8,12,1500,64] — half the
rate of the surrounding matmuls. Suspect: the v5e-tuned non-causal
default keeps the WHOLE padded q tile resident (block_q 2048 -> one
1504-row program per (b,h)) so the kernel's grid has only B*H*3
programs and each inner dot is a shallow K=64 contraction. This sweeps
(block_q, block_k) for the forward AND the backward (via jax.grad) at
the encoder shape, slope-timed.

Writes results/attn_block_sweep.json.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from audax.core.runtime import setup
from audax.ops.attention import flash_attention
from audax.utils.profiling import slope_timed


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--seq", type=int, default=1500)
    ap.add_argument("--hd", type=int, default=64)
    ap.add_argument("--out", default="results/attn_block_sweep.json")
    args = ap.parse_args()
    setup()

    r = np.random.default_rng(0)
    shp = (args.b, args.heads, args.seq, args.hd)
    q = jnp.asarray(r.standard_normal(shp), jnp.bfloat16)
    k = jnp.asarray(r.standard_normal(shp), jnp.bfloat16)
    v = jnp.asarray(r.standard_normal(shp), jnp.bfloat16)
    flops = 4.0 * args.b * args.seq ** 2 * args.hd * args.heads \
        / args.heads  # 4*B*S^2*d with d = heads*hd
    flops = 4.0 * args.b * args.seq ** 2 * (args.heads * args.hd)

    grid = [(None, None),            # current defaults (2048/512 padded)
            (1024, 512), (512, 512), (512, 1024), (256, 512),
            (256, 1024), (128, 512), (512, 256)]
    rows = []
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    for bq, bk in grid:
        def fwd(q, k, v, _bq=bq, _bk=bk):
            return flash_attention(q, k, v, block_q=_bq, block_k=_bk)

        def bwd(q, k, v, _bq=bq, _bk=bk):
            return jax.grad(lambda a, b_, c: flash_attention(
                a, b_, c, block_q=_bq, block_k=_bk)
                .astype(jnp.float32).sum())(q, k, v)

        row = {"block_q": bq, "block_k": bk}
        try:
            s = slope_timed(fwd, (q, k, v), iters=(20, 120), repeats=3)
            row["fwd_us"] = round(1e6 * s, 1)
            row["fwd_tflops"] = round(flops / s / 1e12, 1)
            sb = slope_timed(bwd, (q, k, v), iters=(10, 60), repeats=3)
            row["bwd_us"] = round(1e6 * sb, 1)
            row["bwd_tflops"] = round(2.5 * flops / sb / 1e12, 1)
        except Exception as e:
            row["error"] = str(e)[:160]
        rows.append(row)
        print(json.dumps(row), flush=True)
        json.dump({"shape": list(shp), "rows": rows},
                  open(args.out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
