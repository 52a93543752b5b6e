"""Single-chip training-MFU study (VERDICT r3 next-round item #1).

Measures, in ONE session on the real chip:
  1. a tenancy ROOFLINE: slope-timed large bf16 matmul — what the
     multi-tenant tunnel chip actually delivers right now (the v5e paper
     peak is 197 TFLOP/s but observed deliverable swings ~4-10x with
     tenancy, CLAUDE.md);
  2. a grid of fine-tune train-step configs (whisper-small / medium,
     full-param / LoRA, bf16 (+one f32 anchor), remat full/dots/none,
     batch swept toward saturation), each reporting achieved TFLOP/s,
     % of v5e peak AND % of the same-session roofline, examples/s, and
     XLA's planned peak HBM (memory_analysis; device.memory_stats() is
     None over the axon tunnel, so planned + does-it-execute is the
     measurable pair).

Timing follows bench-train: AOT-compile once (cost_analysis on the same
executable that runs), N steps between 4-byte checksum fetches.
Results append incrementally to results/mfu_study.json (crash-safe).

Reference scale anchor: AB/fineTune.py:162-183 fine-tunes whisper-SMALL
(batch 8, accum 4); the reference never published throughput/MFU at all.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from audax.core.config import FineTuneConfig, WhisperConfig
from audax.core.runtime import setup
from audax.train.seq2seq import (collate_seq2seq, init_finetune,
                                 make_finetune_step)
from audax.utils.profiling import V5E_PEAK_FLOPS

SIZES = {"tiny": WhisperConfig.tiny, "base": WhisperConfig.base,
         "small": WhisperConfig.small, "medium": WhisperConfig.medium}


def roofline_tflops(n: int = 8192, iters=(20, 120), repeats: int = 3
                    ) -> float:
    """In-session deliverable MXU rate: slope-timed CHAINED bf16 matmul
    (x <- x @ w), best-of-``repeats``.

    The chain matters: ``slope_timed`` reads only element [0] of the op's
    result, and for a plain ``a @ b`` XLA dead-code-narrows the whole
    matmul to one row x column dot (a first attempt measured 176 PFLOP/s
    — 900x the hardware peak). Feeding each full product into the next
    iteration makes every FLOP load-bearing. ``w`` is scaled by
    1/sqrt(n) so the carry stays finite in bf16 (overflow wouldn't slow
    the MXU, but finite values keep the checksum meaningful). Two loop
    lengths cancel dispatch + fetch overhead (~0.5-1 s over the tunnel).
    """
    r = np.random.default_rng(0)
    w = jnp.asarray(r.standard_normal((n, n)) / np.sqrt(n), jnp.bfloat16)
    x0 = jnp.asarray(r.standard_normal((n, n)), jnp.bfloat16)

    def make(nit):
        @jax.jit
        def run(x, w):
            return jax.lax.fori_loop(
                0, nit, lambda i, x: x @ w, x)[0, 0].astype(jnp.float32)
        return run

    f1, f2 = make(iters[0]), make(iters[1])
    np.asarray(f1(x0, w)); np.asarray(f2(x0, w))      # compile both
    best = []
    for f in (f1, f2):
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(f(x0, w))
            ts.append(time.perf_counter() - t0)
        best.append(min(ts))
    dt = (best[1] - best[0]) / (iters[1] - iters[0])
    return 2.0 * n ** 3 / dt / 1e12


def run_config(size: str, lora_rank: int, batch: int, dtype: str,
               remat: str, accum: int = 1, steps: int = 10,
               label_len: int = 32, roof_tflops: float = 0.0,
               moments: str = "float32") -> dict:
    cfg = SIZES[size]()
    from audax.models.whisper import init_whisper_params
    params = init_whisper_params(cfg, jax.random.key(0))
    ft = FineTuneConfig(learning_rate=1e-4, warmup_steps=1, max_steps=10 ** 6,
                        lora_rank=lora_rank, moment_dtype=moments)
    state = init_finetune(params, ft)
    del params
    step = make_finetune_step(
        cfg, remat={"full": True, "dots": "dots", "none": False}[remat],
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
        accum_steps=accum)

    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (batch, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
    lab = collate_seq2seq(
        [list(rng.integers(3, cfg.vocab_size - 1, label_len))
         for _ in range(batch)], decoder_start_id=1)
    batch_d = {"mel": mel,
               "decoder_input_ids": jnp.asarray(lab["decoder_input_ids"]),
               "labels": jnp.asarray(lab["labels"])}

    @jax.jit
    def checksum(m):
        return m["loss"]

    t_c0 = time.perf_counter()
    compiled = step.lower(state, batch_d).compile()
    compile_s = time.perf_counter() - t_c0
    # ANALYTIC model FLOPs (utils/flops.py): cost_analysis counts the
    # lax.scan layer body once, under-counting scanned stacks ~Lx
    from audax.utils.flops import whisper_train_step_flops
    flops = whisper_train_step_flops(
        cfg, batch, int(batch_d["decoder_input_ids"].shape[1]),
        remat=remat, lora=lora_rank > 0)
    xla_flops = peak_hbm_gb = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        xla_flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    try:
        mem = compiled.memory_analysis()
        peak_hbm_gb = (mem.temp_size_in_bytes + mem.argument_size_in_bytes
                       + mem.output_size_in_bytes
                       - mem.alias_size_in_bytes) / 2 ** 30
    except Exception:
        pass

    state, m = compiled(state, batch_d)
    np.asarray(checksum(m))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = compiled(state, batch_d)
    loss = float(np.asarray(checksum(m)))            # 4-byte sync
    dt = (time.perf_counter() - t0) / steps
    tflops = flops / dt / 1e12
    return {"size": size, "lora_rank": lora_rank, "batch": batch,
            "dtype": dtype, "remat": remat, "accum": accum,
            "moments": moments,
            "sec_per_step": round(dt, 4),
            "examples_per_sec": round(batch / dt, 2),
            "audio_seconds_per_sec": round(batch * 30.0 / dt, 1),
            "achieved_tflops": round(tflops, 2),
            "mfu_pct_of_peak": round(100 * tflops * 1e12 / V5E_PEAK_FLOPS, 2),
            "pct_of_session_roofline": (
                round(100 * tflops / roof_tflops, 1) if roof_tflops else None),
            "xla_counted_tflops": round(xla_flops / dt / 1e12, 2),
            "planned_peak_hbm_gb": round(peak_hbm_gb, 2),
            "loss": round(loss, 4), "compile_s": round(compile_s, 1)}


# Measured HBM reality (the chipless AOT compiler reports true OOMs —
# "Used 20.74G of 15.75G" for small/full/b16/dots): batches past 8 need
# remat FULL on a 16 GB v5e for full-param small, so the grid leans on
# full remat (+accum) for the larger batches. OOM rows are kept as final
# results — what does NOT fit is part of the study.
GRID = [
    # size, lora, batch, dtype, remat, accum
    ("small", 0, 8, "bfloat16", "dots", 1),
    ("small", 0, 8, "bfloat16", "none", 1),
    ("small", 0, 8, "bfloat16", "full", 1),
    ("small", 0, 8, "float32", "dots", 1),      # dtype anchor
    ("small", 0, 16, "bfloat16", "dots", 1),
    ("small", 0, 16, "bfloat16", "full", 1),
    ("small", 0, 32, "bfloat16", "full", 1),
    ("small", 0, 32, "bfloat16", "full", 2),
    ("small", 0, 64, "bfloat16", "full", 2),
    # PARITY's executed memory plan: b8 x 30 s, donation + accum 4, remat
    # (8.55 GB planned; the real-loop run is results/whisper_small_ft)
    ("small", 0, 8, "bfloat16", "full", 4),
    ("small", 8, 16, "bfloat16", "dots", 1),
    ("small", 8, 16, "bfloat16", "full", 1),
    ("small", 8, 32, "bfloat16", "full", 1),
    ("medium", 0, 4, "bfloat16", "full", 1),
    ("medium", 0, 8, "bfloat16", "full", 2),
    ("medium", 8, 8, "bfloat16", "full", 1),
    ("medium", 8, 16, "bfloat16", "full", 2),
    # round 5: bf16 moments free 2.7 GB on medium (16.67 -> 13.99 GB at
    # b8/accum2) — spend it on batch: same per-microbatch activation
    # peak, optimizer amortized over 2x the examples
    ("medium", 0, 16, "bfloat16", "full", 4),
    ("medium", 0, 32, "bfloat16", "full", 8),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/mfu_study.json")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--only", default="",
                    help="comma list of grid indices to run (default all)")
    ap.add_argument("--moments", default="float32",
                    choices=["float32", "bfloat16", "int8"],
                    help="Adam moment storage dtype for every config run "
                         "in this invocation (train/optim.py adamw_lp); "
                         "use a separate --out for non-f32 studies")
    args = ap.parse_args()
    setup()
    os.makedirs(os.path.dirname(args.out), exist_ok=True)

    report = {"device": str(jax.devices()[0]),
              "v5e_peak_tflops": V5E_PEAK_FLOPS / 1e12, "configs": []}
    if os.path.exists(args.out):                     # resume partial study
        report = json.load(open(args.out))

    if not report.get("roofline_tflops"):
        r = roofline_tflops()
        report["roofline_tflops"] = round(r, 1)
        print(json.dumps({"roofline_tflops": report["roofline_tflops"]}),
              flush=True)
        json.dump(report, open(args.out, "w"), indent=1)
    roof = report["roofline_tflops"]

    # successes AND true OOMs are final; infra errors (compile-service
    # outages) are retried. Stale error rows for configs no longer in the
    # grid are dropped.
    keys = {g[:6] for g in GRID}
    report["configs"] = [
        c for c in report["configs"]
        if (c["size"], c["lora_rank"], c["batch"], c["dtype"], c["remat"],
            c["accum"]) in keys or "error" not in c]
    done = {(c["size"], c["lora_rank"], c["batch"], c["dtype"], c["remat"],
             c["accum"]) for c in report["configs"]
            if "error" not in c or c.get("oom")}
    only = {int(i) for i in args.only.split(",") if i.strip()}
    for i, (size, lora, b, dt, rm, acc) in enumerate(GRID):
        if (only and i not in only) or (size, lora, b, dt, rm, acc) in done:
            continue
        # re-roofline before each config? No: one probe per session is the
        # contract; tenancy drift within a session is reported by the probe
        # timestamp ordering instead.
        try:
            row = run_config(size, lora, b, dt, rm, accum=acc,
                             steps=args.steps, roof_tflops=roof,
                             moments=args.moments)
        except Exception as e:                       # OOM etc: record, go on
            msg = str(e)
            # surface the XLA OOM verdict (it hides mid-log in the axon
            # wrapper's output): "Ran out of memory in memory space hbm.
            # Used 20.74G of 15.75G hbm." is the row's real result
            oom = [ln.strip() for ln in msg.splitlines()
                   if "Ran out of memory" in ln]
            row = {"size": size, "lora_rank": lora, "batch": b, "dtype": dt,
                   "remat": rm, "accum": acc,
                   "oom": bool(oom),
                   "error": (oom[0].split("compile: ")[-1] if oom
                             else f"{type(e).__name__}: {msg[:300]}")}
        print(json.dumps(row), flush=True)
        report["configs"] = [c for c in report["configs"]
                             if (c["size"], c["lora_rank"], c["batch"],
                                 c["dtype"], c["remat"], c["accum"])
                             != (size, lora, b, dt, rm, acc)] + [row]
        json.dump(report, open(args.out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
