"""Where does the fine-tune train step's time go? (round-4 MFU follow-up)

The MFU study (tools/mfu_study.py) measured whisper-small full-param bf16
at 4.1-4.8 TFLOP/s while the SAME session's chained-matmul roofline
delivered 174.6 TFLOP/s — 2.8% of the in-session deliverable rate, so the
gap is the framework/model, not tenancy. This probe times the step's
stages separately on the real chip to localize it:

  encoder_fwd      whisper_encode (conv stem + 12-layer stack)
  encoder_grad     d/dparams of sum(encode)
  decoder_fwd      teacher-forced decode_train over precomputed states
  forward          whisper_forward (encoder + decoder)
  loss_grad        value_and_grad of the CE loss (no optimizer)
  optimizer        AdamW update from precomputed grads
  full_step        make_finetune_step(remat=none)

Each stage is timed with the N-dispatch + 4-byte-checksum pattern
(time_fn) and annotated with XLA's cost_analysis FLOPs -> achieved
TFLOP/s. ``--attn xla`` re-times with the XLA attention twin (the env
backend is read at audax import, so the A/B is two processes).

Usage: python tools/train_step_breakdown.py [--attn pallas|xla]
Writes/merges results/train_step_breakdown.json keyed by attn backend.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="small")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--label-len", type=int, default=32)
    ap.add_argument("--attn", default="pallas", choices=["pallas", "xla"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="results/train_step_breakdown.json")
    ap.add_argument("--only", default="",
                    help="substring filter: run only matching stage names")
    ap.add_argument("--moments", default="float32",
                    choices=["float32", "bfloat16", "int8"],
                    help="Adam moment storage dtype for the optimizer/"
                         "full-step stages (train/optim.py adamw_lp)")
    args = ap.parse_args()
    os.environ["AUDAX_ATTN_BACKEND"] = args.attn

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audax.core.config import FineTuneConfig, WhisperConfig
    from audax.core.runtime import setup
    from audax.models.whisper import (decode_train, encode,
                                      init_whisper_params, whisper_forward)
    from audax.train.seq2seq import (collate_seq2seq, init_finetune,
                                     make_finetune_step, seq2seq_loss)
    from audax.utils.profiling import time_fn

    setup()
    cfg = {"tiny": WhisperConfig.tiny, "base": WhisperConfig.base,
           "small": WhisperConfig.small,
           "medium": WhisperConfig.medium}[args.size]()
    params = init_whisper_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    b = args.batch
    mel = jnp.asarray(rng.standard_normal(
        (b, 2 * cfg.n_audio_ctx, cfg.n_mels)).astype(np.float32))
    lab = collate_seq2seq(
        [list(rng.integers(3, cfg.vocab_size - 1, args.label_len))
         for _ in range(b)], decoder_start_id=1)
    dec_in = jnp.asarray(lab["decoder_input_ids"])
    labels = jnp.asarray(lab["labels"])
    dt16 = jnp.bfloat16

    from audax.utils.flops import (whisper_decoder_fwd_flops,
                                   whisper_encoder_fwd_flops)
    t_lab = int(dec_in.shape[1])
    enc_f = whisper_encoder_fwd_flops(cfg, b)
    dec_f = whisper_decoder_fwd_flops(cfg, b, t_lab)

    def want(name: str) -> bool:
        """One containment direction for ALL --only decisions (bench,
        micro, setup guards, early exits) — ADVICE r4: mixed directions
        made --only fwd record an enc_out=None error row over good data
        and --only opt return before benchmarking anything."""
        return not args.only or args.only in name

    rows = {}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    if os.path.exists(args.out):   # --only reruns refresh, not clobber —
        prev = json.load(open(args.out)).get(args.attn, {})
        # ...but only when the stored config matches: merging rows
        # measured under a different size/batch/label_len would mix
        # shapes beneath one header (and starting empty on a config
        # change garbage-collects renamed stages too)
        if (prev.get("size") == args.size and prev.get("batch") == b
                and prev.get("label_len") == args.label_len):
            rows.update(prev.get("stages", {}))

    def bench(name, flops, fn, *fargs):
        if not want(name):
            return
        # flops are ANALYTIC (utils/flops.py): cost_analysis counts the
        # scanned layer body once and would under-report ~Lx here
        jfn = jax.jit(fn)
        try:
            t = time_fn(jfn, *fargs, iters=args.iters)
            row = {"ms": round(1e3 * t["seconds_per_call"], 2),
                   "tflops": round(flops / t["seconds_per_call"] / 1e12, 2)}
        except Exception as e:       # per-stage tolerance: an OOM stage
            oom = "Ran out of memory" in str(e)    # must not hide the rest
            row = {"error": ("oom" if oom else str(e)[:120])}
        rows[name] = row
        print(json.dumps({name: row}), flush=True)
        report = {}
        if os.path.exists(args.out):      # incremental write: OOM-safe
            report = json.load(open(args.out))
        report[args.attn] = {"size": args.size, "batch": b,
                             "label_len": args.label_len, "stages": rows}
        json.dump(report, open(args.out, "w"), indent=1)

    enc_out = None
    if want("decoder_fwd"):
        enc_out = jax.jit(
            lambda p, m: encode(p, cfg, m, dt16))(params, mel)

    bench("encoder_fwd", enc_f,
          lambda p, m: encode(p, cfg, m, dt16), params, mel)
    bench("encoder_grad", 3 * enc_f,
          jax.grad(lambda p, m: encode(p, cfg, m, dt16)
                   .astype(jnp.float32).sum()), params, mel)
    if enc_out is not None:
        bench("decoder_fwd", dec_f,
              lambda p, e, t: decode_train(p, cfg, t, e, dt16),
              params, enc_out, dec_in)
    bench("forward", enc_f + dec_f,
          lambda p, m, t: whisper_forward(p, cfg, m, t, dt16),
          params, mel, dec_in)

    def loss_fn(p, m, t, y):
        return seq2seq_loss(
            whisper_forward(p, cfg, m, t, dt16).astype(jnp.float32), y)

    bench("loss_grad", 3 * (enc_f + dec_f),
          jax.grad(loss_fn), params, mel, dec_in, labels)

    # --- micro-op stages (CHAINED slope timing: these are sub-ms, and
    # host-loop timing over the tunnel measures the ~0.5-1 s dispatch
    # floor instead; CLAUDE.md / ROADMAP #22) — localize the uniform
    # ~60 TF/s step rate: if the bare matmuls at the MODEL's shapes run at
    # the roofline, the gap is scheduling/elementwise; if they run at
    # ~60 TF/s, the shapes themselves are the ceiling. Chaining (x <-
    # f(x)) is mandatory for the bare matmuls: the element-[0] probe form
    # gets dead-code-narrowed to one dot (absurd/negative slopes recorded
    # in the round-4 artifact; ROADMAP #4).
    from audax.utils.profiling import slope_timed_chained
    s, d = cfg.n_audio_ctx, cfg.d_model
    bs = b * s
    x2d = jnp.asarray(rng.standard_normal((bs, d)), jnp.bfloat16)
    wdd = jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d), jnp.bfloat16)
    wdm = jnp.asarray(rng.standard_normal((d, 4 * d)) / np.sqrt(d),
                      jnp.bfloat16)
    wmd = jnp.asarray(rng.standard_normal((4 * d, d)) / np.sqrt(4 * d),
                      jnp.bfloat16)
    w3d = jnp.asarray(rng.standard_normal((d, 3 * d)) / np.sqrt(d),
                      jnp.bfloat16)

    def micro(name, flops, fn, x0, *extra):
        if not want(name):
            return
        sec = slope_timed_chained(fn, x0, extra, iters=(30, 230), repeats=3)
        row = {"us": round(1e6 * sec, 1),
               "tflops": round(flops / sec / 1e12, 2)}
        rows[name] = row
        print(json.dumps({name: row}), flush=True)
        report = {}
        if os.path.exists(args.out):
            report = json.load(open(args.out))
        report[args.attn] = {"size": args.size, "batch": b,
                             "label_len": args.label_len, "stages": rows}
        json.dump(report, open(args.out, "w"), indent=1)

    micro("matmul_proj_bs_d_d", 2 * bs * d * d,
          lambda x, w: x @ w, x2d, wdd)
    # QKV as three separate [d,d] dots sharing x (the model's layout) vs
    # one fused [d,3d] dot — is there launch/pipelining headroom? The
    # chain combiner is NONLINEAR (q*k + v, mirroring attention's use):
    # a plain q+k+v sum would let XLA factor x@w1 + x@w2 + x@w3 into
    # x@(w1+w2+w3) — one dot — and time the wrong program. 0.5 keeps the
    # bf16 carry from drifting to inf (timing is data-independent; the
    # scale only keeps the final checksum meaningful).
    wq_, wk_, wv_ = (jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d),
                                 jnp.bfloat16) for _ in range(3))
    micro("matmul_qkv_3sep", 3 * 2 * bs * d * d,
          lambda x, wq, wk, wv: ((x @ wq) * (x @ wk) + (x @ wv)) * 0.5,
          x2d, wq_, wk_, wv_)
    micro("matmul_qkv_fused_d_3d", 2 * bs * d * 3 * d,
          lambda x, w: (lambda y: (y[:, :d] * y[:, d:2 * d]
                                   + y[:, 2 * d:]) * 0.5)(x @ w),
          x2d, w3d)
    # the MLP pair chained as a unit (d->4d->d is shape-preserving)
    micro("matmul_mlp_pair", 2 * 2 * bs * d * 4 * d,
          lambda x, w1, w2: (x @ w1) @ w2, x2d, wdm, wmd)
    qh = jnp.asarray(rng.standard_normal((b, cfg.heads, s, d // cfg.heads)),
                     jnp.bfloat16)
    from audax.ops.attention import dot_product_attention
    micro("attention_enc_shape", 4 * b * s * s * d,
          lambda q: dot_product_attention(q, q, q), qh)
    x3d = jnp.asarray(rng.standard_normal((b, s, 4 * d)), jnp.bfloat16)
    micro("gelu_exact_4d", 0,
          lambda a: jax.nn.gelu(a, approximate=False), x3d)
    xln = jnp.asarray(rng.standard_normal((b, s, d)), jnp.bfloat16)
    lnp = {"scale": jnp.ones((d,), jnp.float32),
           "bias": jnp.zeros((d,), jnp.float32)}
    from audax.models.whisper import layer_norm
    micro("layer_norm_d", 0, lambda a: layer_norm(lnp, a), xln)

    if not (want("optimizer") or want("full_step_dots")):
        return 0
    ft = FineTuneConfig(learning_rate=1e-4, warmup_steps=1,
                        max_steps=10 ** 6, lora_rank=0,
                        moment_dtype=args.moments)
    state = init_finetune(params, ft)

    # grads here are only the optimizer stage's INPUT — compute them with
    # per-layer remat so the setup's transient peak (~13 GB at small b8
    # without remat) can't OOM a busy multi-tenant chip before the stage
    # even times (observed: RESOURCE_EXHAUSTED on this exact path)
    def loss_fn_remat(p, m, t, y):
        return seq2seq_loss(
            whisper_forward(p, cfg, m, t, dt16, remat=True)
            .astype(jnp.float32), y)

    grads = jax.jit(jax.grad(loss_fn_remat))(params, mel, dec_in, labels)

    def opt_only(tr, opt_state, g):
        import optax
        updates, new_opt = state.tx.update(g, opt_state, tr)
        return optax.apply_updates(tr, updates), new_opt

    opt_name = ("optimizer" if args.moments == "float32"
                else f"optimizer_{args.moments}")
    bench(opt_name, 0.0, opt_only, state.trainable, state.opt_state,
          grads)
    if not want("full_step_dots"):
        return 0
    del grads, enc_out, x2d, wdd, wdm, qh, x3d, xln
    # full step WITH donation (the production configuration — without it
    # the step holds input+output state copies and OOMs next to the probe
    # buffers): chain the state through the loop and sync via a 4-byte
    # checksum fetch
    import time as _time
    step = make_finetune_step(cfg, remat="dots", dtype=dt16, donate=True)
    batch = {"mel": mel, "decoder_input_ids": dec_in, "labels": labels}
    csum = jax.jit(lambda m: m["loss"])
    state, m = step(state, batch)
    np.asarray(csum(m))
    t0 = _time.perf_counter()
    for _ in range(args.iters):
        state, m = step(state, batch)
    np.asarray(csum(m))
    dt = (_time.perf_counter() - t0) / args.iters
    rows["full_step_dots"] = {"ms": round(1e3 * dt, 2),
                              "tflops": round(3 * (enc_f + dec_f) / dt
                                              / 1e12, 2)}
    print(json.dumps({"full_step_dots": rows["full_step_dots"]}), flush=True)
    report = {}
    if os.path.exists(args.out):
        report = json.load(open(args.out))
    report[args.attn] = {"size": args.size, "batch": b,
                         "label_len": args.label_len, "stages": rows}
    json.dump(report, open(args.out, "w"), indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
