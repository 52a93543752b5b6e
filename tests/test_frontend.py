"""Frontend parity: XLA path and fused Pallas kernel vs numpy oracle and
torch.stft cross-check (SURVEY.md §4 kernel-vs-oracle strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import MelConfig
from audax.frontend import LogMelFrontend, pad_or_trim
from audax.ops.pallas_mel import log_mel_pallas
from audax.ops.stft import log_mel_xla

from .oracle import log_mel_oracle

CFGS = {
    "urbansound_v2": MelConfig.urbansound_v2(),
    "urbansound_v1": MelConfig.urbansound_v1(),
    "whisper80": MelConfig.whisper(80),
    "whisper128": MelConfig.whisper(128),
}


def _signal(rng, n=16000):
    # mixture of tones + noise, realistic dynamic range
    t = np.arange(n) / 16000.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 3333 * t)
         + 0.05 * rng.standard_normal(n))
    return x.astype(np.float32)


@pytest.mark.parametrize("name", list(CFGS))
def test_xla_matches_oracle(name, rng):
    cfg = CFGS[name]
    x = _signal(rng)
    ours = np.asarray(log_mel_xla(jnp.asarray(x), cfg))
    ref = log_mel_oracle(x, cfg)
    assert ours.shape == ref.shape == (cfg.frames_for(len(x)), cfg.n_mels)
    # log-domain comparison: absolute tolerance is what matters
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=0)


@pytest.mark.parametrize("name", ["urbansound_v2", "whisper80"])
def test_pallas_interpret_matches_xla(name, rng):
    cfg = CFGS[name]
    x = _signal(rng, n=32000)
    a = np.asarray(log_mel_xla(jnp.asarray(x), cfg))
    b = np.asarray(log_mel_pallas(jnp.asarray(x), cfg, interpret=True))
    np.testing.assert_allclose(a, b, atol=2e-4, rtol=0)


class TestOverlapKernel:
    """Overlap-reuse kernel (zoom-DFT blocks + twiddle recombination +
    spectral hann): must be numerically exact vs the direct-DFT oracle."""

    def test_applicability(self):
        import dataclasses
        from audax.ops.pallas_mel import overlap_applicable
        assert overlap_applicable(CFGS["urbansound_v2"])   # g=128, a=1
        assert overlap_applicable(CFGS["urbansound_v1"])   # g=512, a=1
        assert overlap_applicable(CFGS["whisper80"])       # g=80, nb=5, a=2
        # no reuse when hop == n_fft (a == nb)
        assert not overlap_applicable(
            dataclasses.replace(CFGS["urbansound_v2"], hop_length=1024))

    @pytest.mark.parametrize("name", ["urbansound_v2", "urbansound_v1"])
    def test_matches_oracle(self, name, rng):
        from audax.ops.pallas_mel import log_mel_overlap
        cfg = CFGS[name]
        x = _signal(rng, n=64000)
        ref = log_mel_oracle(x, cfg)
        out = np.asarray(log_mel_overlap(jnp.asarray(x), cfg, interpret=True))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=0)

    @pytest.mark.parametrize("name", ["whisper80", "whisper128"])
    def test_whisper_two_plane_matches_oracle(self, name, rng):
        """a=2 plane layout (g=80, 5 blocks/frame, advance 2): the whisper
        log-mel (incl. per-item max clamp, applied by log_mel_pallas) must
        match the oracle through the overlap path."""
        cfg = CFGS[name]
        x = _signal(rng, n=48000)
        ref = log_mel_oracle(x, cfg)
        out = np.asarray(log_mel_pallas(jnp.asarray(x), cfg, interpret=True))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=0)

    def test_odd_length_batch_multitile(self, rng):
        from audax.ops.pallas_mel import log_mel_overlap
        cfg = CFGS["urbansound_v2"]
        # odd length, batch rank, >1 frame tile per clip (T=782 > 512)
        x = np.stack([_signal(rng, 100001) for _ in range(2)])
        out = np.asarray(log_mel_overlap(jnp.asarray(x), cfg, interpret=True))
        assert out.shape == (2, cfg.frames_for(100001), cfg.n_mels)
        ref = log_mel_oracle(x[1], cfg)
        np.testing.assert_allclose(out[1], ref, atol=2e-4, rtol=0)

    def test_no_halo_slack_config(self, rng):
        """nb-1 already a multiple of 8 (n_fft=1152, hop=128: halo gets no
        rounding slack) made the tail pad width negative — regression."""
        import dataclasses
        from audax.ops.pallas_mel import log_mel_overlap, overlap_applicable
        cfg = dataclasses.replace(CFGS["urbansound_v2"], n_fft=1152,
                                  fmax=8000.0)
        assert overlap_applicable(cfg)
        x = _signal(rng, 65535)
        out = np.asarray(log_mel_overlap(jnp.asarray(x), cfg, interpret=True))
        ref = log_mel_oracle(x, cfg)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=0)

    def test_center_false_and_silence(self, rng):
        from audax.ops.pallas_mel import log_mel_overlap
        import dataclasses
        cfg = dataclasses.replace(CFGS["urbansound_v2"], center=False)
        x = _signal(rng, 32000)
        out = np.asarray(log_mel_overlap(jnp.asarray(x), cfg, interpret=True))
        ref = log_mel_oracle(x, cfg)
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=0)
        silent = np.asarray(log_mel_overlap(
            jnp.zeros(16000), CFGS["urbansound_v2"], interpret=True))
        assert np.isfinite(silent).all()                  # log floor holds

    def test_routed_from_log_mel_pallas(self, rng):
        # log_mel_pallas must route urbansound configs through the overlap
        # kernel and still match the XLA twin exactly
        cfg = CFGS["urbansound_v2"]
        x = _signal(rng, 48000)
        a = np.asarray(log_mel_xla(jnp.asarray(x), cfg))
        b = np.asarray(log_mel_pallas(jnp.asarray(x), cfg, interpret=True))
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=0)


def test_batched_and_shapes(rng):
    cfg = CFGS["urbansound_v2"]
    x = np.stack([_signal(rng, 64000) for _ in range(3)])
    out = np.asarray(log_mel_xla(jnp.asarray(x), cfg))
    assert out.shape == (3, 501, 128)  # v2 contract [128, 501] transposed
    ref0 = log_mel_oracle(x[0], cfg)
    np.testing.assert_allclose(out[0], ref0, atol=2e-3, rtol=0)


def test_whisper_3000_frames(rng):
    fe = LogMelFrontend.whisper(80, backend="xla")
    x = jnp.asarray(_signal(rng, 480000))
    mel = fe(x)
    assert mel.shape == (3000, 80)
    assert fe.num_frames(480000) == 3000
    mel_t = fe(x, mel_first=True)
    assert mel_t.shape == (80, 3000)


def test_pad_or_trim():
    x = jnp.ones((2, 100))
    assert pad_or_trim(x, 64000).shape == (2, 64000)
    assert pad_or_trim(jnp.ones((2, 70000)), 64000).shape == (2, 64000)
    padded = pad_or_trim(x, 200)
    assert float(padded[:, 100:].sum()) == 0.0


def test_stft_cross_check_torch(rng):
    """Cross-validate the oracle itself against torch.stft on the raw
    power spectrogram (catches convention bugs in window/pad/fft)."""
    torch = pytest.importorskip("torch")
    cfg = CFGS["whisper80"]
    x = _signal(rng, 8000)
    spec_t = torch.stft(
        torch.tensor(x), n_fft=cfg.n_fft, hop_length=cfg.hop_length,
        window=torch.hann_window(cfg.n_fft), center=True, return_complex=True,
    )
    power_t = (spec_t.abs() ** 2).numpy().T          # [T, F]
    from audax.ops.mel import frontend_constants
    cos_w, sin_w, _ = frontend_constants(cfg)
    from audax.ops.stft import frame_signal
    frames = np.asarray(frame_signal(jnp.asarray(x), cfg))
    power = (frames @ cos_w) ** 2 + (frames @ sin_w) ** 2
    np.testing.assert_allclose(power, power_t, atol=1e-2, rtol=1e-3)


def test_whisper_clamp_after_frame_drop(rng):
    """Regression (review finding): the max-8 clamp must be taken over the
    3000 RETAINED frames, not before the final STFT frame is dropped — a
    loud burst at the trim point used to set the clamp floor for the whole
    window (WhisperFeatureExtractor trims, then takes the max)."""
    cfg = CFGS["whisper80"]
    n = 16000                       # 1 s -> 100 full frames, 99 retained
    x = 0.0001 * _signal(rng, n)    # very quiet body
    x = np.asarray(x)
    # burst in the last 40 samples: the dropped final frame windows it near
    # its hann peak while the last retained frame sees it at ~0.2 weight,
    # so the (wrong) pre-drop max exceeds the (right) post-drop max
    x[-40:] = 1.0
    fe = LogMelFrontend(cfg, backend="xla", whisper_frames=True)
    out = np.asarray(fe(jnp.asarray(x)))
    ref = log_mel_oracle(x, cfg, whisper_frames=True)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=0)
    # the wrong ordering (clamp before drop) must NOT match: the clamp
    # floor shifts for the whole quiet body
    wrong = log_mel_oracle(x, cfg)[:-1]
    assert np.abs(wrong - ref).max() > 0.05


def test_whisper_log_epilogue_batch_independent(rng):
    """The max-8 clamp must be per-item, not per-batch."""
    cfg = CFGS["whisper80"]
    loud = _signal(rng, 16000) * 10.0
    quiet = _signal(rng, 16000) * 0.001
    batch = jnp.stack([loud, quiet])
    together = np.asarray(log_mel_xla(batch, cfg))
    solo = np.asarray(log_mel_xla(jnp.asarray(quiet), cfg))
    np.testing.assert_allclose(together[1], solo, atol=1e-6)


@pytest.mark.fast
def test_frontend_pallas_traceable_on_any_host():
    """The public frontend must TRACE with backend='pallas' regardless of
    host (jax.eval_shape = abstract trace, no kernel execution).

    Regression: ``whisper_post`` was missing from log_mel_pallas's jit
    static_argnames, so under the outer _frontend_impl jit it arrived as a
    traced bool and `cfg.log_mode == "whisper" and whisper_post` crashed —
    breaking EVERY whisper-mode serving path on real TPU while CPU tests
    (xla backend, correctly static) stayed green. Urbansound configs
    short-circuited before touching the tracer, so bench.py hid it too.
    """
    import jax
    from audax.frontend import LogMelFrontend
    for fe, t_expect in [
        (LogMelFrontend.whisper(80, backend="pallas"), 3000),
        (LogMelFrontend.whisper(128, backend="pallas"), 3000),
        (LogMelFrontend.urbansound(2, backend="pallas"), 501),
    ]:
        n = int(fe.cfg.sample_rate * (30.0 if t_expect == 3000 else 4.0))
        out = jax.eval_shape(fe, jax.ShapeDtypeStruct((1, n), jnp.float32))
        assert out.shape == (1, t_expect, fe.cfg.n_mels), out.shape
