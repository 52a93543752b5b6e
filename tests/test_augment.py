"""SpecAugment: shapes, determinism, masking actually happens, stats kept."""

import jax
import jax.numpy as jnp
import numpy as np

from audax.ops.augment import spec_augment


def test_spec_augment_properties(rng):
    mel = jnp.asarray(rng.standard_normal((4, 100, 32)).astype(np.float32))
    out = spec_augment(jax.random.key(0), mel)
    assert out.shape == mel.shape
    # deterministic in the key
    out2 = spec_augment(jax.random.key(0), mel)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different key -> different masks
    out3 = spec_augment(jax.random.key(1), mel)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))
    # something was masked but most content survives
    changed = (np.asarray(out) != np.asarray(mel)).mean()
    assert 0.0 < changed < 0.9
    # masked cells equal the per-example mean
    a = np.asarray(out)
    m = np.asarray(mel)
    diff_mask = a != m
    means = m.mean(axis=(1, 2), keepdims=True)
    np.testing.assert_allclose(a[diff_mask],
                               np.broadcast_to(means, m.shape)[diff_mask],
                               atol=1e-6)


def test_spec_augment_zero_masks_identity(rng):
    mel = jnp.asarray(rng.standard_normal((2, 50, 16)).astype(np.float32))
    out = spec_augment(jax.random.key(0), mel, time_masks=0, freq_masks=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mel))


def test_datagen_jitter_changes_audio_not_labels(tmp_path):
    """DataGenConfig velocity/gain/noise jitters widen the audio
    distribution while preserving labels: same seed with jitter=0 vs
    jitter-on yields the SAME label rows (melody draw order untouched —
    velocity jitter consumes rng AFTER the pitch draw) but different
    waveforms; jitter=0 stays byte-identical to the original path."""
    import csv

    from audax.core.config import DataGenConfig
    from audax.data.audio_io import read_wav
    from audax.data.synth import make_midi_dataset

    def rows(csv_path):
        with open(csv_path, newline="") as fh:
            return list(csv.DictReader(fh))

    base = DataGenConfig(num_items=3, notes_per_item=2, seed=5,
                         chunk_duration_s=2.0,
                         out_dir=str(tmp_path / "clean"))
    clean = rows(make_midi_dataset(base, write_midi=False))
    jit = DataGenConfig(num_items=3, notes_per_item=2, seed=5,
                        chunk_duration_s=2.0,
                        out_dir=str(tmp_path / "jit"),
                        velocity_jitter=30, gain_jitter_db=6.0,
                        noise_snr_db=20.0)
    jittered = rows(make_midi_dataset(jit, write_midi=False))
    assert [r["labels"] for r in clean] == [r["labels"] for r in jittered]
    for rc, rj in zip(clean, jittered):
        a, sr = read_wav(rc["filename"])
        b, _ = read_wav(rj["filename"])
        assert a.shape == b.shape
        assert not np.allclose(a, b)
        # noise floor present but signal dominates (SNR 20 dB)
        assert np.abs(b).max() <= 0.99 + 1e-3


def test_finetune_spec_augment_trains(tmp_path):
    """FineTuneConfig.spec_augment: the loop applies fresh masks per step
    (loss trajectory differs from the clean run) and still drives loss
    down — the wiring test for the generalization knob."""
    from audax.core.config import FineTuneConfig, MelConfig, WhisperConfig
    from audax.models.whisper import init_whisper_params
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer
    from audax.train.finetune_loop import finetune_whisper

    tok = WhisperTokenizer(train_bpe(["C4 D4 E4"] * 4, vocab_size=272))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=50, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=16)
    params = init_whisper_params(cfg, jax.random.key(0))
    mel_cfg = MelConfig.whisper(80)
    r = np.random.default_rng(0)
    labels = tok.sot_sequence(lang="en") + tok.encode("C4 D4 E4") + [tok.eot]
    examples = [{"audio": (0.1 * r.standard_normal(16000)).astype(np.float32),
                 "labels": labels, "text": "C4 D4 E4", "file": f"x{i}.wav"}
                for i in range(4)]

    def losses(sa):
        ft = FineTuneConfig(learning_rate=1e-3, warmup_steps=1, max_steps=8,
                            eval_every=10 ** 9, batch_size=4,
                            spec_augment=sa, sa_max_time_width=10,
                            sa_max_freq_width=8)
        _, hist = finetune_whisper(params, cfg, tok, examples, ft,
                                   mel_cfg=mel_cfg)
        return hist["loss"]

    clean = losses(False)
    aug = losses(True)
    assert all(np.isfinite(aug))
    assert aug != clean                 # masks actually hit the batch
    assert aug[-1] < aug[0]             # still learns under augmentation
