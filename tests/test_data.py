"""WAV codec, resampler, and UrbanSound Parquet pipeline tests."""

import os

import numpy as np
import pytest

from audax.core.config import MelConfig, UrbanSoundConfig
from audax.data.audio_io import read_wav, resample, to_mono, write_wav
from audax.data.batching import eval_batches, train_batches
from audax.data.urbansound import load_split, parquet_name, preprocess_to_parquet


def test_wav_roundtrip_pcm16(tmp_path, rng):
    x = np.clip(rng.standard_normal(1000) * 0.3, -0.999, 0.999).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16000)
    y, rate = read_wav(p)
    assert rate == 16000 and y.shape == (1000, 1)
    np.testing.assert_allclose(to_mono(y), x, atol=2.0 / 32768)


def test_wav_roundtrip_float32_stereo(tmp_path, rng):
    x = (rng.standard_normal((500, 2)) * 0.3).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, 44100, bits=32)
    y, rate = read_wav(p)
    assert rate == 44100 and y.shape == (500, 2)
    np.testing.assert_allclose(y, x, atol=1e-7)
    assert to_mono(y).shape == (500,)


def test_wav_pcm24(tmp_path):
    """Hand-build a 24-bit PCM wav and check decode."""
    import struct
    vals = np.array([0, 2**23 - 1, -2**23, 2**22], dtype=np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(raw), b"WAVE",
                      b"fmt ", 16, 1, 1, 16000, 16000 * 3, 3, 24,
                      b"data", len(raw))
    p = tmp_path / "c.wav"
    p.write_bytes(hdr + raw)
    y, _ = read_wav(str(p))
    np.testing.assert_allclose(
        y[:, 0], vals.astype(np.float64) / 2**23, atol=1e-7)


def test_resample_tone_preserved():
    """440 Hz tone resampled 44100->16000 keeps frequency and amplitude."""
    sr0, sr1 = 44100, 16000
    t0 = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440 * t0).astype(np.float32)
    y = resample(x, sr0, sr1)
    assert abs(len(y) - sr1) <= 2
    # dominant bin via rfft
    spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(len(y) - 400)))
    peak_hz = np.argmax(spec) * sr1 / (len(y) - 400)
    assert abs(peak_hz - 440) < 5
    mid = y[len(y) // 4: -len(y) // 4]
    assert 0.90 < mid.max() < 1.05


def test_resample_identity():
    x = np.random.default_rng(0).standard_normal(1234).astype(np.float32)
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)


@pytest.fixture
def fake_urbansound(tmp_path, rng):
    """Synthetic mini UrbanSound8K: 3 folds x 4 clips, tone per class."""
    import pandas as pd
    root = tmp_path / "US8K"
    rows = []
    for fold in (1, 2, 3):
        d = root / "audio" / f"fold{fold}"
        os.makedirs(d)
        for i in range(4):
            cid = (fold + i) % 3
            name = f"clip_{fold}_{i}.wav"
            n = int(16000 * (0.5 + rng.random()))  # ragged lengths
            t = np.arange(n) / 16000
            x = 0.5 * np.sin(2 * np.pi * (200 + 300 * cid) * t)
            write_wav(str(d / name), x.astype(np.float32), 16000)
            rows.append({"slice_file_name": name, "fold": fold,
                         "classID": cid, "class": f"class{cid}"})
    # one corrupt file exercises processing_success=False
    bad = root / "audio" / "fold1" / "bad.wav"
    bad.write_bytes(b"not a wav")
    rows.append({"slice_file_name": "bad.wav", "fold": 1, "classID": 0,
                 "class": "class0"})
    meta_dir = root / "metadata"
    os.makedirs(meta_dir)
    pd.DataFrame(rows).to_csv(meta_dir / "UrbanSound8K.csv", index=False)
    return UrbanSoundConfig(dataset_root=str(root),
                            parquet_dir=str(tmp_path / "artifacts"),
                            train_folds=(1, 2), eval_fold=3, test_fold=3)


def test_preprocess_and_load(fake_urbansound):
    import pyarrow.parquet as pq
    mel = MelConfig(n_fft=256, hop_length=128, n_mels=16)
    cfg = fake_urbansound
    path = preprocess_to_parquet(cfg, mel, batch_size=5)
    assert os.path.basename(path) == parquet_name(mel)
    table = pq.read_table(path)
    assert table.num_rows == 13
    ok = table.to_pandas()["processing_success"]
    assert int((~ok).sum()) == 1

    t_expected = mel.frames_for(int(cfg.duration_s * 16000))
    train = load_split(path, cfg.train_folds)
    assert train["x"].shape == (8, t_expected, 16)
    assert train["y"].min() >= 0 and train["y"].max() <= 2
    ev = load_split(path, [cfg.eval_fold])
    assert ev["x"].shape[0] == 4
    # mel-first layout matches the reference's [n_mels, T] rows
    mf = load_split(path, [1], time_major=False)
    assert mf["x"].shape[1:] == (16, t_expected)


def test_end_to_end_mini_training(fake_urbansound):
    """Full slice: wavs -> parquet -> fold protocol -> >chance accuracy."""
    from audax.core.config import (ClassifierTrainConfig,
                                   TransformerClassifierConfig)
    from audax.models.classifiers import TransformerClassifier
    from audax.train.loops import fit_classifier
    mel = MelConfig(n_fft=256, hop_length=256, n_mels=16)
    cfg = fake_urbansound
    path = preprocess_to_parquet(cfg, mel)
    train = load_split(path, cfg.train_folds)
    ev = load_split(path, [cfg.eval_fold])
    model = TransformerClassifier(TransformerClassifierConfig(
        dim=16, heads=2, layers=1, mlp_dim=32, dropout=0.0, num_classes=3),
        max_len=512)
    state, hist = fit_classifier(
        model, train, ev,
        ClassifierTrainConfig(batch_size=4, epochs=8, learning_rate=3e-3,
                              weight_decay=0.0),
        num_classes=3)
    assert hist["eval"][-1]["accuracy"] >= 0.5  # 3 pure tones: learnable


def test_batching_contracts(rng):
    data = {"x": rng.standard_normal((10, 3)).astype(np.float32),
            "y": np.arange(10)}
    b1 = list(train_batches(data, 4, seed=0, epoch=0))
    assert len(b1) == 2 and all(b["x"].shape == (4, 3) for b in b1)
    b2 = list(train_batches(data, 4, seed=0, epoch=0))
    np.testing.assert_array_equal(b1[0]["y"], b2[0]["y"])  # deterministic
    b3 = list(train_batches(data, 4, seed=0, epoch=1))
    assert not np.array_equal(b1[0]["y"], b3[0]["y"])      # reshuffled
    ev = list(eval_batches(data, 4))
    assert len(ev) == 3
    assert ev[-1]["w"].sum() == 2 and ev[-1]["x"].shape == (4, 3)


class TestCompressedAudio:
    """In-process m4a/AAC + mp3 decode via the lavc-linked C++ module
    (closes the reference's AB/memoToWav.py ffmpeg-subprocess dependency)."""

    @pytest.fixture(autouse=True)
    def _need_module(self):
        from audax.native.bindings import decode_available
        if not decode_available():
            pytest.skip("system ffmpeg libraries unavailable")

    @pytest.mark.parametrize("ext", ["m4a", "mp3", "flac", "ogg"])
    def test_roundtrip_tone_per_container(self, tmp_path, ext):
        """Each advertised container round-trips with the tone preserved —
        and each exercises a different encoder sample format (AAC=FLTP,
        mp3=S32P, FLAC=S16, vorbis=FLTP), so format conversion in the
        encoder fill loop is covered."""
        from audax.native.bindings import decode_audio_file, encode_audio_file
        sr = 16000
        t = np.arange(sr * 2) / sr
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = str(tmp_path / f"tone.{ext}")
        encode_audio_file(path, x, sr)
        assert os.path.getsize(path) > 1000
        y, rate = decode_audio_file(path)
        assert rate == sr and y.ndim == 2
        # lossy codecs: assert the dominant frequency survives, not samples
        spec = np.abs(np.fft.rfft(y[: sr, 0]))
        assert abs(int(np.argmax(spec)) - 440) <= 2

    def test_memo_to_wav_contract(self, tmp_path):
        """AB/memoToWav.py parity: 16 kHz mono 16-bit wav, stem preserved."""
        from audax.data.audio_io import memo_to_wav, read_wav
        from audax.native.bindings import encode_audio_file
        sr_in = 44100
        t = np.arange(sr_in) / sr_in
        stereo = np.stack([np.sin(2 * np.pi * 330 * t),
                           np.sin(2 * np.pi * 330 * t)], 1).astype(np.float32)
        src = str(tmp_path / "memo 7.m4a")
        encode_audio_file(src, 0.4 * stereo, sr_in)
        dst = memo_to_wav(src, str(tmp_path / "out"))
        assert os.path.basename(dst) == "memo 7.wav"
        x, rate = read_wav(dst)
        assert rate == 16000 and x.shape[1] == 1
        spec = np.abs(np.fft.rfft(x[: 16000, 0]))
        assert abs(int(np.argmax(spec)) - 330) <= 2

    def test_read_audio_routes_wav_and_compressed(self, tmp_path, rng):
        from audax.data.audio_io import read_audio, write_wav
        from audax.native.bindings import encode_audio_file
        wav = str(tmp_path / "a.wav")
        x = (0.2 * rng.standard_normal(8000)).astype(np.float32)
        write_wav(wav, x, 16000)
        got, rate = read_audio(wav)
        assert rate == 16000 and got.shape[0] == 8000
        m4a = str(tmp_path / "b.m4a")
        encode_audio_file(m4a, x, 16000)
        got2, rate2 = read_audio(m4a)
        assert rate2 == 16000 and got2.shape[0] > 0


def test_make_synthetic_urbansound_layout_and_separability(tmp_path, rng):
    """Generator writes the exact UrbanSound8K layout and the classes are
    spectrally distinct enough for the protocol to be meaningful."""
    import pandas as pd

    from audax.data.synth import SYNTH_CLASSES, _synth_clip, \
        make_synthetic_urbansound
    from audax.data.urbansound import preprocess_to_parquet
    from audax.core.config import MelConfig, UrbanSoundConfig

    root = make_synthetic_urbansound(str(tmp_path / "US"), per_fold=3, seed=0)
    meta = pd.read_csv(os.path.join(root, "metadata", "UrbanSound8K.csv"))
    assert len(meta) == 30 and sorted(meta["fold"].unique()) == list(range(1, 11))
    assert set(meta.columns) >= {"slice_file_name", "fold", "classID", "class"}
    # consumable by the real preprocessing stage
    us = UrbanSoundConfig(dataset_root=root, parquet_dir=str(tmp_path / "pq"))
    path = preprocess_to_parquet(us, MelConfig(n_fft=512, hop_length=256,
                                               n_mels=16))
    assert os.path.exists(path)
    # distinct mean spectra between a low tone and a high tone
    lo = _synth_clip(0, np.random.default_rng(1))
    hi = _synth_clip(1, np.random.default_rng(1))
    slo = np.abs(np.fft.rfft(lo[:16000]))
    shi = np.abs(np.fft.rfft(hi[:16000]))
    assert np.argmax(slo) < 600 < np.argmax(shi)
    assert len(SYNTH_CLASSES) == 10
