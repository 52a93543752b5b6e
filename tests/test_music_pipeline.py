"""Native synth, datagen drivers, and the music2midi 4-stage pipeline."""

import glob
import os

import numpy as np
import pytest

from audax.core.config import DataGenConfig
from audax.data.music_dataset import (ABC_SPECIALS, MusicDataset,
                                      stage_genparquet, stage_gentokens_bpe,
                                      stage_gentokens_raw, stage_midi2abc,
                                      stage_midi2wav)
from audax.data.synth import make_midi_dataset, piano_full_range, render_midi
from audax.symbolic.midi import MidiFile, Note, Tempo

REFERENCE_SF2 = "/root/reference/AB/Tetris SoundFont.sf2"


def _scale_midi(path, n=8):
    mf = MidiFile()
    mf.tempos.append(Tempo(0, 500000))
    for i in range(n):
        mf.notes.append(Note(i * 480, 480, 60 + i, 100))
    mf.save(path)
    return mf


def test_render_simple_pitch():
    mf = MidiFile()
    mf.tempos.append(Tempo(0, 500000))
    mf.notes.append(Note(0, 960, 69, 100))          # A4 = 440 Hz, 1 s
    x = render_midi(mf, 16000)
    assert len(x) > 16000
    seg = x[800: 15200]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = np.argmax(spec) * 16000 / len(seg)
    assert abs(peak_hz - 440) < 6


@pytest.mark.skipif(not os.path.exists(REFERENCE_SF2),
                    reason="reference soundfont not mounted")
def test_sf2_synth_real_soundfont():
    from audax.native.bindings import Sf2Synth
    synth = Sf2Synth(REFERENCE_SF2)
    assert synth.preset_count > 0
    mf = MidiFile()
    mf.tempos.append(Tempo(0, 500000))
    mf.notes.append(Note(0, 960, 60, 100))
    x = synth.render(mf, 16000)
    assert np.abs(x).max() > 0.01
    seg = x[:14000]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    peak_hz = np.argmax(spec) * 16000 / len(seg)
    # fundamental or a low harmonic of C4
    assert any(abs(peak_hz - 261.6 * k) < 12 for k in (1, 2, 3, 4))


def test_make_midi_dataset(tmp_path):
    cfg = DataGenConfig(num_items=5, notes_per_item=4,
                        out_dir=str(tmp_path / "gen"), seed=1)
    csv_path = make_midi_dataset(cfg)
    import pandas as pd
    df = pd.read_csv(csv_path)
    assert len(df) == 5
    assert df["labels"].str.startswith("<|MIDI|>").all()
    assert df["labels"].str.endswith("<|/MIDI|>").all()
    # labels have exactly 4 note names
    assert all(len(l.split()) == 6 for l in df["labels"])
    for f in df["filename"]:
        assert os.path.exists(f)
        assert os.path.exists(os.path.splitext(f)[0] + ".mid")


def test_piano_full_range(tmp_path):
    p = str(tmp_path / "sweep.mid")
    mf = piano_full_range(p)
    assert len(mf.notes) == 88
    back = MidiFile.load(p)
    assert [n.pitch for n in back.notes][:3] == [21, 22, 23]
    assert back.notes[-1].pitch == 108


def test_four_stage_pipeline(tmp_path):
    midi_dir = tmp_path / "midis"
    os.makedirs(midi_dir)
    for i in range(3):
        _scale_midi(str(midi_dir / f"tune{i}.mid"), n=6 + i)
    # a corrupt midi exercises per-item tolerance
    (midi_dir / "broken.mid").write_bytes(b"garbage")

    cfg = DataGenConfig(chunk_duration_s=2.0, out_dir=str(tmp_path))
    wav_dir, abc_dir = str(tmp_path / "wav"), str(tmp_path / "abc")
    wavs = stage_midi2wav(str(midi_dir), wav_dir, cfg, workers=1)
    assert len(wavs) == 3
    # chunks actually cut to ~2 s (+tail)
    from audax.data.audio_io import read_wav
    x, rate = read_wav(wavs[0])
    assert len(x) / rate < 2.6

    abcs = stage_midi2abc(wav_dir, abc_dir, workers=1)   # cut midis saved beside wavs
    assert len(abcs) == 3

    vocab = stage_gentokens_raw(abc_dir, str(tmp_path / "vocab.json"))
    assert "<abc_start>" in vocab and any(t.startswith("C") for t in vocab)

    bpe = stage_gentokens_bpe(abc_dir, str(tmp_path / "bpe"), vocab_size=300)
    assert len(bpe) >= 260

    parquet = stage_genparquet(wav_dir, abc_dir, str(tmp_path / "music.parquet"))
    import pyarrow.parquet as pq
    table = pq.read_table(parquet)
    df = table.to_pandas()
    assert df["processing_success"].sum() == 3
    ok = df[df["processing_success"]]
    assert (ok["tempo"] == 120).all()
    assert (ok["time_signature"] == "4/4").all()

    ds = MusicDataset(parquet, bpe, max_tokens=128)
    assert len(ds) == 3
    ex = ds[0]
    assert ex.input_ids.shape == (128,)
    assert ex.input_ids[0] == bpe.vocab["<abc_start>"]
    assert ex.attention_mask.sum() > 2
    assert ex.waveform.dtype == np.float32 and len(ex.waveform) > 1000
    # round-trip: decode ids back to ABC-ish text
    n_real = int(ex.attention_mask.sum())
    text = bpe.decode(ex.input_ids[1: n_real - 1])
    assert "X:" in text and "K:" in text
