"""grain input pipelines: shapes, shuffling determinism, epoching."""

import os

import numpy as np
import pytest

from audax.core.config import DataGenConfig, MelConfig, UrbanSoundConfig


@pytest.fixture
def us_parquet(tmp_path, rng):
    import pandas as pd
    from audax.data.audio_io import write_wav
    from audax.data.urbansound import preprocess_to_parquet
    root = tmp_path / "US"
    rows = []
    for fold in (1, 2):
        d = root / "audio" / f"fold{fold}"
        os.makedirs(d)
        for i in range(5):
            name = f"f{fold}_{i}.wav"
            write_wav(str(d / name),
                      (0.2 * rng.standard_normal(8000)).astype(np.float32),
                      16000)
            rows.append({"slice_file_name": name, "fold": fold,
                         "classID": i % 3, "class": f"c{i % 3}"})
    os.makedirs(root / "metadata")
    pd.DataFrame(rows).to_csv(root / "metadata" / "UrbanSound8K.csv",
                              index=False)
    cfg = UrbanSoundConfig(dataset_root=str(root),
                           parquet_dir=str(tmp_path / "art"))
    return preprocess_to_parquet(cfg, MelConfig(n_fft=256, hop_length=256,
                                                n_mels=8))


def test_urbansound_grain_batches(us_parquet):
    from audax.data.grain_pipeline import urbansound_dataset
    ds = urbansound_dataset(us_parquet, folds=[1, 2], batch_size=4, seed=0)
    batches = list(ds)
    assert len(batches) == 2                 # 10 rows, drop remainder
    assert batches[0]["x"].shape[0] == 4
    assert batches[0]["x"].ndim == 3
    assert batches[0]["y"].shape == (4,)
    # deterministic under the same seed
    again = list(urbansound_dataset(us_parquet, folds=[1, 2], batch_size=4,
                                    seed=0))
    np.testing.assert_array_equal(batches[0]["y"], again[0]["y"])
    # different seed shuffles differently (10 rows: overwhelmingly likely)
    other = list(urbansound_dataset(us_parquet, folds=[1, 2], batch_size=4,
                                    seed=7))
    assert not all(np.array_equal(a["y"], b["y"])
                   for a, b in zip(batches, other))


def test_urbansound_grain_epochs(us_parquet):
    from audax.data.grain_pipeline import urbansound_dataset
    ds = urbansound_dataset(us_parquet, folds=[1, 2], batch_size=5, epochs=3,
                            shuffle=False)
    assert len(list(ds)) == 6                # 10 rows x 3 epochs / 5


def test_waveform_grain_with_tokenizer(tmp_path, rng):
    from audax.data.grain_pipeline import waveform_dataset
    from audax.data.music_dataset import (stage_genparquet, stage_midi2abc,
                                          stage_midi2wav, ABC_SPECIALS)
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.midi import MidiFile, Note, Tempo
    midi_dir = tmp_path / "m"
    os.makedirs(midi_dir)
    for i in range(3):
        mf = MidiFile()
        mf.tempos.append(Tempo(0, 500000))
        for j in range(4):
            mf.notes.append(Note(j * 480, 480, 60 + i + j, 100))
        mf.save(str(midi_dir / f"x{i}.mid"))
    wav_dir, abc_dir = str(tmp_path / "w"), str(tmp_path / "a")
    stage_midi2wav(str(midi_dir), wav_dir, DataGenConfig(chunk_duration_s=3),
                   workers=1)
    stage_midi2abc(wav_dir, abc_dir, workers=1)
    parquet = stage_genparquet(wav_dir, abc_dir, str(tmp_path / "m.parquet"))
    bpe = train_bpe([open(os.path.join(abc_dir, f)).read()
                     for f in os.listdir(abc_dir)], vocab_size=300,
                    special_tokens=list(ABC_SPECIALS))
    ds = waveform_dataset(parquet, batch_size=3, n_samples=16000,
                          tokenizer=bpe, max_tokens=64, shuffle=False)
    batch = next(iter(ds))
    assert batch["waveform"].shape == (3, 16000)
    assert batch["input_ids"].shape == (3, 64)
    assert (batch["input_ids"][:, 0] == bpe.vocab["<abc_start>"]).all()
    assert batch["attention_mask"].sum() > 6
