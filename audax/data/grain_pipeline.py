"""grain-backed input pipelines.

The BASELINE north star: "a grain loader that streams rendered audio
straight into on-device feature extraction". These pipelines produce
fixed-shape numpy batches on host workers; features are computed on device
by the fused frontend (the caller jits that part), so the host never touches
mel math.

Two sources:
  * ``urbansound_dataset``  — precomputed-feature Parquet (training loop)
  * ``waveform_dataset``    — raw-waveform Parquet/music rows, padded to a
    fixed length (two-tower / fine-tune loops; device featurization)
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import grain

__all__ = ["urbansound_dataset", "waveform_dataset"]


def urbansound_dataset(
    parquet_path: str,
    folds: Sequence[int],
    *,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    epochs: Optional[int] = 1,
    drop_remainder: bool = True,
) -> grain.IterDataset:
    """Fold-filtered UrbanSound features -> batched {"x": [B,T,M], "y": [B]}.

    grain owns shuffling/epoching/prefetch; rows are materialized once
    (the feature Parquet is small — ~2 GB for the full 8732-clip v2 set).
    """
    from audax.data.urbansound import load_split

    split = load_split(parquet_path, folds)
    n = len(split["y"])
    records = [{"x": split["x"][i], "y": split["y"][i]} for i in range(n)]
    ds = grain.MapDataset.source(records)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    if epochs is not None:
        ds = ds.repeat(epochs)
    else:
        ds = ds.repeat()
    return ds.to_iter_dataset().batch(batch_size,
                                      drop_remainder=drop_remainder)


def waveform_dataset(
    parquet_path: str,
    *,
    batch_size: int,
    n_samples: int,
    seed: int = 0,
    shuffle: bool = True,
    epochs: Optional[int] = 1,
    drop_remainder: bool = True,
    tokenizer=None,
    max_tokens: int = 512,
) -> grain.IterDataset:
    """music_dataset Parquet -> batched {"waveform": [B, n_samples], and when
    a tokenizer is given, "input_ids"/"attention_mask": [B, max_tokens]}.
    Waveforms are pad-or-trimmed to ``n_samples`` on host workers."""
    import pyarrow.parquet as pq

    from audax.data.music_dataset import ABC_SPECIALS

    df = pq.read_table(parquet_path).to_pandas()
    df = df[df["processing_success"]].reset_index(drop=True)
    rows = [{"waveform": np.asarray(w, np.float32), "abc": a}
            for w, a in zip(df["waveform"], df["abc_string"])]

    start_id = end_id = pad_id = 0
    if tokenizer is not None:
        start_id = tokenizer.vocab.get(ABC_SPECIALS[0], 0)
        end_id = tokenizer.vocab.get(ABC_SPECIALS[1], 0)
        pad_id = tokenizer.vocab.get(ABC_SPECIALS[2], 0)

    def prepare(row: Dict) -> Dict:
        w = row["waveform"][:n_samples]
        wav = np.zeros(n_samples, np.float32)
        wav[: len(w)] = w
        out = {"waveform": wav}
        if tokenizer is not None:
            ids = [start_id] + tokenizer.encode(
                row["abc"], with_specials=False) + [end_id]
            if len(ids) > max_tokens:
                # keep the end token on truncation: the longest samples
                # would otherwise be the only ones that never show <abc_end>
                ids = ids[: max_tokens - 1] + [end_id]
            padded = np.full(max_tokens, pad_id, np.int32)
            padded[: len(ids)] = ids
            mask = np.zeros(max_tokens, np.int32)
            mask[: len(ids)] = 1
            out["input_ids"] = padded
            out["attention_mask"] = mask
        return out

    ds = grain.MapDataset.source(rows)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    ds = ds.repeat(epochs) if epochs is not None else ds.repeat()
    return (ds.map(prepare)
              .to_iter_dataset()
              .batch(batch_size, drop_remainder=drop_remainder))
