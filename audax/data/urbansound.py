"""UrbanSound8K dataset: Parquet preprocessing + loading.

Output contract matches the reference so datasets interoperate (reference:
.charles/spectrogram.py:120-182 writes rows of flattened float32 log-mel +
shape + fold + classID; schema documented in .charles/urbansound8k_sql.md:71-110):

    columns: slice_file_name (str), fold (int32), class_id (int32),
             class_name (str), log_mel (list<float32> flattened),
             mel_shape (list<int32> = [n_mels, T]), processing_success (bool)

The reference computed one clip at a time with a host->GPU round trip per
file (SURVEY.md §3.1). Here clips are decoded on host workers, padded to the
4 s contract, and featurized in large device batches through the fused
kernel — the per-file device boundary disappears.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np

from audax.core.config import MelConfig, UrbanSoundConfig
from audax.core.logging import get_logger
from audax.data.audio_io import read_wav, resample, to_mono
from audax.eval.metrics import URBANSOUND8K_CLASSES

__all__ = ["preprocess_to_parquet", "load_split", "parquet_name"]

log = get_logger("audax.data.urbansound")


def parquet_name(mel: MelConfig, split: str = "") -> str:
    """Config-stamped parquet filename (reference: spectrogram.py:94-100)."""
    tag = f"_{split}" if split else ""
    return (f"urbansound8k{tag}_mels{mel.n_mels}_hop{mel.hop_length}"
            f"_fft{mel.n_fft}.parquet")


def _schema():
    import pyarrow as pa
    return pa.schema([
        ("slice_file_name", pa.string()),
        ("fold", pa.int32()),
        ("class_id", pa.int32()),
        ("class_name", pa.string()),
        ("log_mel", pa.list_(pa.float32())),
        ("mel_shape", pa.list_(pa.int32())),
        ("processing_success", pa.bool_()),
    ])


def preprocess_to_parquet(
    cfg: UrbanSoundConfig,
    mel: MelConfig,
    out_path: Optional[str] = None,
    *,
    batch_size: int = 64,
    frontend=None,
    limit: Optional[int] = None,
) -> str:
    """Walk UrbanSound8K.csv, decode+resample+pad clips on host, featurize in
    device batches, write one Parquet. Failed clips are recorded with
    processing_success=False rather than dropped (the reference engineered
    the same queryable-failure column, preprocess_data.py:499,573-588)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from audax.frontend import LogMelFrontend

    frontend = frontend or LogMelFrontend(mel)
    meta = pd.read_csv(os.path.join(cfg.dataset_root, cfg.metadata_csv))
    if limit:
        meta = meta.iloc[:limit]
    out_path = out_path or os.path.join(cfg.parquet_dir, parquet_name(mel))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)

    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import jax.numpy as jnp

    n_samples = int(cfg.duration_s * mel.sample_rate)
    writer = pq.ParquetWriter(out_path, _schema())
    rows: list = []
    wavs: list = []
    exact16 = True                # whole batch int16-exact?

    # Host<->device pipelining (round 5). The naive loop was pure wall
    # time on the tunneled chip: per 256-clip batch, 2.6 s f32 upload +
    # 1.9 s feature download + ~1.7 s host Arrow prep, all serialized.
    # Three changes, all exact:
    #   * PCM-16 provenance (read_wav with_bits): mono 16-bit sources at
    #     the target rate upload as int16 — half the bytes — and dequant
    #     on device inside the featurize jit (q/32768 round-trips
    #     exactly, so the output is bit-identical to the f32 path);
    #   * the log_mel column is built zero-copy from the fetched [B,M,T]
    #     block via ListArray.from_arrays instead of 256 per-row copies;
    #   * ONE writer thread owns every ParquetWriter access: the fetch +
    #     write of batch k-1 (network + Arrow, GIL-free for the network
    #     part) overlaps reading and dispatching batch k. Row order =
    #     submission order; one job in flight bounds memory.
    pool = ThreadPoolExecutor(max_workers=1)
    jobs: deque = deque()

    @jax.jit
    def _featurize_i16(q):
        return frontend(q.astype(jnp.float32) / 32768.0, mel_first=True)

    def _fetch_write(prows, feats_dev):
        feats = np.asarray(feats_dev)                   # [B, n_mels, T]
        b = feats.shape[0]
        flat = np.ascontiguousarray(feats.reshape(b, -1).astype(
            np.float32, copy=False)).ravel()
        per = feats.shape[1] * feats.shape[2]
        offsets = pa.array(np.arange(b + 1, dtype=np.int32) * per)
        log_mel = pa.ListArray.from_arrays(offsets, pa.array(flat))
        shp = np.tile(np.asarray(feats.shape[1:], np.int32), b)
        shp_off = pa.array(np.arange(b + 1, dtype=np.int32) * 2)
        mel_shape = pa.ListArray.from_arrays(shp_off, pa.array(shp))
        table = pa.table({
            "slice_file_name": [r["slice_file_name"] for r in prows],
            "fold": [r["fold"] for r in prows],
            "class_id": [r["class_id"] for r in prows],
            "class_name": [r["class_name"] for r in prows],
            "log_mel": log_mel,
            "mel_shape": mel_shape,
            "processing_success": [True] * b,
        }, schema=_schema())
        writer.write_table(table)

    def _write_fail(rec):
        writer.write_table(pa.table({
            "slice_file_name": [rec["slice_file_name"]],
            "fold": [rec["fold"]], "class_id": [rec["class_id"]],
            "class_name": [rec["class_name"]],
            "log_mel": [np.zeros(0, np.float32)],
            "mel_shape": [np.zeros(0, np.int32)],
            "processing_success": [False],
        }, schema=_schema()))

    def flush():
        nonlocal rows, wavs, exact16
        if not wavs:
            return
        batch = np.stack(wavs)                          # [B, n_samples]
        if exact16:
            q = np.clip(np.rint(batch * 32768.0), -32768, 32767) \
                .astype(np.int16)
            feats_dev = _featurize_i16(jnp.asarray(q))
        else:
            feats_dev = frontend(jnp.asarray(batch), mel_first=True)
        while len(jobs) > 1:      # keep one fetch+write in flight
            jobs.popleft().result()
        jobs.append(pool.submit(_fetch_write, rows, feats_dev))
        rows, wavs = [], []
        exact16 = True

    failed = 0
    for _, r in meta.iterrows():
        rec = {"slice_file_name": r["slice_file_name"], "fold": int(r["fold"]),
               "class_id": int(r["classID"]),
               "class_name": str(r.get("class", URBANSOUND8K_CLASSES[int(r["classID"])]))}
        path = os.path.join(cfg.dataset_root, "audio", f"fold{rec['fold']}",
                            rec["slice_file_name"])
        try:
            x, rate, bits = read_wav(path, with_bits=True)
            mono = x.shape[1] == 1
            x = to_mono(x)
            if rate != mel.sample_rate:
                x = resample(x, rate, mel.sample_rate)
            if len(x) >= n_samples:
                x = x[:n_samples]
            else:
                x = np.pad(x, (0, n_samples - len(x)))
            # int16 upload stays exact only for untouched PCM-16 data
            # (pad/trim preserve exactness; downmix/resample don't)
            exact16 = exact16 and bits == 16 and mono \
                and rate == mel.sample_rate
            wavs.append(x.astype(np.float32))
            rows.append(rec)
        except Exception as e:
            failed += 1
            log.warning("skip %s: %s", path, e)
            jobs.append(pool.submit(_write_fail, rec))
        if len(wavs) >= batch_size:
            flush()
    flush()
    while jobs:
        jobs.popleft().result()
    pool.shutdown(wait=True)
    writer.close()
    log.success("wrote %s (%d rows, %d failed)", out_path, len(meta), failed)
    return out_path


def load_split(parquet_path: str, folds: Sequence[int], *,
               time_major: bool = True) -> Dict[str, np.ndarray]:
    """Read a fold subset into dict arrays for the train loop.

    Returns {"x": [N, T, n_mels] (time_major) float32, "y": [N] int64,
    "file": [N] str}. Reconstructs [n_mels, T] from flat+shape per row
    (reference: spectrogram.py:204-212).
    """
    import pyarrow.parquet as pq

    table = pq.read_table(parquet_path)
    df = table.to_pandas()
    df = df[df["processing_success"] & df["fold"].isin(list(folds))]
    xs = []
    for flat, shape in zip(df["log_mel"], df["mel_shape"]):
        feat = np.asarray(flat, np.float32).reshape(tuple(shape))
        xs.append(feat.T if time_major else feat)
    return {
        "x": np.stack(xs) if xs else np.zeros((0, 0, 0), np.float32),
        "y": df["class_id"].to_numpy(np.int64),
        "file": df["slice_file_name"].to_numpy(),
    }
