"""music2midi 4-stage preprocessing pipeline + dataset loader.

Rebuilds .charles/music2midi/preprocess_data.py end to end, with the external
binaries replaced by in-framework components:

  stage 1  midi2wav    — tempo-aware cut to CHUNK_DURATION then synth render
                         (reference :54-147; music21 cut + fluidsynth there)
  stage 2  midi2abc    — ABC emission (reference :150-168; midi2abc binary)
  stage 3  gentokens   — raw token vocab (:311-361) or BPE training (:363-472)
  stage 4  genparquet  — typed pyarrow schema with waveform + abc + metadata
                         + processing_success (:474-632)

Host parallelism keeps the reference's Pool shape (:264-271, :298-305).
``MusicDataset`` mirrors music2midi/dataset.py:22-93: success-filtered rows,
ABC tokenized to fixed-length padded ids.
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass
from multiprocessing import Pool, cpu_count
from typing import Dict, List, Optional, Tuple

import numpy as np

from audax.core.config import DataGenConfig
from audax.core.logging import get_logger
from audax.data.audio_io import read_wav, to_mono, write_wav
from audax.symbolic.abc import extract_abc_metadata, extract_tokens, midi_to_abc
from audax.symbolic.bpe import BPE, train_bpe
from audax.symbolic.midi import MidiFile

log = get_logger("audax.music2midi")

__all__ = ["stage_midi2wav", "stage_midi2abc", "stage_gentokens_raw",
           "stage_gentokens_bpe", "stage_genparquet", "MusicDataset",
           "ABC_SPECIALS"]

ABC_SPECIALS = ("<abc_start>", "<abc_end>", "<abc_pad>")


# ---------------------------------------------------------------- stage 1 --
def _midi2wav_one(args) -> Tuple[str, bool, str]:
    path, out_dir, chunk_s, sample_rate, soundfont = args
    try:
        mf = MidiFile.load(path)
        if chunk_s and mf.duration_seconds > chunk_s:
            mf = mf.cut(chunk_s)
        if not mf.notes:
            return path, False, "no notes"
        from audax.data.synth import render_midi
        audio = render_midi(mf, sample_rate, soundfont)
        stem = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(out_dir, f"{stem}.wav")
        write_wav(out, audio, sample_rate)
        # save the cut midi beside it so stage 2 sees the same content
        mf.save(os.path.join(out_dir, f"{stem}.mid"))
        return path, True, out
    except Exception as e:
        return path, False, str(e)


def stage_midi2wav(midi_dir: str, out_dir: str, cfg: DataGenConfig,
                   *, workers: Optional[int] = None) -> List[str]:
    """Chop every .mid to cfg.chunk_duration_s and render at 16 kHz."""
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(midi_dir, "**", "*.mid"),
                             recursive=True))
    args = [(p, out_dir, cfg.chunk_duration_s, cfg.sample_rate, cfg.soundfont)
            for p in paths]
    workers = workers or max(1, cpu_count() // 2)
    results = []
    if workers > 1 and len(args) > 1:
        with Pool(workers) as pool:
            results = list(pool.imap_unordered(_midi2wav_one, args))
    else:
        results = [_midi2wav_one(a) for a in args]
    ok = [r[2] for r in results if r[1]]
    for path, success, msg in results:
        if not success:
            log.warning("midi2wav failed %s: %s", path, msg)
    log.success("midi2wav: %d/%d rendered -> %s", len(ok), len(paths), out_dir)
    return ok


# ---------------------------------------------------------------- stage 2 --
def _midi2abc_one(args) -> Tuple[str, bool, str]:
    path, out_dir = args
    try:
        mf = MidiFile.load(path)
        stem = os.path.splitext(os.path.basename(path))[0]
        abc = midi_to_abc(mf, title=stem)
        out = os.path.join(out_dir, f"{stem}.abc")
        with open(out, "w") as fh:
            fh.write(abc)
        return path, True, out
    except Exception as e:
        return path, False, str(e)


def stage_midi2abc(midi_dir: str, out_dir: str,
                   *, workers: Optional[int] = None) -> List[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(midi_dir, "**", "*.mid"),
                             recursive=True))
    args = [(p, out_dir) for p in paths]
    workers = workers or max(1, cpu_count() // 4)
    if workers > 1 and len(args) > 1:
        with Pool(workers) as pool:
            results = list(pool.imap_unordered(_midi2abc_one, args))
    else:
        results = [_midi2abc_one(a) for a in args]
    ok = [r[2] for r in results if r[1]]
    log.success("midi2abc: %d/%d converted -> %s", len(ok), len(paths), out_dir)
    return ok


# ---------------------------------------------------------------- stage 3 --
def stage_gentokens_raw(abc_dir: str, out_json: str) -> Dict[str, int]:
    """Raw token vocab over all ABC files -> token->id JSON
    (reference :311-361)."""
    vocab: Dict[str, int] = {}
    for sp in ("<pad>", "<s>", "</s>", "<unk>", *ABC_SPECIALS):
        vocab[sp] = len(vocab)
    for path in sorted(glob.glob(os.path.join(abc_dir, "*.abc"))):
        with open(path) as fh:
            for tok in extract_tokens(fh.read()):
                if tok not in vocab:
                    vocab[tok] = len(vocab)
    os.makedirs(os.path.dirname(out_json) or ".", exist_ok=True)
    with open(out_json, "w") as fh:
        json.dump(vocab, fh, ensure_ascii=False, indent=0)
    log.success("gentokens-raw: %d tokens -> %s", len(vocab), out_json)
    return vocab


def stage_gentokens_bpe(abc_dir: str, out_dir: str,
                        vocab_size: int = 2000) -> BPE:
    """Train byte-level BPE over the ABC corpus with the reference's special
    tokens (vocab 2000, <abc_start/end/pad>; reference :363-472)."""
    corpus = []
    for path in sorted(glob.glob(os.path.join(abc_dir, "*.abc"))):
        with open(path) as fh:
            corpus.append(fh.read())
    bpe = train_bpe(corpus, vocab_size, special_tokens=list(ABC_SPECIALS),
                    min_frequency=2)
    bpe.save(out_dir)
    log.success("gentokens-bpe: vocab %d (%d merges) -> %s",
                len(bpe), len(bpe.merges), out_dir)
    return bpe


# ---------------------------------------------------------------- stage 4 --
def _music_schema():
    import pyarrow as pa
    return pa.schema([
        ("filename", pa.string()),
        ("waveform", pa.list_(pa.float32())),
        ("sample_rate", pa.int32()),
        ("duration", pa.float32()),
        ("abc_string", pa.string()),
        ("abc_tokens", pa.int32()),
        ("tempo", pa.int32()),
        ("key_signature", pa.string()),
        ("time_signature", pa.string()),
        ("processing_success", pa.bool_()),
    ])


def stage_genparquet(wav_dir: str, abc_dir: str, out_parquet: str,
                     *, batch_rows: int = 64) -> str:
    """Pair wavs+ABCs by stem into the typed Parquet (reference schema
    :487-501; batched writer :534-608; post-hoc stats :618-630)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    wavs = {os.path.splitext(os.path.basename(p))[0]: p
            for p in glob.glob(os.path.join(wav_dir, "*.wav"))}
    abcs = {os.path.splitext(os.path.basename(p))[0]: p
            for p in glob.glob(os.path.join(abc_dir, "*.abc"))}
    stems = sorted(set(wavs) | set(abcs))
    os.makedirs(os.path.dirname(out_parquet) or ".", exist_ok=True)
    writer = pq.ParquetWriter(out_parquet, _music_schema())
    batch: List[dict] = []
    n_ok = 0

    def flush():
        nonlocal batch
        if not batch:
            return
        cols = {k: [r[k] for r in batch] for k in batch[0]}
        writer.write_table(pa.table(cols, schema=_music_schema()))
        batch = []

    for stem in stems:
        row = {"filename": stem, "waveform": np.zeros(0, np.float32),
               "sample_rate": 0, "duration": 0.0, "abc_string": "",
               "abc_tokens": 0, "tempo": 0, "key_signature": "",
               "time_signature": "", "processing_success": False}
        try:
            if stem not in wavs or stem not in abcs:
                raise FileNotFoundError("missing wav or abc")
            x, rate = read_wav(wavs[stem])
            x = to_mono(x).astype(np.float32)
            with open(abcs[stem]) as fh:
                abc = fh.read()
            md = extract_abc_metadata(abc)
            row.update({
                "waveform": x, "sample_rate": rate,
                "duration": len(x) / rate, "abc_string": abc,
                "abc_tokens": len(extract_tokens(abc)),
                "tempo": md.tempo or 0, "key_signature": md.key or "",
                "time_signature": md.meter or "",
                "processing_success": True,
            })
            n_ok += 1
        except Exception as e:
            log.warning("genparquet %s: %s", stem, e)
        batch.append(row)
        if len(batch) >= batch_rows:
            flush()
    flush()
    writer.close()
    log.success("genparquet: %d/%d ok -> %s", n_ok, len(stems), out_parquet)
    return out_parquet


# ----------------------------------------------------------------- loader --
@dataclass
class MusicExample:
    waveform: np.ndarray
    sample_rate: int
    input_ids: np.ndarray
    attention_mask: np.ndarray
    abc: str
    filename: str


class MusicDataset:
    """Parquet-backed dataset: success rows only; ABC -> fixed-length padded
    ids with <abc_start>/<abc_end> wrapping (reference dataset.py:48-94)."""

    def __init__(self, parquet_path: str, tokenizer: BPE, *,
                 max_tokens: int = 512):
        import pyarrow.parquet as pq
        df = pq.read_table(parquet_path).to_pandas()
        self.df = df[df["processing_success"]].reset_index(drop=True)
        self.tokenizer = tokenizer
        self.max_tokens = max_tokens
        vocab = tokenizer.vocab
        self.start_id = vocab.get(ABC_SPECIALS[0], 0)
        self.end_id = vocab.get(ABC_SPECIALS[1], 0)
        self.pad_id = vocab.get(ABC_SPECIALS[2], 0)

    def __len__(self) -> int:
        return len(self.df)

    def __getitem__(self, i: int) -> MusicExample:
        row = self.df.iloc[i]
        ids = [self.start_id] + self.tokenizer.encode(
            row["abc_string"], with_specials=False) + [self.end_id]
        ids = ids[: self.max_tokens]
        mask = np.zeros(self.max_tokens, np.int32)
        mask[: len(ids)] = 1
        padded = np.full(self.max_tokens, self.pad_id, np.int32)
        padded[: len(ids)] = ids
        return MusicExample(
            waveform=np.asarray(row["waveform"], np.float32),
            sample_rate=int(row["sample_rate"]),
            input_ids=padded, attention_mask=mask,
            abc=row["abc_string"], filename=row["filename"])

    def examples(self):
        for i in range(len(self)):
            yield self[i]
