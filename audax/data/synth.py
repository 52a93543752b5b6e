"""Synthetic MIDI->audio dataset generation.

Rebuilds both reference generators on top of the C++ synth:
  * ``make_midi_dataset`` — N random short piano melodies rendered to 16 kHz
    wavs + ``mididataset.csv`` with ``<|MIDI|> <note names> <|/MIDI|>``
    labels (reference: AB/synthDataset.py:43-91 — duration/gap grids,
    velocity 100; AB/midiDatasetGen.py tick-math variant).
  * ``piano_full_range`` — the 88-key sweep artifact (synthDataset.py:111-137).

Rendering prefers a soundfont (native Sf2Synth); falls back to the additive
C++ synth, then to a numpy synth if the toolchain is unavailable.
"""

from __future__ import annotations

import csv
import os
from typing import List, Optional, Tuple

import numpy as np

from audax.core.config import DataGenConfig
from audax.core.logging import get_logger
from audax.data.audio_io import write_wav
from audax.symbolic.midi import MidiFile, Note, Tempo, note_number_to_name

log = get_logger("audax.datagen")

__all__ = ["make_midi_dataset", "piano_full_range", "render_midi",
           "MIDI_LABEL_START", "MIDI_LABEL_END"]

MIDI_LABEL_START = "<|MIDI|>"
MIDI_LABEL_END = "<|/MIDI|>"

# duration / gap grids in the reference's style (AB/synthDataset.py:50-51
# uses durations 0.1-0.3 s / gaps 0.1-0.5 s; ours are longer so the C++
# synth's note envelopes are fully audible at 16 kHz)
_DURATIONS = (0.25, 0.5, 0.75, 1.0)
_GAPS = (0.0, 0.125, 0.25)


def _numpy_fallback_synth(mf: MidiFile, sample_rate: int) -> np.ndarray:
    out = np.zeros(int((mf.duration_seconds + 0.3) * sample_rate) + 1,
                   np.float32)
    for start, end, n in mf.notes_with_times():
        f0 = 440.0 * 2 ** ((n.pitch - 69) / 12)
        t = np.arange(int((end - start + 0.05) * sample_rate)) / sample_rate
        env = np.minimum(1.0, t / 0.005) * np.exp(-2.0 * t)
        sig = 0.2 * (n.velocity / 127.0) * env * np.sin(2 * np.pi * f0 * t)
        i0 = int(start * sample_rate)
        out[i0: i0 + len(sig)] += sig.astype(np.float32)
    peak = np.abs(out).max()
    if peak > 0.99:
        out *= 0.99 / peak
    return out


def render_midi(mf: MidiFile, sample_rate: int = 16000,
                soundfont: Optional[str] = None,
                program: int = 0) -> np.ndarray:
    """Render through the best available backend."""
    try:
        from audax.native.bindings import Sf2Synth, render_simple
        if soundfont:
            return Sf2Synth(soundfont).render(mf, sample_rate, program=program)
        return render_simple(mf, sample_rate)
    except Exception as e:
        log.warning("native synth unavailable (%s); numpy fallback", e)
        return _numpy_fallback_synth(mf, sample_rate)


def _random_melody(rng: np.random.Generator, n_notes: int, velocity: int,
                   *, low: int = 36, high: int = 96,
                   ticks_per_beat: int = 480) -> Tuple[MidiFile, List[str]]:
    mf = MidiFile(ticks_per_beat=ticks_per_beat)
    mf.tempos.append(Tempo(0, 500000))              # 120 BPM: 1 beat = 0.5 s
    tick = 0
    names = []

    def to_ticks(sec: float) -> int:
        return int(round(sec / 0.5 * ticks_per_beat))

    for _ in range(n_notes):
        pitch = int(rng.integers(low, high + 1))
        dur = float(rng.choice(_DURATIONS))
        gap = float(rng.choice(_GAPS))
        mf.notes.append(Note(tick, to_ticks(dur), pitch, velocity))
        names.append(note_number_to_name(pitch))
        tick += to_ticks(dur + gap)
    return mf, names


def make_midi_dataset(cfg: DataGenConfig, *,
                      write_midi: bool = True) -> str:
    """Generate cfg.num_items melodies; write wav (+ optional mid) files and
    ``mididataset.csv`` (columns: filename, labels). Returns the CSV path."""
    rng = np.random.default_rng(cfg.seed)
    os.makedirs(cfg.out_dir, exist_ok=True)
    wav_dir = os.path.join(cfg.out_dir, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    csv_path = os.path.join(cfg.out_dir, "mididataset.csv")

    rows = []
    synth = None
    if cfg.soundfont:
        try:
            from audax.native.bindings import Sf2Synth
            synth = Sf2Synth(cfg.soundfont)
        except Exception as e:
            log.warning("soundfont load failed (%s); fallback synth", e)
    for i in range(cfg.num_items):
        mf, names = _random_melody(rng, cfg.notes_per_item, cfg.velocity)
        wav_path = os.path.join(wav_dir, f"midi_{i:05d}.wav")
        try:
            audio = (synth.render(mf, cfg.sample_rate) if synth
                     else render_midi(mf, cfg.sample_rate))
            write_wav(wav_path, audio, cfg.sample_rate)
            if write_midi:
                mf.save(os.path.splitext(wav_path)[0] + ".mid")
            label = f"{MIDI_LABEL_START} {' '.join(names)} {MIDI_LABEL_END}"
            rows.append({"filename": wav_path, "labels": label})
        except Exception as e:                      # per-item tolerance
            log.warning("item %d failed: %s", i, e)
    with open(csv_path, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=["filename", "labels"])
        w.writeheader()
        w.writerows(rows)
    log.success("wrote %s (%d items)", csv_path, len(rows))
    return csv_path


def piano_full_range(path: str, *, note_seconds: float = 0.5,
                     ticks_per_beat: int = 480) -> MidiFile:
    """88-key ascending sweep A0..C8 (reference: synthDataset.py:111-137)."""
    mf = MidiFile(ticks_per_beat=ticks_per_beat)
    mf.tempos.append(Tempo(0, 500000))
    ticks = int(round(note_seconds / 0.5 * ticks_per_beat))
    for i, pitch in enumerate(range(21, 109)):      # A0..C8
        mf.notes.append(Note(i * ticks, ticks, pitch, 100))
    if path:
        mf.save(path)
    return mf
