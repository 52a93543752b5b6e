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
           "MIDI_LABEL_START", "MIDI_LABEL_END", "SYNTH_CLASSES",
           "make_synthetic_urbansound"]

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


#: chord shapes for polyphonic datagen: intervals stacked above the root
#: (major / minor triads, bare fifth, octave double) — the same vocabulary
#: symbolic/chords.py emits, so midi_to_abc's chord grouping and the ABC
#: parser's [CEG] path are exercised by the learned loop, not just unit
#: tests (reference target corpus is real polyphonic MIDI,
#: .charles/music2midi/README.md:28-90)
_CHORD_SHAPES = ((4, 7), (3, 7), (7,), (12,))


def _random_melody(rng: np.random.Generator, n_notes: int, velocity: int,
                   *, low: int = 36, high: int = 96,
                   ticks_per_beat: int = 480,
                   velocity_jitter: int = 0,
                   jitter_rng: Optional[np.random.Generator] = None,
                   max_poly: int = 1,
                   ) -> Tuple[MidiFile, List[str]]:
    """``max_poly`` > 1 turns events into chords: each event keeps its
    root draw, then with probability 1/2 stacks a random ``_CHORD_SHAPES``
    subset (up to ``max_poly`` simultaneous pitches). At the default
    ``max_poly=1`` no extra rng draws happen, so every pre-existing seed
    reproduces its exact historical melody; the polyphonic stream is a
    distinct distribution, not a superset of the mono one."""
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
        vel = velocity
        if velocity_jitter > 0:
            # jitters draw from their OWN stream so turning augmentation
            # on/off never changes which melodies a seed generates (labels
            # stay comparable across clean/augmented runs)
            vel = int(np.clip(velocity + (jitter_rng or rng).integers(
                -velocity_jitter, velocity_jitter + 1), 1, 127))
        pitches = [pitch]
        if max_poly > 1 and rng.random() < 0.5:
            shape = _CHORD_SHAPES[int(rng.integers(len(_CHORD_SHAPES)))]
            for iv in shape[: max_poly - 1]:
                q = pitch + iv
                if q <= high and q not in pitches:
                    pitches.append(q)
        for q in pitches:
            mf.notes.append(Note(tick, to_ticks(dur), q, vel))
        names.append("+".join(note_number_to_name(q) for q in pitches))
        tick += to_ticks(dur + gap)
    return mf, names


def _apply_audio_jitter(audio: np.ndarray, rng: np.random.Generator,
                        gain_jitter_db: float,
                        noise_snr_db: float) -> np.ndarray:
    """Per-item gain jitter + white noise at a fixed SNR (label-preserving
    augmentations: the note identity is invariant to loudness/noise)."""
    out = audio
    if gain_jitter_db > 0.0:
        db = rng.uniform(-gain_jitter_db, gain_jitter_db)
        out = out * np.float32(10.0 ** (db / 20.0))
    if noise_snr_db > 0.0:
        rms = float(np.sqrt(np.mean(out ** 2))) or 1e-6
        noise_rms = rms / (10.0 ** (noise_snr_db / 20.0))
        out = out + noise_rms * rng.standard_normal(out.shape).astype(
            np.float32)
    # headroom clamp so jittered renders stay valid PCM
    peak = float(np.max(np.abs(out))) if out.size else 0.0
    if peak > 0.99:
        out = out * (0.99 / peak)
    return out.astype(np.float32)


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
    jit_rng = np.random.default_rng(cfg.seed + 104729)   # jitter-only stream
    for i in range(cfg.num_items):
        mf, names = _random_melody(rng, cfg.notes_per_item, cfg.velocity,
                                   velocity_jitter=cfg.velocity_jitter,
                                   jitter_rng=jit_rng)
        wav_path = os.path.join(wav_dir, f"midi_{i:05d}.wav")
        try:
            audio = (synth.render(mf, cfg.sample_rate) if synth
                     else render_midi(mf, cfg.sample_rate))
            if cfg.gain_jitter_db > 0.0 or cfg.noise_snr_db > 0.0:
                audio = _apply_audio_jitter(np.asarray(audio, np.float32),
                                            jit_rng, cfg.gain_jitter_db,
                                            cfg.noise_snr_db)
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


# ----------------------------------------------------- synthetic classes ---
#: ten synthetic sound classes with distinct spectro-temporal signatures —
#: the strongest available stand-in for UrbanSound8K (not downloadable in
#: this environment) to exercise the FULL fold protocol end-to-end
SYNTH_CLASSES = ("low_tone", "high_tone", "chirp_up", "chirp_down",
                 "noise_bursts", "pink_noise", "am_tone", "square_stack",
                 "click_train", "siren")


def _synth_clip(class_id: int, rng: np.random.Generator,
                sample_rate: int = 16000, seconds: float = 4.0) -> np.ndarray:
    n = int(seconds * sample_rate)
    t = np.arange(n) / sample_rate
    jit = float(rng.uniform(0.85, 1.15))
    amp = float(rng.uniform(0.25, 0.6))
    x = np.zeros(n)
    if class_id == 0:      # low tone + harmonics
        f0 = 180.0 * jit
        for h, g in ((1, 1.0), (2, 0.4), (3, 0.2)):
            x += g * np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6.28))
    elif class_id == 1:    # high tone
        f0 = 3000.0 * jit
        x = np.sin(2 * np.pi * f0 * t)
    elif class_id == 2:    # up-chirp
        f = 200.0 * jit + (3800.0 / seconds) * t
        x = np.sin(2 * np.pi * np.cumsum(f) / sample_rate)
    elif class_id == 3:    # down-chirp
        f = 4000.0 * jit - (3800.0 / seconds) * t
        x = np.sin(2 * np.pi * np.cumsum(np.maximum(f, 50)) / sample_rate)
    elif class_id == 4:    # gated white-noise bursts (5 Hz)
        gate = (np.sin(2 * np.pi * 5.0 * jit * t) > 0).astype(np.float64)
        x = rng.standard_normal(n) * gate
    elif class_id == 5:    # pink-ish noise (one-pole lowpass)
        w = rng.standard_normal(n)
        a = 0.97
        for i in range(1, n):
            w[i] = a * w[i - 1] + (1 - a) * w[i]
        x = w / (np.abs(w).max() + 1e-9)
    elif class_id == 6:    # AM tone (8 Hz tremolo)
        x = (0.5 + 0.5 * np.sin(2 * np.pi * 8.0 * jit * t)) \
            * np.sin(2 * np.pi * 1000.0 * jit * t)
    elif class_id == 7:    # odd-harmonic stack (square-ish)
        f0 = 440.0 * jit
        for h in (1, 3, 5, 7):
            x += np.sin(2 * np.pi * f0 * h * t) / h
    elif class_id == 8:    # click train (10 Hz impulses through a resonance)
        period = int(sample_rate / (10.0 * jit))
        x = np.zeros(n)
        x[::period] = 1.0
        ring = np.exp(-np.arange(200) / 30.0) \
            * np.sin(2 * np.pi * 1500.0 * np.arange(200) / sample_rate)
        x = np.convolve(x, ring)[:n]
    else:                  # siren: 1 Hz sinusoidal FM 500-1500 Hz
        f = 1000.0 + 500.0 * np.sin(2 * np.pi * 1.0 * jit * t)
        x = np.sin(2 * np.pi * np.cumsum(f) / sample_rate)
    x = amp * x / (np.abs(x).max() + 1e-9)
    x += 0.01 * rng.standard_normal(n)                  # noise floor
    return x.astype(np.float32)


def make_synthetic_urbansound(root: str, *, per_fold: int = 10,
                              sample_rate: int = 16000,
                              seed: int = 0) -> str:
    """Write a synthetic dataset in the exact UrbanSound8K layout
    (audio/fold{1..10}/<name>.wav + metadata/UrbanSound8K.csv with
    slice_file_name/fold/classID/class columns — the contract
    data/urbansound.py:preprocess_to_parquet consumes). Returns ``root``."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    rows = []
    for fold in range(1, 11):
        d = os.path.join(root, "audio", f"fold{fold}")
        os.makedirs(d, exist_ok=True)
        for i in range(per_fold):
            cid = int(rng.integers(0, len(SYNTH_CLASSES))) \
                if per_fold < len(SYNTH_CLASSES) else i % len(SYNTH_CLASSES)
            name = f"f{fold}_{i:03d}_{cid}.wav"
            write_wav(os.path.join(d, name),
                      _synth_clip(cid, rng, sample_rate), sample_rate)
            rows.append({"slice_file_name": name, "fold": fold,
                         "classID": cid, "class": SYNTH_CLASSES[cid]})
    os.makedirs(os.path.join(root, "metadata"), exist_ok=True)
    pd.DataFrame(rows).to_csv(
        os.path.join(root, "metadata", "UrbanSound8K.csv"), index=False)
    log.success("synthetic urbansound: %d clips -> %s", len(rows), root)
    return root
