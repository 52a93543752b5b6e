"""ABC notation: emitter (MIDI -> ABC), metadata extraction, tokenization.

In-framework replacement for the external ``midi2abc`` C binary and the
reference's regex layers (reference: midi2abc subprocess at
.charles/music2midi/preprocess_data.py:150-168; token regex :176-211;
metadata extraction :213-248).

The emitter is tempo-map aware: note times come from MidiFile's tick domain,
quantized to the unit note length, grouped into chords, barred by the time
signature.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from fractions import Fraction
from typing import Dict, List, Optional, Tuple

from audax.symbolic.midi import KeySignature, MidiFile

__all__ = ["midi_to_abc", "extract_abc_metadata", "extract_tokens",
           "AbcMetadata"]

_SHARP_NAMES = ["C", "^C", "D", "^D", "E", "F", "^F", "G", "^G", "A", "^A", "B"]
_FLAT_NAMES = ["C", "_D", "D", "_E", "E", "F", "_G", "G", "_A", "A", "_B", "B"]


def _pitch_to_abc(pitch: int, *, flats: bool = False) -> str:
    """MIDI pitch -> ABC note. ABC middle C (C4, MIDI 60) is ``C``; octave up
    is lowercase, further octaves use ' and , marks."""
    names = _FLAT_NAMES if flats else _SHARP_NAMES
    base = names[pitch % 12]
    octave = pitch // 12 - 1                       # MIDI octave (C4 = 60)
    if octave >= 5:
        return base.lower() + "'" * (octave - 5)
    return base + "," * (4 - octave)


def _dur_to_abc(units: Fraction) -> str:
    """Duration in unit-note-lengths -> ABC suffix ('' for 1, '2', '/2',
    '3/2', ...)."""
    if units == 1:
        return ""
    if units.denominator == 1:
        return str(units.numerator)
    if units.numerator == 1 and units.denominator == 2:
        return "/"
    return f"{units.numerator}/{units.denominator}"


def midi_to_abc(
    mf: MidiFile,
    *,
    title: str = "untitled",
    unit: Fraction = Fraction(1, 8),
    index: int = 1,
    max_denominator: int = 4,
) -> str:
    """Render a MidiFile as single-voice ABC (simultaneous notes become
    chords ``[CEG]``). Quantization grid = unit/max_denominator."""
    ts = mf.time_signatures[0] if mf.time_signatures else None
    meter_num, meter_den = (ts.numerator, ts.denominator) if ts else (4, 4)
    key = mf.key_signatures[0] if mf.key_signatures else KeySignature(0, 0)
    tempo = mf.tempos[0] if mf.tempos else None
    bpm = round(tempo.bpm) if tempo else 120
    flats = key.sharps < 0

    # quantize to grid in unit-note-lengths
    beat_units = Fraction(1, 4) / unit             # units per quarter note
    grid = Fraction(1, max_denominator)

    def to_units(tick: int) -> Fraction:
        beats = Fraction(tick, mf.ticks_per_beat)
        return (beats * beat_units).limit_denominator(max_denominator * 8)

    def snap(u: Fraction) -> Fraction:
        return Fraction(round(u / grid)) * grid

    events: Dict[Fraction, List[Tuple[int, Fraction]]] = {}
    for n in mf.notes:
        start = snap(to_units(n.start_tick))
        dur = max(snap(to_units(n.duration_tick)), grid)
        events.setdefault(start, []).append((n.pitch, dur))

    bar_units = Fraction(meter_num, meter_den) / unit   # units per measure
    body: List[str] = []
    cursor = Fraction(0)
    bar_fill = Fraction(0)

    def emit_bars(advance: Fraction):
        nonlocal bar_fill
        bar_fill += advance
        while bar_fill >= bar_units:
            body.append("|")
            bar_fill -= bar_units

    # single-voice ABC cannot hold a note across the next onset; truncate
    # durations at the following event's start so every note still BEGINS
    # at its true time — advancing the cursor by the full duration instead
    # would time-shift all later notes and barlines (rhythmic drift)
    starts = sorted(events)
    for i, start in enumerate(starts):
        if start > cursor:                          # rest gap
            gap = start - cursor
            body.append("z" + _dur_to_abc(gap))
            emit_bars(gap)
            cursor = start
        group = events[start]
        if i + 1 < len(starts):
            allowed = starts[i + 1] - start
            group = [(p, max(min(d, allowed), grid)) for p, d in group]
        dur = min(d for _, d in group)
        if len(group) == 1:
            body.append(_pitch_to_abc(group[0][0], flats=flats)
                        + _dur_to_abc(group[0][1]))
            dur = group[0][1]
        else:
            inner = "".join(_pitch_to_abc(p, flats=flats) + _dur_to_abc(d)
                            for p, d in sorted(group))
            body.append(f"[{inner}]")
        cursor += dur
        emit_bars(dur)
    if body and body[-1] == "|":
        body.pop()                                  # '|]' closes the bar
    body.append("|]")

    header = [
        f"X:{index}",
        f"T:{title}",
        f"M:{meter_num}/{meter_den}",
        f"L:{unit.numerator}/{unit.denominator}",
        f"Q:1/4={bpm}",
        f"K:{key.name}",
    ]
    # wrap body ~ 16 tokens per line
    lines, line = [], []
    for tok in body:
        line.append(tok)
        if tok in ("|", "|]") and len(line) >= 16:
            lines.append(" ".join(line))
            line = []
    if line:
        lines.append(" ".join(line))
    return "\n".join(header + lines) + "\n"


@dataclass
class AbcMetadata:
    title: Optional[str] = None
    meter: Optional[str] = None
    unit_length: Optional[str] = None
    tempo: Optional[int] = None
    key: Optional[str] = None


def extract_abc_metadata(abc_text: str) -> AbcMetadata:
    """Parse header fields (reference: preprocess_data.py:213-248)."""
    md = AbcMetadata()
    for line in abc_text.splitlines():
        line = line.strip()
        if line.startswith("T:"):
            md.title = line[2:].strip()
        elif line.startswith("M:"):
            md.meter = line[2:].strip()
        elif line.startswith("L:"):
            md.unit_length = line[2:].strip()
        elif line.startswith("Q:"):
            m = re.search(r"=\s*(\d+)", line)
            md.tempo = int(m.group(1)) if m else None
            if md.tempo is None:
                m = re.match(r"Q:\s*(\d+)\s*$", line)
                md.tempo = int(m.group(1)) if m else None
        elif line.startswith("K:"):
            md.key = line[2:].strip()
    return md


_TOKEN_PATTERN = re.compile(
    r"(?P<header>^[XTMLQKVPZNRSOWmw]:[^\n]*$)"
    r"|(?P<chordsym>\"[^\"]*\")"
    r"|(?P<chord>\[[^\]\n]+\])"
    r"|(?P<note>[_^=]{0,2}[a-gA-G][,']*\d*(?:/\d*)?)"
    r"|(?P<rest>[zZxX]\d*(?:/\d*)?)"
    r"|(?P<bar>\|\]|\[\||\|\||:\||\|:|::|\|)"
    r"|(?P<tuplet>\(\d)"
    r"|(?P<tie>-)",
    re.MULTILINE,
)


def extract_tokens(abc_text: str, *, drop_path_tokens: bool = True
                   ) -> List[str]:
    """ABC text -> token list: header lines whole, chords, annotated notes
    (accidental+octave+duration), rests, barlines, tuplet markers, ties
    (reference regex semantics, preprocess_data.py:176-211 including the
    path-pollution filter :200-209)."""
    tokens = []
    for m in _TOKEN_PATTERN.finditer(abc_text):
        tok = m.group(0)
        if drop_path_tokens and ("/" in tok and any(
                s in tok for s in (".mid", ".abc", "/home", "/tmp", "\\"))):
            continue
        tokens.append(tok)
    return tokens
