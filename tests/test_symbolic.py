"""MIDI codec, tempo map, cut, ABC emitter/tokenizer, chord parser tests."""

from fractions import Fraction

import pytest

from audax.symbolic.abc import extract_abc_metadata, extract_tokens, midi_to_abc
from audax.symbolic.chords import chords_to_midi, parse_chord
from audax.symbolic.midi import (KeySignature, MidiFile, Note, Tempo,
                                 TimeSignature, note_name_to_number,
                                 note_number_to_name)


def test_note_names():
    assert note_number_to_name(60) == "C4"
    assert note_number_to_name(61) == "C#4"
    assert note_number_to_name(21) == "A0"
    assert note_name_to_number("C4") == 60
    assert note_name_to_number("G#6") == 92
    assert note_name_to_number("Bb3") == 58


def _mf():
    mf = MidiFile(ticks_per_beat=480)
    mf.tempos.append(Tempo(0, 500000))              # 120 BPM
    mf.time_signatures.append(TimeSignature(0, 4, 4))
    mf.key_signatures.append(KeySignature(0, 0))
    # quarter notes C4 D4 E4 F4 on beats 0..3
    for i, p in enumerate([60, 62, 64, 65]):
        mf.notes.append(Note(i * 480, 480, p, 100))
    return mf


def test_smf_roundtrip(tmp_path):
    mf = _mf()
    p = str(tmp_path / "t.mid")
    mf.save(p)
    back = MidiFile.load(p)
    assert back.ticks_per_beat == 480
    assert len(back.notes) == 4
    assert [n.pitch for n in back.notes] == [60, 62, 64, 65]
    assert [n.start_tick for n in back.notes] == [0, 480, 960, 1440]
    assert back.tempos[0].us_per_beat == 500000
    assert back.time_signatures[0].numerator == 4
    assert back.key_signatures[0].name == "C"


def test_tempo_map_with_change():
    mf = MidiFile(ticks_per_beat=480)
    mf.tempos = [Tempo(0, 500000), Tempo(960, 250000)]   # 120 -> 240 BPM
    # first 2 beats at 120 (0.5 s/beat) = 1.0 s; after, 0.25 s/beat
    assert mf.tick_to_seconds(960) == pytest.approx(1.0)
    assert mf.tick_to_seconds(1440) == pytest.approx(1.25)
    assert mf.seconds_to_tick(1.25) == 1440
    assert mf.seconds_to_tick(0.5) == 480


def test_cut_respects_tempo_changes():
    mf = MidiFile(ticks_per_beat=480)
    mf.tempos = [Tempo(0, 500000), Tempo(960, 250000)]
    # notes at each beat for 8 beats
    for i in range(8):
        mf.notes.append(Note(i * 480, 480, 60 + i, 100))
    cut = mf.cut(1.5)            # = tick 1920 (2 beats @120 + 2 beats @240)
    assert max(n.end_tick for n in cut.notes) <= 1920
    assert len(cut.notes) == 4
    assert cut.duration_seconds == pytest.approx(1.5)
    # sustained note clipped at boundary
    mf2 = MidiFile(ticks_per_beat=480)
    mf2.tempos = [Tempo(0, 500000)]
    mf2.notes = [Note(0, 4800, 60, 100)]
    c2 = mf2.cut(1.0)
    assert c2.notes[0].duration_tick == 960


def test_retriggered_note_not_dropped(tmp_path):
    """Regression (review finding): a note-on for an already-sounding
    (channel, pitch) must close the first note at the retrigger tick
    (pretty_midi/mido semantics) — it used to vanish entirely, with the
    first note-off closing the SECOND note."""
    mf = MidiFile(ticks_per_beat=480)
    mf.tempos.append(Tempo(0, 500000))
    mf.notes.append(Note(0, 960, 60, 100))      # C4 t0..960
    mf.notes.append(Note(480, 960, 60, 100))    # C4 retrigger t480..1440
    p = str(tmp_path / "re.mid")
    mf.save(p)
    back = MidiFile.load(p)
    assert len(back.notes) == 2, back.notes
    by_start = sorted(back.notes, key=lambda n: n.start_tick)
    assert by_start[0].start_tick == 0
    # first note closed at the retrigger, not lost
    assert by_start[0].end_tick == 480
    assert by_start[1].start_tick == 480


def test_abc_overlap_does_not_drift():
    """Regression (review finding): a note starting while the previous one
    sounds (held bass under melody) must keep its true onset — the emitter
    used to shift it later by the full previous duration, drifting every
    subsequent note and barline."""
    from audax.symbolic.abc import midi_to_abc

    mf = MidiFile(ticks_per_beat=480)
    mf.tempos.append(Tempo(0, 500000))
    mf.time_signatures.append(TimeSignature(0, 4, 4))
    mf.notes.append(Note(0, 1920, 48, 100))      # held bass, whole bar
    mf.notes.append(Note(960, 480, 72, 100))     # melody on beat 3
    mf.notes.append(Note(1440, 480, 74, 100))    # melody on beat 4
    abc = midi_to_abc(mf)
    body = abc.split("K:C\n", 1)[1].replace("\n", " ")
    # the bass is truncated to 2 beats (next onset), melody lands on
    # beats 3 and 4 of bar ONE — total is exactly one bar, no drift
    toks = body.split()
    assert toks[-1] == "|]", toks
    assert "z" not in body, body       # no phantom rests from drift
    # exactly one bar of content: no interior barline before the final |]
    assert body.count("|") == 1, body
    abc = midi_to_abc(_mf(), title="test tune", unit=Fraction(1, 8))
    md = extract_abc_metadata(abc)
    assert md.title == "test tune"
    assert md.meter == "4/4" and md.unit_length == "1/8"
    assert md.tempo == 120 and md.key == "C"
    # quarter note at L:1/8 = 2 units
    assert "C2" in abc and "D2" in abc and "E2" in abc and "F2" in abc
    assert abc.rstrip().endswith("|]")


def test_midi_to_abc_chords_rests_octaves():
    mf = MidiFile(ticks_per_beat=480)
    mf.tempos.append(Tempo(0, 500000))
    mf.notes = [Note(0, 480, 60), Note(0, 480, 64), Note(0, 480, 67),
                Note(960, 480, 72),        # rest gap then c5
                Note(1440, 480, 48)]       # C3
    abc = midi_to_abc(mf)
    assert "[C2E2G2]" in abc.replace(" ", "")
    assert "z2" in abc
    assert "c2" in abc
    assert "C,2" in abc


def test_abc_token_extraction():
    mf = _mf()
    for i, p in enumerate([67, 69, 71, 72]):        # second bar
        mf.notes.append(Note((4 + i) * 480, 480, p, 100))
    abc = midi_to_abc(mf, title="tok")
    toks = extract_tokens(abc)
    assert "X:1" in toks and "T:tok" in toks and "K:C" in toks
    assert "C2" in toks and "|" in toks and "|]" in toks
    # accidentals and chords
    toks2 = extract_tokens("^C2 _B,/ [CEG] z2 | d'3/2 |]")
    assert "^C2" in toks2 and "_B,/" in toks2 and "[CEG]" in toks2
    assert "z2" in toks2 and "d'3/2" in toks2
    # path pollution dropped
    toks3 = extract_tokens("T:/home/user/song.mid\nC2 D2 |")
    assert not any(".mid" in t for t in toks3)
    assert "C2" in toks3


def test_parse_chord():
    assert parse_chord("C") == [60, 64, 67]
    assert parse_chord("Am") == [69, 72, 76]
    assert parse_chord("G7") == [67, 71, 74, 77]
    assert parse_chord("Fmaj7") == [65, 69, 72, 76]
    assert parse_chord("Bbm7") == [70, 73, 77, 80]
    with pytest.raises(ValueError):
        parse_chord("Cweird")


def test_chords_to_midi(tmp_path):
    mf = chords_to_midi([("Am", 0.0), ("F", 2.0), ("C", 4.0), ("G", 6.0)],
                        total_seconds=8.0, bpm=120)
    assert len(mf.notes) == 12
    assert mf.duration_seconds == pytest.approx(8.0)
    p = str(tmp_path / "chords.mid")
    mf.save(p)
    back = MidiFile.load(p)
    assert len(back.notes) == 12
    # Am voicing present at t=0
    first = sorted(n.pitch for n in back.notes if n.start_tick == 0)
    assert first == [69, 72, 76]
