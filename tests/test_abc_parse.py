"""ABC parser round-trip + note-level metrics."""

from fractions import Fraction

import pytest

from audax.eval.music_metrics import abc_note_prf, abc_validity_rate, note_prf
from audax.symbolic.abc import midi_to_abc
from audax.symbolic.abc_parse import AbcParseError, abc_to_midi, parse_abc_note
from audax.symbolic.midi import (KeySignature, MidiFile, Note, Tempo,
                                 TimeSignature)


def test_parse_abc_note():
    assert parse_abc_note("C") == (60, Fraction(1))
    assert parse_abc_note("c") == (72, Fraction(1))
    assert parse_abc_note("^C2") == (61, Fraction(2))
    assert parse_abc_note("_B,/") == (58, Fraction(1, 2))
    assert parse_abc_note("d'3/2") == (86, Fraction(3, 2))
    assert parse_abc_note("=C") == (60, Fraction(1))
    with pytest.raises(AbcParseError):
        parse_abc_note("H2")


def test_key_signature_accidentals():
    # in D major (2 sharps) written F means F#
    abc = "X:1\nM:4/4\nL:1/4\nQ:1/4=120\nK:D\nF G |]\n"
    mf = abc_to_midi(abc)
    assert [n.pitch for n in mf.notes] == [66, 67]
    # explicit natural overrides the key
    abc2 = "X:1\nL:1/4\nK:D\n=F |]\n"
    assert abc_to_midi(abc2).notes[0].pitch == 65


def _tune():
    mf = MidiFile(ticks_per_beat=480)
    mf.tempos.append(Tempo(0, 500000))
    mf.time_signatures.append(TimeSignature(0, 4, 4))
    mf.key_signatures.append(KeySignature(0, 0))
    pitches = [60, 62, 64, 65, 67, 69, 71, 72]
    for i, p in enumerate(pitches):
        mf.notes.append(Note(i * 480, 480, p, 100))
    mf.notes.append(Note(8 * 480, 960, 48, 100))      # long low note
    mf.notes.extend([Note(10 * 480, 480, q, 100) for q in (60, 64, 67)])
    return mf


def test_roundtrip_midi_abc_midi():
    ref = _tune()
    abc = midi_to_abc(ref, title="roundtrip")
    back = abc_to_midi(abc)
    assert back.tempos[0].bpm == pytest.approx(120)
    assert back.time_signatures[0].numerator == 4
    m = note_prf(ref, back, onset_tolerance=0.02)
    assert m["f1"] == 1.0, m
    # durations preserved too (within quantization)
    ref_times = sorted((round(s, 3), round(e - s, 3), n.pitch)
                       for s, e, n in ref.notes_with_times())
    back_times = sorted((round(s, 3), round(e - s, 3), n.pitch)
                        for s, e, n in back.notes_with_times())
    assert ref_times == back_times


def test_roundtrip_non_c_key():
    """Regression (review finding): the emitter spelled pitches absolutely
    while the parser applies key accidentals, so every natural note in a
    non-C tune round-tripped a semitone off. The key-aware emitter must
    spell F# as plain F under K:D and F natural as =F."""
    mf = MidiFile(ticks_per_beat=480)
    mf.tempos.append(Tempo(0, 500000))
    mf.time_signatures.append(TimeSignature(0, 4, 4))
    mf.key_signatures.append(KeySignature(0, 2))          # D major: F#, C#
    pitches = [62, 64, 66, 65, 61, 60, 67]   # D E F# F-nat C# C-nat G
    for i, p in enumerate(pitches):
        mf.notes.append(Note(i * 480, 480, p, 100))
    abc = midi_to_abc(mf, title="dmaj")
    assert "K:D" in abc
    back = abc_to_midi(abc)
    assert [n.pitch for n in sorted(back.notes,
                                    key=lambda n: n.start_tick)] == pitches
    # flat keys too (F major: Bb); Bb spells plain B, B natural as =B
    mf2 = MidiFile(ticks_per_beat=480)
    mf2.tempos.append(Tempo(0, 500000))
    mf2.key_signatures.append(KeySignature(0, -1))
    for i, p in enumerate([65, 70, 71, 69]):  # F Bb B-nat A
        mf2.notes.append(Note(i * 480, 480, p, 100))
    back2 = abc_to_midi(midi_to_abc(mf2))
    assert [n.pitch for n in sorted(back2.notes,
                                    key=lambda n: n.start_tick)] == \
        [65, 70, 71, 69]


def test_tie_broken_by_rest():
    """Regression (review finding): 'C- z2 C' is two notes (the rest breaks
    the tie), not one note spanning the rest with a wrong onset."""
    abc = "X:1\nL:1/4\nK:C\nC- z2 C |]\n"
    mf = abc_to_midi(abc)
    assert len(mf.notes) == 2
    starts = sorted(n.start_tick for n in mf.notes)
    assert starts == [0, 3 * 480]


def test_midtune_key_change_keeps_notes():
    """Regression (review finding): the header/body split must use the
    FIRST K: line — splitting at the last one discarded every note before
    a mid-tune key change."""
    abc = "X:1\nL:1/4\nK:C\nC D E |\nK:G\nG A B |]\n"
    mf = abc_to_midi(abc)
    assert len(mf.notes) == 6


def test_thick_barline_not_a_chord():
    """Regression (review finding): '[| C D E |]' is a barline span, not a
    chord of the whole measure."""
    abc = "X:1\nL:1/4\nK:C\n[| C D E |]\n"
    mf = abc_to_midi(abc)
    starts = sorted(n.start_tick for n in mf.notes)
    assert starts == [0, 480, 960], starts


def test_note_prf_partial():
    ref = _tune()
    hyp = MidiFile(ticks_per_beat=480)
    hyp.tempos.append(Tempo(0, 500000))
    # half the notes, one wrong pitch, one offset too far
    for i, p in enumerate([60, 62, 99, 65]):
        hyp.notes.append(Note(i * 480, 480, p, 100))
    hyp.notes.append(Note(9999, 480, 67, 100))
    m = note_prf(ref, hyp)
    assert m["matches"] == 3
    assert m["precision"] == pytest.approx(3 / 5)
    assert m["recall"] == pytest.approx(3 / 12)


def test_abc_scoring_and_validity():
    ref = _tune()
    abc = midi_to_abc(ref)
    good = abc_note_prf(ref, abc)
    assert good["valid"] == 1.0 and good["f1"] == 1.0
    bad = abc_note_prf(ref, "complete garbage %%% not abc")
    assert bad["valid"] == 0.0 and bad["f1"] == 0.0
    rate = abc_validity_rate([abc, "garbage", abc])
    assert rate == pytest.approx(2 / 3)


def test_ties_merge_duration():
    abc = "X:1\nL:1/8\nQ:1/4=120\nK:C\nC2- C2 D2 |]\n"
    mf = abc_to_midi(abc)
    notes = sorted(mf.notes, key=lambda n: n.start_tick)
    assert [n.pitch for n in notes] == [60, 62]
    # tied C spans 4 eighth-units = 2 beats = 960 ticks
    assert notes[0].duration_tick == 960


def test_abc2wav_cli(tmp_path):
    """`abc2wav` renders ABC text to audio in one step (the reference's
    music21_tests.py --playabc surface: abc -> MIDI -> synth playback)."""
    from audax.cli.main import _COMMANDS
    from audax.data.audio_io import read_wav

    abc = tmp_path / "t.abc"
    abc.write_text("X:1\nL:1/4\nQ:1/4=120\nK:C\nC D E |]\n")
    out = tmp_path / "t.wav"
    assert _COMMANDS["abc2wav"]([str(abc), "--out", str(out)]) == 0
    x, rate = read_wav(str(out))
    assert rate == 16000
    # three quarter notes at 120 BPM = 1.5 s of sound (>= via release tail)
    assert len(x) >= int(1.4 * 16000)
    assert float(abs(x).max()) > 0.01

    # inline form
    out2 = tmp_path / "u.wav"
    assert _COMMANDS["abc2wav"](["--abc-text", "X:1\nL:1/4\nK:C\nG |]\n",
                                 "--out", str(out2)]) == 0
    assert out2.exists()
