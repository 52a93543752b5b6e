"""Transcript output writers (txt/srt/vtt/tsv/json) — pure host logic.

The reference reaches these artifacts through openai-whisper's CLI around
``model.transcribe`` (AB/wavToWhisper.py:7-18); here they are first-party
functions over TranscriptionResult.
"""

import json
import os

import pytest

from audax.infer.align import WordTiming
from audax.infer.transcribe import Segment, TranscriptionResult
from audax.infer.writers import FORMATS, get_writer, write_result


def _result(with_words=False):
    words1 = words2 = None
    if with_words:
        words1 = [WordTiming(" Hello", 0.0, 0.4, 0.9),
                  WordTiming(" there", 0.5, 0.9, 0.8),
                  WordTiming(" general", 1.0, 1.6, 0.7),
                  WordTiming(" Kenobi", 1.7, 2.3, 0.95)]
        words2 = [WordTiming(" You're", 3.0, 3.4, 0.9),
                  WordTiming(" bold", 3.5, 3.9, 0.85)]
    segs = [Segment(" Hello there general Kenobi", 0.0, 2.4, -0.1, 0.0,
                    words=words1),
            Segment(" You're bold", 3.0, 4.0, -0.2, 0.0, words=words2)]
    text = "".join(s.text for s in segs).strip()
    return TranscriptionResult(text, segs, audio_seconds=4.0,
                               wall_seconds=0.1)


def test_txt(tmp_path):
    p = write_result(_result(), "txt", str(tmp_path / "a.txt"))
    lines = open(p).read().splitlines()
    assert lines == ["Hello there general Kenobi", "You're bold"]


def test_srt_format(tmp_path):
    p = write_result(_result(), "srt", str(tmp_path / "a.srt"))
    body = open(p).read()
    blocks = [b for b in body.strip().split("\n\n") if b]
    assert len(blocks) == 2
    first = blocks[0].splitlines()
    assert first[0] == "1"
    assert first[1] == "00:00:00,000 --> 00:00:02,400"
    assert first[2] == "Hello there general Kenobi"
    assert blocks[1].splitlines()[1] == "00:00:03,000 --> 00:00:04,000"


def test_vtt_format(tmp_path):
    p = write_result(_result(), "vtt", str(tmp_path / "a.vtt"))
    body = open(p).read()
    assert body.startswith("WEBVTT\n\n")
    assert "00:00:00.000 --> 00:00:02.400" in body
    # vtt cues carry no numeric index
    assert "\n1\n" not in body


def test_tsv_millisecond_offsets(tmp_path):
    p = write_result(_result(), "tsv", str(tmp_path / "a.tsv"))
    rows = [r.split("\t") for r in open(p).read().splitlines()]
    assert rows[0] == ["start", "end", "text"]
    assert rows[1] == ["0", "2400", "Hello there general Kenobi"]
    assert rows[2] == ["3000", "4000", "You're bold"]


def test_json_roundtrip_with_words(tmp_path):
    p = write_result(_result(with_words=True), "json",
                     str(tmp_path / "a.json"))
    d = json.load(open(p))
    assert d["text"].startswith("Hello")
    assert len(d["segments"]) == 2
    w = d["segments"][0]["words"][0]
    assert w["word"] == " Hello" and w["end"] == pytest.approx(0.4)


def test_hour_rollover_timestamp(tmp_path):
    seg = Segment(" late", 3661.25, 3662.0, -0.1, 0.0)
    res = TranscriptionResult("late", [seg], 3700.0, 1.0)
    body = open(write_result(res, "srt", str(tmp_path / "a.srt"))).read()
    assert "01:01:01,250 --> 01:01:02,000" in body


def test_max_words_per_line_uses_word_times(tmp_path):
    p = write_result(_result(with_words=True), "srt",
                     str(tmp_path / "a.srt"), max_words_per_line=2)
    blocks = [b for b in open(p).read().strip().split("\n\n") if b]
    # 4 words -> 2 cues for segment 1, 2 words -> 1 cue for segment 2
    assert len(blocks) == 3
    assert blocks[0].splitlines()[2] == "Hello there"
    # cue timed by its own words, not the whole segment
    assert blocks[0].splitlines()[1] == "00:00:00,000 --> 00:00:00,900"
    assert blocks[1].splitlines()[2] == "general Kenobi"


def test_max_line_count_groups_lines(tmp_path):
    p = write_result(_result(with_words=True), "srt",
                     str(tmp_path / "a.srt"), max_words_per_line=2,
                     max_line_count=2)
    blocks = [b for b in open(p).read().strip().split("\n\n") if b]
    assert len(blocks) == 2
    assert blocks[0].splitlines()[2:] == ["Hello there", "general Kenobi"]


def test_highlight_words_one_cue_per_word(tmp_path):
    p = write_result(_result(with_words=True), "vtt",
                     str(tmp_path / "a.vtt"), highlight_words=True)
    body = open(p).read()
    cues = [b for b in body.strip().split("\n\n")[1:] if b]
    assert len(cues) == 6            # 4 + 2 words
    assert "<u>Hello</u> there general Kenobi" in cues[0]
    assert "Hello <u>there</u> general Kenobi" in cues[1]


def test_get_writer_all_formats(tmp_path):
    writer = get_writer("all", str(tmp_path))
    paths = writer(_result(), "/somewhere/clip7.wav")
    assert sorted(os.path.basename(x) for x in paths) == sorted(
        f"clip7.{f}" for f in FORMATS)
    for x in paths:
        assert os.path.getsize(x) > 0


def test_unknown_format_raises(tmp_path):
    with pytest.raises(ValueError):
        write_result(_result(), "docx", str(tmp_path / "a.docx"))
    with pytest.raises(ValueError):
        get_writer("nope", str(tmp_path))


def test_batch_transcribe_emits_formats(tmp_path, monkeypatch):
    """batch_transcribe_to_csv plumbs output_format without a real model."""
    import numpy as np

    from audax.data.audio_io import write_wav
    from audax.infer import transcribe as T

    wav = tmp_path / "x.wav"
    write_wav(str(wav), np.zeros(1600, np.float32), 16000)

    class FakeFrontend:
        class cfg:
            sample_rate = 16000

    class FakeTr:
        frontend = FakeFrontend()

        def transcribe(self, x, **kw):
            return _result()

    rows = T.batch_transcribe_to_csv(
        FakeTr(), [str(wav)], str(tmp_path / "out.csv"),
        write_sidecars=False, output_format="srt",
        output_dir=str(tmp_path / "subs"))
    assert rows[0]["text"].startswith("Hello")
    assert (tmp_path / "subs" / "x.srt").exists()
