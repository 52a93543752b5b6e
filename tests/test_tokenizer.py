"""BPE trainer/codec and Whisper special-token layout tests."""

import numpy as np
import pytest

from audax.symbolic.bpe import BPE, bytes_to_unicode, train_bpe
from audax.symbolic.tokenizer import (VocabTokenizer, WhisperTokenizer,
                                      WHISPER_LANGUAGES, WHISPER_LANGUAGES_V3)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "Asmorandamardicadaistinaculdacar is the magic word",
    "pack my box with five dozen liquor jugs",
] * 4


def test_byte_table_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256 and len(set(table.values())) == 256


def test_bpe_roundtrip_and_merges():
    bpe = train_bpe(CORPUS, vocab_size=300)
    assert len(bpe.merges) > 0
    for text in CORPUS[:4] + ["unseen words äöü ✓ 123"]:
        ids = bpe.encode(text)
        assert bpe.decode(ids) == text
    # merges actually compress
    assert len(bpe.encode("the quick brown fox")) < len("the quick brown fox")


def test_bpe_hash_merges_roundtrip(tmp_path):
    """Regression (review finding): '#' maps to itself in byte-level BPE,
    so merges whose first symbol starts with '#' (GPT-2/Whisper merges.txt
    has '# #', '## #') are REAL merges — the loader used to drop every
    '#'-leading line as a comment, breaking id parity with external
    vocabs. Only the first-line '#version:' header is skipped."""
    corpus = ["### heading ### heading ###"] * 8 + ["## sub ## sub"] * 8
    bpe = train_bpe(corpus, vocab_size=300)
    assert any(a.startswith("#") for a, _ in bpe.merges), bpe.merges[:10]
    d = str(tmp_path / "bpe")
    bpe.save(d)
    # the save format already carries the GPT-2-style '#version' header
    mpath = tmp_path / "bpe" / "merges.txt"
    assert mpath.read_text().startswith("#version")
    back = BPE.load(d)
    assert back.merges == bpe.merges
    for text in corpus[:2] + ["### x ## y # z"]:
        assert back.encode(text) == bpe.encode(text)
        assert back.decode(back.encode(text)) == text
    # contiguous id space: max id < len(vocab) even with duplicate-string
    # merge products
    assert max(bpe.vocab.values()) == len(bpe.vocab) - 1


def test_bpe_specials_and_add_tokens(tmp_path):
    bpe = train_bpe(CORPUS, vocab_size=280, special_tokens=["<abc_start>", "<abc_end>"])
    ids = bpe.encode("<abc_start>the fox<abc_end>")
    assert ids[0] == bpe.vocab["<abc_start>"]
    assert ids[-1] == bpe.vocab["<abc_end>"]
    assert bpe.decode(ids) == "<abc_start>the fox<abc_end>"
    assert bpe.decode(ids, skip_specials=True) == "the fox"

    before = len(bpe)
    added = bpe.add_tokens(["<|MIDI|>", "<|/MIDI|>"])
    assert added == 2 and len(bpe) == before + 2
    ids2 = bpe.encode("<|MIDI|> G4 <|/MIDI|>")
    assert bpe.vocab["<|MIDI|>"] in ids2

    bpe.save(str(tmp_path))
    loaded = BPE.load(str(tmp_path))
    assert loaded.encode("the quick fox") == bpe.encode("the quick fox")
    assert loaded.decode(ids2) == bpe.decode(ids2)


class _FakeBase:
    """Stand-in for a full multilingual BPE base (50257 entries) so the
    special-token ids can be checked against the PUBLISHED checkpoint layout
    without the real vocab files (no network in this environment)."""

    def __init__(self, n):
        self._n = n

    def __len__(self):
        return self._n


def test_whisper_published_id_layouts():
    """Exact ids of the published multilingual layouts. 99-language (v2 and
    earlier) and 100-language (large-v3, +yue) — every special id after the
    language block shifts by one between them, which is why the layout must
    be keyed off the checkpoint's vocab size."""
    base = _FakeBase(50257)
    v2 = WhisperTokenizer(base)                           # default: 99 langs
    assert (v2.eot, v2.sot) == (50257, 50258)
    assert v2.lang_token("en") == 50259
    assert (v2.translate, v2.transcribe) == (50358, 50359)
    assert (v2.sot_lm, v2.sot_prev) == (50360, 50361)
    assert (v2.no_speech, v2.no_timestamps) == (50362, 50363)
    assert v2.timestamp_begin == 50364
    assert v2.vocab_size == 51865

    v3 = WhisperTokenizer.for_vocab_size(base, 51866)
    assert v3.num_languages == 100
    assert v3.languages[-1] == "yue"
    assert v3.lang_token("yue") == 50358
    assert (v3.translate, v3.transcribe) == (50359, 50360)
    assert (v3.sot_lm, v3.sot_prev) == (50361, 50362)
    assert (v3.no_speech, v3.no_timestamps) == (50363, 50364)
    assert v3.timestamp_begin == 50365
    assert v3.vocab_size == 51866

    # round-trip: for_vocab_size on the v2 total recovers 99 languages
    assert WhisperTokenizer.for_vocab_size(base, 51865).num_languages == 99
    assert len(WHISPER_LANGUAGES_V3) == 100

    with pytest.raises(ValueError):
        WhisperTokenizer.for_vocab_size(base, 51867 + 200)  # nonsense size


def test_whisper_special_layout():
    bpe = train_bpe(CORPUS, vocab_size=280)
    tk = WhisperTokenizer(bpe)
    base = len(bpe)
    assert tk.eot == base and tk.sot == base + 1
    assert tk.lang_token("en") == base + 2
    assert tk.lang_token("zh") == base + 3
    assert tk.transcribe == base + 2 + len(WHISPER_LANGUAGES) + 1
    assert tk.no_timestamps == tk.transcribe + 4
    assert tk.timestamp_begin == tk.no_timestamps + 1
    # real-checkpoint cross-check: base 50257 -> published multilingual ids
    class Fake:  # 50257-entry stand-in vocab
        def __len__(self): return 50257
    fk = WhisperTokenizer(Fake())
    assert fk.eot == 50257 and fk.sot == 50258
    assert fk.transcribe == 50359 and fk.no_timestamps == 50363
    assert fk.timestamp_begin == 50364
    assert fk.vocab_size == 51865          # whisper-small vocab exactly


def test_whisper_sot_sequence_and_decode():
    bpe = train_bpe(CORPUS, vocab_size=280)
    tk = WhisperTokenizer(bpe)
    seq = tk.sot_sequence(lang="en")
    assert seq == [tk.sot, tk.lang_token("en"), tk.transcribe, tk.no_timestamps]
    ids = seq + tk.encode("the fox") + [tk.eot]
    assert tk.decode(ids) == "the fox"
    assert "<|startoftranscript|>" in tk.decode(ids, skip_special=False)
    assert tk.timestamp_token(1.0) == tk.timestamp_begin + 50
    assert tk.timestamp_seconds(tk.timestamp_token(2.5)) == pytest.approx(2.5)


def test_vocab_tokenizer(tmp_path):
    vt = VocabTokenizer({"C4": 0, "D4": 1, "|": 2})
    ids = vt.encode_tokens(["C4", "D4", "|", "X9"])
    assert ids[:3] == [0, 1, 2] and ids[3] == vt.vocab["<unk>"]
    assert vt.decode(ids[:3]) == ["C4", "D4", "|"]
    p = str(tmp_path / "vocab.json")
    vt.save(p)
    vt2 = VocabTokenizer.load(p)
    assert vt2.encode_tokens(["C4", "|"]) == [0, 2]
    assert vt2.pad_id == vt.pad_id


def test_non_speech_tokens():
    """non_speech_tokens probes THIS vocab for whisper's default
    suppress_tokens='-1' symbol set (openai builds the ids the same way
    from its GPT-2 vocab)."""
    from audax.symbolic.bpe import train_bpe
    corpus = ['text (with) [brackets] "quotes" -- dashes ♪ notes #tags'] * 3
    tok = WhisperTokenizer(train_bpe(corpus, vocab_size=300))
    ids = tok.non_speech_tokens()
    assert ids == sorted(set(ids))
    # single-byte symbols present in a byte-level vocab must be banned
    for sym in ['(', ')', '[', ']', '"', '#']:
        assert tok.encode(sym)[0] in ids, sym
    # musical notes ban their lead token even when multi-token
    assert tok.encode("♪")[0] in ids
    # no control/special ids leak in (they are base-vocab ids only)
    assert all(i < len(tok.bpe) for i in ids)
    # plain letters are never suppressed
    assert tok.encode("a")[0] not in ids
