"""Word-level timestamps: DTW alignment unit tests + Transcriber wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.infer.align import dtw_path, word_timings
from audax.infer.transcribe import Transcriber
from audax.models.whisper import init_whisper_params
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer


def test_dtw_follows_diagonal_ridge():
    """A cost matrix with a clean diagonal ridge must be traced exactly."""
    l, s = 5, 10
    cost = np.ones((l, s))
    for i in range(l):
        cost[i, 2 * i: 2 * i + 2] = 0.0          # ridge: token i <-> frames 2i..2i+1
    ti, fi = dtw_path(cost)
    # path is monotonic and covers every token and every frame
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    assert set(ti) == set(range(l)) and set(fi) == set(range(s))
    # each token's aligned frames include its ridge
    for i in range(l):
        frames = fi[ti == i]
        assert 2 * i in frames or 2 * i + 1 in frames


def test_word_timings_grouping_and_order():
    """BPE pieces regroup into whitespace words with monotonic timings."""
    bpe = train_bpe(["hello world again"] * 4, vocab_size=300)
    tok = WhisperTokenizer(bpe, timestamp_count=11)
    ids = tok.encode("hello world again")
    l, s = len(ids), 40
    w = np.zeros((l, s), np.float32)
    span = s // l
    for i in range(l):
        w[i, i * span:(i + 1) * span] = 1.0      # block-diagonal alignment
    words = word_timings(w, ids, tok, n_frames=s)
    assert [x.word for x in words] == ["hello", "world", "again"]
    for a, b in zip(words, words[1:]):
        assert a.start <= b.start and a.end <= b.end
    assert all(0.0 <= x.start < x.end <= s * 0.02 for x in words)
    assert all(x.probability > 0 for x in words)


@pytest.fixture(scope="module")
def small_model():
    tok = WhisperTokenizer(train_bpe(["the quick brown fox jumps"] * 4,
                                     vocab_size=300), timestamp_count=1501)
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=300, d_model=32,
                        encoder_layers=1, decoder_layers=2, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=48)
    params = init_whisper_params(cfg, jax.random.key(0))
    return params, cfg, tok


@pytest.mark.parametrize("timestamps", [False, True])
def test_transcriber_word_timestamps(small_model, rng, timestamps):
    params, cfg, tok = small_model
    tr = Transcriber(params, cfg, tok, max_new_tokens=10,
                     temperature_fallback=False, timestamps=timestamps,
                     word_timestamps=True, backend="xla")
    audio = (0.05 * rng.standard_normal(16000 * 4)).astype(np.float32)
    res = tr.transcribe(audio)
    assert res.segments
    seg_words = [w for s in res.segments if s.words for w in s.words]
    if not res.text.strip():
        return                               # random model emitted no text
    assert seg_words, "word timings missing despite text output"
    for w in seg_words:
        assert 0.0 <= w.start <= w.end <= res.audio_seconds + tr.chunk_seconds
    # words concatenate back to the segment texts (whitespace-normalized)
    joined = " ".join(w.word for w in seg_words)
    expected = " ".join(res.text.split())
    assert joined == expected
