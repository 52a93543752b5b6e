"""Batched streaming transcriber: buffering, chunk accounting, fixed-shape
batching, mesh-sharded path."""

import jax
import numpy as np
import pytest

from audax.core.config import MeshConfig, WhisperConfig
from audax.infer.streaming import StreamingTranscriber
from audax.models.whisper import init_whisper_params
from audax.parallel.mesh import make_mesh
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def setup():
    tok = WhisperTokenizer(train_bpe(["hello world"] * 4, vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    return params, cfg, tok


def test_buffering_and_chunking(setup, rng):
    params, cfg, tok = setup
    st = StreamingTranscriber(params, cfg, tok, batch_slots=4,
                              max_new_tokens=4, backend="xla")
    sr = 16000
    # feed 35 s in odd-sized pieces -> one full 30 s chunk pending
    remaining = 35 * sr
    while remaining > 0:
        n = min(int(rng.integers(1000, 50000)), remaining)
        st.feed("a", 0.01 * rng.standard_normal(n).astype(np.float32))
        remaining -= n
    assert st.pending_chunks() == 1
    st.flush("a")                         # the 5 s tail
    assert st.pending_chunks() == 2

    segs = st.drain()
    assert len(segs) == 2
    assert [s.index for s in segs] == [0, 1]
    assert all(s.stream_id == "a" for s in segs)
    assert st.pending_chunks() == 0
    # flushing an empty stream is a no-op
    st.flush("a")
    assert st.pending_chunks() == 0


def test_multi_stream_batching(setup, rng):
    params, cfg, tok = setup
    st = StreamingTranscriber(params, cfg, tok, batch_slots=3,
                              max_new_tokens=4, backend="xla")
    sr = 16000
    for sid in ("s1", "s2", "s3", "s4"):
        st.feed(sid, 0.01 * rng.standard_normal(31 * sr).astype(np.float32))
    assert st.pending_chunks() == 4
    first = st.step()                     # 3 slots -> 3 chunks
    assert len(first) == 3
    second = st.step()
    assert len(second) == 1
    assert st.step() == []


def test_streaming_over_mesh(setup, rng):
    """TP=2 x DP=4 mesh path compiles and produces the same tokens as the
    unsharded path."""
    params, cfg, tok = setup
    mesh = make_mesh(MeshConfig(model=2))
    plain = StreamingTranscriber(params, cfg, tok, batch_slots=2,
                                 max_new_tokens=4, backend="xla")
    sharded = StreamingTranscriber(params, cfg, tok, batch_slots=2,
                                   max_new_tokens=4, mesh=mesh, backend="xla")
    sr = 16000
    audio = 0.01 * rng.standard_normal(30 * sr).astype(np.float32)
    plain.feed("x", audio)
    sharded.feed("x", audio)
    a = plain.drain()
    b = sharded.drain()
    assert len(a) == len(b) == 1
    assert a[0].text == b[0].text


def test_streaming_vad_skips_silent_windows(setup, rng):
    """Silent windows answer inline as empty segments and never consume a
    batch slot or a decode; active windows still decode."""
    params, cfg, tok = setup
    st = StreamingTranscriber(params, cfg, tok, batch_slots=2,
                              max_new_tokens=4, backend="xla",
                              vad_threshold_db=-45.0)
    sr = 16000
    st.feed("mic", 0.1 * rng.standard_normal(30 * sr).astype(np.float32))
    st.feed("mic", np.zeros(30 * sr, np.float32))           # silent window
    st.feed("mic", 0.1 * rng.standard_normal(30 * sr).astype(np.float32))
    assert st.pending_chunks() == 3

    calls = []
    orig = st._run_batch

    def counting(audio):
        calls.append(audio.shape[0])
        return orig(audio)

    st._run_batch = counting
    segs = st.drain()
    assert len(segs) == 3
    by_idx = {s.index: s for s in segs}
    assert by_idx[1].text == "" and by_idx[1].audio_seconds == 30.0
    # 2 active windows through 2 slots = exactly one device pass
    assert len(calls) == 1

    # an all-silent step returns its answers without any device pass
    calls.clear()
    st.feed("mic", np.zeros(30 * sr, np.float32))
    segs = st.step()
    assert [s.text for s in segs] == [""] and calls == []

    from audax.infer.vad import peak_frame_rms_db
    assert peak_frame_rms_db(np.zeros(100, np.float32), sr) == -200.0
    loud = peak_frame_rms_db(np.ones(sr, np.float32), sr)
    assert loud == pytest.approx(0.0, abs=1e-6)
