"""Serving warmup: Transcriber.warmup()/StreamingTranscriber.warmup() must
precompile EVERY program the serving path can hit, so the first real
request triggers zero XLA compiles (over the TPU tunnel a cold compile
costs minutes — cli `stream-serve` warms at startup).

Counted via the /jax/core/compile/backend_compile_duration monitoring
event, which fires once per actual backend compilation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.infer.streaming import StreamingTranscriber
from audax.infer.transcribe import Transcriber
from audax.models.whisper import init_whisper_params
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer

pytestmark = pytest.mark.fast

_COMPILES = []


@pytest.fixture(scope="module", autouse=True)
def _compile_listener():
    from jax._src import monitoring

    def listen(name, *a, **kw):
        if name == "/jax/core/compile/backend_compile_duration":
            _COMPILES.append(name)

    monitoring.register_event_duration_secs_listener(listen)
    yield


def _make(**kw):
    tk = WhisperTokenizer(train_bpe(["hello world", "ab cd"] * 3,
                                    vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=300, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tk.vocab_size, n_text_ctx=64)
    params = init_whisper_params(cfg, jax.random.key(0))
    return Transcriber(params, cfg, tk, max_new_tokens=8, backend="xla",
                       **kw), cfg, tk, params


def test_transcriber_warmup_covers_serving(rng):
    tr, cfg, _, _ = _make(word_timestamps=True)
    tr.warmup(batch_chunks=2)
    before = len(_COMPILES)
    assert before > 0
    # 2.5 windows -> one full group of 2 + one padded group of... no: group
    # size is min(batch_chunks, n_chunks)=2, so 3 chunks = groups [2, 2pad]
    audio = (0.1 * rng.standard_normal(int(2.5 * tr.chunk_samples))
             ).astype(np.float32)
    res = tr.transcribe(audio, batch_chunks=2)
    assert res.segments
    assert len(_COMPILES) == before, \
        f"{len(_COMPILES) - before} uncached compiles after warmup"


def test_streaming_warmup_covers_serving(rng):
    tr, cfg, tk, params = _make()
    st = StreamingTranscriber(params, cfg, tk, batch_slots=2,
                              max_new_tokens=8, backend="xla",
                              window_seconds=tr.chunk_seconds)
    st.warmup()
    before = len(_COMPILES)
    st.feed("a", (0.1 * rng.standard_normal(st.window)).astype(np.float32))
    st.feed("b", (0.1 * rng.standard_normal(st.window)).astype(np.float32))
    segs = st.drain()
    assert len(segs) == 2
    assert len(_COMPILES) == before, \
        f"{len(_COMPILES) - before} uncached compiles after warmup"
