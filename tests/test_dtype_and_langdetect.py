"""bf16 serving-dtype plumbing + language detection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.infer.decode import generate
from audax.infer.transcribe import detect_language
from audax.models.whisper import encode, init_whisper_params, whisper_forward
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def setup():
    tok = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280),
                           timestamp_count=51)
    cfg = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(0))
    return params, cfg, tok


def test_bf16_forward_and_decode(setup, rng):
    params, cfg, tok = setup
    mel = jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    f32 = whisper_forward(params, cfg, mel, toks, dtype=jnp.float32)
    bf16 = whisper_forward(params, cfg, mel, toks, dtype=jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16
    # bf16 logits stay close in distribution terms
    p32 = jax.nn.softmax(f32.astype(jnp.float32), -1)
    p16 = jax.nn.softmax(bf16.astype(jnp.float32), -1)
    assert float(jnp.abs(p32 - p16).max()) < 0.05

    enc16 = encode(params, cfg, mel, dtype=jnp.bfloat16)
    out = generate(params, cfg, enc16, jnp.asarray([[tok.sot]], jnp.int32),
                   max_len=10, eos_id=tok.eot, dtype=jnp.bfloat16)
    assert out.tokens.shape == (1, 10)


def test_bf16_transcriber_serving(setup, rng):
    """bf16 end-to-end serving: the full Transcriber (frontend f32, encoder +
    decode in bf16) runs and returns sane segments."""
    from audax.infer.transcribe import Transcriber
    tok80 = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280),
                             timestamp_count=1501)
    cfg80 = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=tok80.vocab_size, n_text_ctx=48)
    params80 = init_whisper_params(cfg80, jax.random.key(3))
    tr = Transcriber(params80, cfg80, tok80, max_new_tokens=8,
                     temperature_fallback=False, dtype=jnp.bfloat16,
                     backend="xla")
    audio = (0.05 * rng.standard_normal(16000 * 2)).astype(np.float32)
    res = tr.transcribe(audio)
    assert res.segments and all(np.isfinite(s.avg_logprob)
                                for s in res.segments)


def test_auto_lang_detects_per_call(setup, rng, monkeypatch):
    """lang='auto' must re-detect for every transcribe() call — a reused
    Transcriber (batch_transcribe_to_csv) must not inherit file 1's language."""
    import audax.infer.transcribe as tr_mod
    tok80 = WhisperTokenizer(train_bpe(["hola mundo"] * 3, vocab_size=280),
                             timestamp_count=1501)
    cfg80 = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=tok80.vocab_size, n_text_ctx=48)
    params80 = init_whisper_params(cfg80, jax.random.key(1))
    tr = tr_mod.Transcriber(params80, cfg80, tok80, lang="auto",
                            max_new_tokens=8, temperature_fallback=False,
                            backend="xla")
    calls = []
    real = tr_mod.detect_language

    def counting(*a, **k):
        out = real(*a, **k)
        calls.append(out[0][0])
        return out

    monkeypatch.setattr(tr_mod, "detect_language", counting)
    for seed in (0, 1):
        audio = (0.05 * np.random.default_rng(seed)
                 .standard_normal(16000 * 2)).astype(np.float32)
        tr.transcribe(audio)
    assert len(calls) == 2, "detection must run once per transcribe() call"
    assert tr.lang == "auto", "transcribe() must not mutate Transcriber.lang"


def test_fallback_ladder_compiles_bounded(setup, rng):
    """The temperature-fallback ladder pads to fixed batch slots, so decoding
    compiles at most len(ladder) generate() programs per chunk-batch size —
    never one per distinct pending-count."""
    from audax.infer.transcribe import FALLBACK_TEMPERATURES, Transcriber

    tok80 = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280),
                             timestamp_count=1501)
    cfg80 = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=tok80.vocab_size, n_text_ctx=48)
    params80 = init_whisper_params(cfg80, jax.random.key(2))
    tr = Transcriber(params80, cfg80, tok80, max_new_tokens=8, backend="xla")
    # 3 chunks of 30 s: one group of 3; a random model trips the fallback on
    # different subsets per temperature, exercising the padded-slot path
    audio = (0.05 * rng.standard_normal(16000 * 75)).astype(np.float32)
    before = generate._cache_size()
    tr.transcribe(audio)
    grown = generate._cache_size() - before
    assert grown <= len(FALLBACK_TEMPERATURES), grown


def test_detect_language(setup, rng):
    params, cfg, tok = setup
    mel = jnp.asarray(rng.standard_normal((3, 64, 16)).astype(np.float32))
    enc = encode(params, cfg, mel)
    langs, probs = detect_language(params, cfg, tok, enc)
    assert len(langs) == 3
    assert all(isinstance(l, str) for l in langs)
    p = np.asarray(probs)
    assert p.shape == (3, tok.num_languages)
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-5)
