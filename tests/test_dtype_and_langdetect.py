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
