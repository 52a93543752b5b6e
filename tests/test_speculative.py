"""Speculative decoding must be TOKEN-EXACT vs plain greedy generate():
the draft only controls how many target-argmax tokens arrive per pass.
Covers: plain, suppression, int8 KV, perfect draft (draft == target),
and early-EOS semantics (lengths / gen_count / sum_logprob parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.infer.decode import generate
from audax.infer.speculative import generate_speculative
from audax.models.whisper import encode, init_whisper_params

pytestmark = pytest.mark.fast

TARGET = WhisperConfig(n_mels=8, n_audio_ctx=32, d_model=32,
                       encoder_layers=2, decoder_layers=2, heads=2,
                       vocab_size=120, n_text_ctx=64)
DRAFT = WhisperConfig(n_mels=8, n_audio_ctx=32, d_model=16,
                      encoder_layers=1, decoder_layers=1, heads=2,
                      vocab_size=120, n_text_ctx=64)


@pytest.fixture(scope="module")
def models():
    target = init_whisper_params(TARGET, jax.random.key(0))
    draft = init_whisper_params(DRAFT, jax.random.key(1))
    rng = np.random.default_rng(7)
    mel = jnp.asarray(rng.standard_normal((1, 64, 8)).astype(np.float32))
    enc = encode(target, TARGET, mel)
    denc = encode(draft, DRAFT, mel)
    return target, draft, enc, denc


def _check_match(ref, out):
    rl, ol = int(ref.lengths[0]), int(out.lengths[0])
    assert ol == rl
    np.testing.assert_array_equal(np.asarray(out.tokens[0, :ol]),
                                  np.asarray(ref.tokens[0, :rl]))
    assert int(out.gen_count[0]) == int(ref.gen_count[0])
    np.testing.assert_allclose(np.asarray(out.sum_logprob),
                               np.asarray(ref.sum_logprob),
                               atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("spec_tokens", [2, 4, 8])
def test_speculative_token_exact(models, spec_tokens):
    target, draft, enc, denc = models
    prompt = jnp.asarray([[5, 9]], jnp.int32)
    ref = generate(target, TARGET, enc, prompt, max_len=24, eos_id=1)
    out = generate_speculative(draft, target, DRAFT, TARGET, denc, enc,
                               prompt, max_len=24, eos_id=1,
                               spec_tokens=spec_tokens)
    _check_match(ref, out)


def test_speculative_position_table_guard(models):
    """max_len + spec_tokens beyond the position table must raise: the
    verify span's dynamic_slice would CLAMP at the table edge and silently
    mis-position tail tokens (review finding). n_text_ctx=64 here, so
    max_len=60, K=8 overruns (60-1+8 > 64)."""
    target, draft, enc, denc = models
    prompt = jnp.asarray([[5, 9]], jnp.int32)
    with pytest.raises(ValueError, match="position table"):
        generate_speculative(draft, target, DRAFT, TARGET, denc, enc,
                             prompt, max_len=60, eos_id=1, spec_tokens=8)
    # the boundary case is allowed: last span start 56, 8 rows end at 63
    generate_speculative(draft, target, DRAFT, TARGET, denc, enc,
                         prompt, max_len=57, eos_id=1, spec_tokens=8)


def test_speculative_with_suppression(models):
    target, draft, enc, denc = models
    prompt = jnp.asarray([[5]], jnp.int32)
    sup = jnp.asarray([3, 4, 7, 11], jnp.int32)
    ref = generate(target, TARGET, enc, prompt, max_len=20, eos_id=1,
                   suppress=sup)
    out = generate_speculative(draft, target, DRAFT, TARGET, denc, enc,
                               prompt, max_len=20, eos_id=1, spec_tokens=4,
                               suppress=sup)
    _check_match(ref, out)
    assert not (set(np.asarray(out.tokens[0, 1:int(out.lengths[0])]).tolist())
                & set(np.asarray(sup).tolist()))


def test_speculative_early_eos(models):
    """Pick an actually-emitted token as EOS so both paths stop early —
    exercises in-span EOS acceptance and the lengths contract."""
    target, draft, enc, denc = models
    prompt = jnp.asarray([[5, 9]], jnp.int32)
    free = generate(target, TARGET, enc, prompt, max_len=24, eos_id=1)
    mid = np.asarray(free.tokens[0])[4:8]          # tokens emitted mid-run
    eos = int(mid[0])
    ref = generate(target, TARGET, enc, prompt, max_len=24, eos_id=eos)
    assert int(ref.lengths[0]) < 24                # really stops early
    out = generate_speculative(draft, target, DRAFT, TARGET, denc, enc,
                               prompt, max_len=24, eos_id=eos, spec_tokens=4)
    _check_match(ref, out)


def test_speculative_perfect_draft(models):
    """Draft == target: every proposal accepted; still exact."""
    target, _, enc, _ = models
    prompt = jnp.asarray([[5]], jnp.int32)
    ref = generate(target, TARGET, enc, prompt, max_len=24, eos_id=1)
    out = generate_speculative(target, target, TARGET, TARGET, enc, enc,
                               prompt, max_len=24, eos_id=1, spec_tokens=6)
    _check_match(ref, out)


def test_speculative_int8_kv(models):
    target, draft, enc, denc = models
    prompt = jnp.asarray([[5, 9]], jnp.int32)
    ref = generate(target, TARGET, enc, prompt, max_len=20, eos_id=1,
                   kv_quant=True)
    out = generate_speculative(draft, target, DRAFT, TARGET, denc, enc,
                               prompt, max_len=20, eos_id=1, spec_tokens=4,
                               kv_quant=True)
    _check_match(ref, out)


def test_transcriber_draft_path_matches_plain(models, rng):
    """Transcriber(draft=...) must transcribe identically to the plain
    Transcriber (speculative is token-exact end to end)."""
    from audax.infer.transcribe import Transcriber
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    tk = WhisperTokenizer(train_bpe(["hello world", "ab cd"] * 3,
                                    vocab_size=280))
    tcfg = WhisperConfig(n_mels=8, n_audio_ctx=100, d_model=32,
                         encoder_layers=1, decoder_layers=1, heads=2,
                         vocab_size=tk.vocab_size, n_text_ctx=64)
    dcfg = WhisperConfig(n_mels=8, n_audio_ctx=100, d_model=16,
                         encoder_layers=1, decoder_layers=1, heads=2,
                         vocab_size=tk.vocab_size, n_text_ctx=64)
    target = init_whisper_params(tcfg, jax.random.key(0))
    draft = init_whisper_params(dcfg, jax.random.key(1))
    audio = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    plain = Transcriber(target, tcfg, tk, max_new_tokens=8, backend="xla",
                        temperature_fallback=False)
    spec = Transcriber(target, tcfg, tk, max_new_tokens=8, backend="xla",
                       temperature_fallback=False, draft=(draft, dcfg),
                       spec_tokens=4)
    a = plain.transcribe(audio, batch_chunks=1)
    b = spec.transcribe(audio, batch_chunks=1)
    assert a.text == b.text
    assert [s.text for s in a.segments] == [s.text for s in b.segments]


def test_speculative_first_suppress_exact(models):
    """SuppressBlank applies at absolute position p_len in BOTH draft and
    target, so speculative stays token-exact vs plain greedy even when the
    first token is rerouted."""
    target, draft, enc, denc = models
    prompt = jnp.asarray([[5, 9]], jnp.int32)
    plain = generate(target, TARGET, enc, prompt, max_len=24, eos_id=1)
    fs = jnp.asarray([int(plain.tokens[0, 2])], jnp.int32)  # ban greedy t0
    ref = generate(target, TARGET, enc, prompt, max_len=24, eos_id=1,
                   first_suppress=fs)
    assert int(ref.tokens[0, 2]) != int(plain.tokens[0, 2])
    out = generate_speculative(draft, target, DRAFT, TARGET, denc, enc,
                               prompt, max_len=24, eos_id=1,
                               spec_tokens=4, first_suppress=fs)
    _check_match(ref, out)
