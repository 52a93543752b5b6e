"""generate() decode loop + Transcriber end-to-end plumbing (tiny random
model — exercises chunking, prompting, EOS handling, CSV artifacts)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.infer.decode import generate
from audax.infer.transcribe import Transcriber, batch_transcribe_to_csv
from audax.models.whisper import encode, init_whisper_params
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer

TINY = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32, encoder_layers=1,
                     decoder_layers=1, heads=2, vocab_size=600, n_text_ctx=48)


@pytest.fixture(scope="module")
def tiny_model():
    params = init_whisper_params(TINY, jax.random.key(0))
    return params


def test_generate_shapes_and_prompt_forcing(tiny_model, rng):
    mel = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    enc = encode(tiny_model, TINY, mel)
    prompt = jnp.asarray([[5, 6, 7], [5, 6, 7]], jnp.int32)
    out = generate(tiny_model, TINY, enc, prompt, max_len=20, eos_id=2)
    assert out.tokens.shape == (2, 20)
    np.testing.assert_array_equal(np.asarray(out.tokens[:, :3]),
                                  np.asarray(prompt))
    assert (np.asarray(out.lengths) <= 20).all()


def test_no_speech_prob_plumbing(tiny_model, rng):
    """generate(no_speech_id=...) records the raw softmax mass of the
    no-speech token at the first generated position (openai's
    no_speech_prob); without the id the field is None."""
    mel = jnp.asarray(rng.standard_normal((2, 64, 16)).astype(np.float32))
    enc = encode(tiny_model, TINY, mel)
    prompt = jnp.asarray([[5, 6], [5, 6]], jnp.int32)
    out = generate(tiny_model, TINY, enc, prompt, max_len=16, eos_id=2,
                   no_speech_id=9)
    nsp = np.asarray(out.no_speech_prob)
    assert nsp.shape == (2,)
    assert (nsp >= 0).all() and (nsp <= 1).all()
    # reference value: softmax of the teacher-forced logits at the last
    # prompt position (the distribution that predicts the first gen token)
    from audax.models.whisper import whisper_forward
    logits = whisper_forward(tiny_model, TINY, mel, prompt)
    ref = np.asarray(jax.nn.softmax(
        logits[:, -1].astype(jnp.float32), -1))[:, 9]
    np.testing.assert_allclose(nsp, ref, atol=1e-5, rtol=1e-4)
    out2 = generate(tiny_model, TINY, enc, prompt, max_len=16, eos_id=2)
    assert out2.no_speech_prob is None


def test_no_speech_gate_emits_silence(tiny_model, monkeypatch, rng):
    """The silence gate (openai transcribe): high <|nospeech|> mass + low
    confidence emits an EMPTY result instead of hallucinated text, and
    does not run the fallback ladder."""
    from audax.infer.decode import GenerateResult

    tok = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280),
                           timestamp_count=1501)
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=64)
    params = init_whisper_params(cfg, jax.random.key(3))
    tr = Transcriber(params, cfg, tok, max_new_tokens=8, backend="xla")
    calls = []

    def fake_decode(enc, prompt, temperature, denc=None):
        calls.append(temperature)
        b = enc.shape[0]
        p = prompt.shape[1]
        toks = np.zeros((b, p + 8), np.int32)
        toks[:, :p] = prompt
        toks[:, p:] = 50                     # "hallucinated" text token
        return GenerateResult(
            jnp.asarray(toks), jnp.full((b,), p + 8, jnp.int32),
            jnp.full((b,), -40.0, jnp.float32),         # avg_lp = -5
            jnp.full((b,), 8, jnp.int32),
            no_speech_prob=jnp.full((b,), 0.99, jnp.float32))

    monkeypatch.setattr(tr, "_decode_once", fake_decode)
    res = tr.transcribe(np.zeros(16000, np.float32))
    assert res.text == ""                    # silence, not hallucination
    assert calls == [0.0], calls             # gate fired: no ladder retries
    mel = jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    enc = encode(tiny_model, TINY, mel)
    prompt = jnp.asarray([[1]], jnp.int32)
    a = generate(tiny_model, TINY, enc, prompt, max_len=16, eos_id=2)
    b = generate(tiny_model, TINY, enc, prompt, max_len=16, eos_id=2)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_generate_sampling_varies_with_rng(tiny_model, rng):
    mel = jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    enc = encode(tiny_model, TINY, mel)
    prompt = jnp.asarray([[1]], jnp.int32)
    a = generate(tiny_model, TINY, enc, prompt, max_len=24, eos_id=2,
                 temperature=2.0, rng=jax.random.key(1))
    b = generate(tiny_model, TINY, enc, prompt, max_len=24, eos_id=2,
                 temperature=2.0, rng=jax.random.key(2))
    assert not np.array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_generate_suppress_tokens(tiny_model, rng):
    mel = jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    enc = encode(tiny_model, TINY, mel)
    prompt = jnp.asarray([[1]], jnp.int32)
    full = generate(tiny_model, TINY, enc, prompt, max_len=24, eos_id=2)
    emitted = set(np.asarray(full.tokens[0, 1:]).tolist()) - {2, 0}
    if not emitted:
        pytest.skip("model emitted only eos")
    banned = jnp.asarray(sorted(emitted), jnp.int32)
    out = generate(tiny_model, TINY, enc, prompt, max_len=24, eos_id=2,
                   suppress=banned)
    gen = np.asarray(out.tokens[0, 1:])
    assert not set(gen.tolist()) & set(np.asarray(banned).tolist())


@pytest.fixture(scope="module")
def tiny_transcriber():
    corpus = ["hello world", "the quick brown fox", "test audio"] * 3
    tk = WhisperTokenizer(train_bpe(corpus, vocab_size=300))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tk.vocab_size, n_text_ctx=64)
    params = init_whisper_params(cfg, jax.random.key(0))
    return Transcriber(params, cfg, tk, max_new_tokens=8, backend="xla")


def test_transcriber_chunking_and_rtf(tiny_transcriber, rng):
    # 65 s of audio -> 3 chunks of 30 s
    audio = (0.1 * rng.standard_normal(16000 * 65)).astype(np.float32)
    res = tiny_transcriber.transcribe(audio)
    assert len(res.segments) == 3
    assert res.audio_seconds == pytest.approx(65.0)
    assert res.rtf > 0
    assert isinstance(res.text, str)


def test_batch_transcribe_csv(tiny_transcriber, tmp_path, rng):
    from audax.data.audio_io import write_wav
    paths = []
    for i in range(2):
        p = str(tmp_path / f"memo{i}.wav")
        write_wav(p, (0.1 * rng.standard_normal(8000)).astype(np.float32), 16000)
        paths.append(p)
    bad = str(tmp_path / "broken.wav")
    with open(bad, "wb") as fh:
        fh.write(b"junk")
    paths.append(bad)
    csv_path = str(tmp_path / "transcriptions.csv")
    rows = batch_transcribe_to_csv(tiny_transcriber, paths, csv_path,
                                   previous={"memo0.wav": "old text"})
    assert len(rows) == 3
    assert rows[0]["previous"] == "old text"
    assert "error" in rows[2]
    assert os.path.exists(csv_path)
    assert os.path.exists(str(tmp_path / "memo0.txt"))


def test_transcriber_suppresses_control_tokens(rng):
    """Generated output must never contain control tokens (whisper's
    SuppressTokens filter); EOT is the only allowed special."""
    from audax.core.config import WhisperConfig
    from audax.infer.transcribe import Transcriber
    from audax.models.whisper import init_whisper_params
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    tok = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280),
                           timestamp_count=1501)
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=300, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=48)
    params = init_whisper_params(cfg, jax.random.key(5))
    tr = Transcriber(params, cfg, tok, max_new_tokens=16,
                     temperature_fallback=False, backend="xla")
    audio = (0.05 * rng.standard_normal(16000 * 3)).astype(np.float32)
    banned = set(tok.special_ids()) - {tok.eot}
    res_one, _ = tr._decode_chunk_batch(
        np.asarray(audio[: tr.chunk_samples])[None])
    ids = res_one[0][0]
    assert not (set(ids) & banned), set(ids) & banned


def test_first_suppress_hits_only_first_position(tiny_model, rng):
    """first_suppress (whisper SuppressBlank) bans ids at the first
    generated position only: banning the greedy first token changes it;
    banning a non-chosen id leaves the whole decode untouched."""
    mel = jnp.asarray(rng.standard_normal((1, 64, 16)).astype(np.float32))
    enc = encode(tiny_model, TINY, mel)
    prompt = jnp.asarray([[5, 6, 7]], jnp.int32)
    plain = generate(tiny_model, TINY, enc, prompt, max_len=20, eos_id=2)
    t0 = int(plain.tokens[0, 3])
    banned = generate(tiny_model, TINY, enc, prompt, max_len=20, eos_id=2,
                      first_suppress=jnp.asarray([t0], jnp.int32))
    assert int(banned.tokens[0, 3]) != t0
    other = (t0 + 1) % TINY.vocab_size
    inert = generate(tiny_model, TINY, enc, prompt, max_len=20, eos_id=2,
                     first_suppress=jnp.asarray([other], jnp.int32))
    if int(plain.tokens[0, 3]) != other:
        np.testing.assert_array_equal(np.asarray(inert.tokens),
                                      np.asarray(plain.tokens))


def test_transcriber_suppress_knobs(rng):
    """suppress_tokens='-1' folds the tokenizer's non-speech set into the
    control-token ban list; suppress_blank builds the first-position set;
    both have openai's off switches."""
    corpus = ['hello (world) -- "quote" [ok] ♪ music'] * 4
    tok = WhisperTokenizer(train_bpe(corpus, vocab_size=300))
    cfg = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=48)
    params = init_whisper_params(cfg, jax.random.key(0))
    tr = Transcriber(params, cfg, tok)
    non_speech = tok.non_speech_tokens()
    assert non_speech, "symbol corpus must produce a non-speech set"
    assert set(non_speech) <= set(tr.suppress.tolist())
    blank = set(tok.encode(" ") + [tok.eot])
    assert set(tr.first_suppress.tolist()) == blank
    # the paren byte is a single token in a byte-level vocab
    assert tok.encode("(")[0] in non_speech

    off = Transcriber(params, cfg, tok, suppress_tokens=None,
                      suppress_blank=False)
    assert off.first_suppress is None
    assert set(off.suppress.tolist()) == \
        {i for i in tok.special_ids() if i != tok.eot}
    explicit = Transcriber(params, cfg, tok, suppress_tokens=[7, 9])
    assert {7, 9} <= set(explicit.suppress.tolist())


def test_vad_skips_silent_windows(rng):
    """Energy VAD: a silent middle window costs zero decodes and emits no
    segments, while surviving windows keep their true offsets — in both
    the batched and the sequential (condition_on_previous) paths."""
    tok_corpus = ["hello world how are you"] * 4
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer
    tok = WhisperTokenizer(train_bpe(tok_corpus, vocab_size=280))
    cfg = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=48)
    params = init_whisper_params(cfg, jax.random.key(0))
    tr = Transcriber(params, cfg, tok, max_new_tokens=4,
                     vad_threshold_db=-45.0)
    sr = tr.frontend.cfg.sample_rate
    w = tr.chunk_samples
    audio = np.zeros(3 * w, np.float32)
    audio[:w] = 0.1 * rng.standard_normal(w)
    audio[2 * w:] = 0.1 * rng.standard_normal(w)          # middle silent

    calls = []
    orig = tr._decode_chunk_batch

    def counting(group, **kw):
        calls.append(len(group))
        return orig(group, **kw)

    tr._decode_chunk_batch = counting
    res = tr.transcribe(audio, batch_chunks=1)
    assert len(calls) == 2                      # 3 windows, 1 silent
    offs = sorted({s.start for s in res.segments})
    assert offs == [0.0, 2 * tr.chunk_seconds]
    assert res.audio_seconds == pytest.approx(3 * w / sr)

    # sequential path (rolling context) skips the same window
    tr2 = Transcriber(params, cfg, tok, max_new_tokens=4,
                      condition_on_previous=True, vad_threshold_db=-45.0)
    calls2 = []
    orig2 = tr2._decode_chunk_batch

    def counting2(group, **kw):
        calls2.append(len(group))
        return orig2(group, **kw)

    tr2._decode_chunk_batch = counting2
    res2 = tr2.transcribe(audio)
    assert len(calls2) == 2
    assert sorted({s.start for s in res2.segments}) == offs

    # all-silent audio: no decode at all, empty result
    calls.clear()
    silent = tr.transcribe(np.zeros(2 * w, np.float32))
    assert silent.text == "" and silent.segments == []
    assert calls == []

    # VAD off: every window decodes
    tr3 = Transcriber(params, cfg, tok, max_new_tokens=4)
    assert not tr3._is_silent(np.zeros(w, np.float32))


def test_transcriber_detect_language_api(tiny_transcriber, rng):
    """Transcriber.detect: best code is a valid language, probabilities
    are a distribution over the tokenizer's language layout."""
    best, probs = tiny_transcriber.detect(
        0.05 * rng.standard_normal(8000).astype(np.float32))
    tok = tiny_transcriber.tokenizer
    assert best in tok.languages
    assert set(probs) == set(tok.languages)
    assert sum(probs.values()) == pytest.approx(1.0, abs=1e-4)
    assert probs[best] == max(probs.values())
