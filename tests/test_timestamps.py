"""Whisper timestamp-rule decoding + temperature fallback heuristics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.infer.decode import TimestampRules, generate
from audax.infer.transcribe import (Transcriber, compression_ratio)
from audax.models.whisper import encode, init_whisper_params
from audax.symbolic.bpe import train_bpe
from audax.symbolic.tokenizer import WhisperTokenizer


@pytest.fixture(scope="module")
def setup():
    tok = WhisperTokenizer(train_bpe(["hello world how are you"] * 4,
                                     vocab_size=280), timestamp_count=101)
    cfg = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=64)
    params = init_whisper_params(cfg, jax.random.key(0))
    return params, cfg, tok


def _decode(params, cfg, tok, rng_np, temperature=0.0, seed=0):
    mel = jnp.asarray(rng_np.standard_normal((1, 64, 16)).astype(np.float32))
    enc = encode(params, cfg, mel)
    prompt = jnp.asarray([tok.sot_sequence(timestamps=True)], jnp.int32)
    rules = TimestampRules(tok.timestamp_begin, tok.eot)
    out = generate(params, cfg, enc, prompt, max_len=40, eos_id=tok.eot,
                   temperature=temperature, rng=jax.random.key(seed),
                   timestamps=rules)
    ids = [int(t) for t in np.asarray(out.tokens)[0, prompt.shape[1]:
                                                  int(out.lengths[0])]
           if t != tok.eot]
    return ids, out


@pytest.mark.parametrize("temperature,seed", [(0.0, 0), (1.5, 1), (1.5, 2)])
def test_timestamp_structure(setup, rng, temperature, seed):
    params, cfg, tok = setup
    ids, _ = _decode(params, cfg, tok, rng, temperature, seed)
    assert ids, "no tokens generated"
    # first generated token is a timestamp
    assert tok.is_timestamp(ids[0])
    # mirror openai ApplyTimestampRules exactly: before emitting ids[i],
    # last_was = ids[i-1] is a timestamp; penult = len<2 (defaults True —
    # a lone opener reads as a completed pair) or ids[i-2] is a timestamp.
    # last_was & penult  -> timestamps banned (text must follow)
    # last_was & ~penult -> text banned (the closing timestamp must follow)
    last_ts = -1
    for i, t in enumerate(ids):
        seq = ids[:i]
        last_was = len(seq) >= 1 and tok.is_timestamp(seq[-1])
        penult = len(seq) < 2 or tok.is_timestamp(seq[-2])
        if tok.is_timestamp(t):
            assert t >= last_ts
            last_ts = t
            assert not (last_was and penult), \
                "timestamp after a completed pair / lone opener"
        else:
            assert not (last_was and not penult), "text mid-pair"


def test_avg_logprob_accounting(setup, rng):
    params, cfg, tok = setup
    ids, out = _decode(params, cfg, tok, rng)
    prompt_len = len(tok.sot_sequence(timestamps=True))
    # every generated position (incl. EOT if emitted) is scored exactly once
    assert int(out.gen_count[0]) == int(out.lengths[0]) - prompt_len
    assert float(out.avg_logprob[0]) <= 0.0


def test_compression_ratio():
    assert compression_ratio("a a a a a a a a a a a a a a a a a a a a") > \
        compression_ratio("the quick brown fox jumps over the lazy dog")
    assert compression_ratio("") == 0.0


def test_transcriber_timestamps_and_fallback(setup, rng):
    params, cfg, tok = setup
    # Transcriber needs the whisper frontend shape (n_mels rows) — rebuild a
    # model with 80 mel bins for the real frontend path.
    tok80 = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280),
                             timestamp_count=1501)
    cfg80 = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=tok80.vocab_size, n_text_ctx=64)
    params80 = init_whisper_params(cfg80, jax.random.key(1))
    tr = Transcriber(params80, cfg80, tok80, max_new_tokens=12,
                     timestamps=True, backend="xla")
    audio = (0.05 * rng.standard_normal(16000 * 3)).astype(np.float32)
    res = tr.transcribe(audio)
    assert res.segments, "timestamped decode produced no segments"
    for seg in res.segments:
        assert 0.0 <= seg.start <= seg.end <= 30.0
        assert seg.temperature in (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)
    # with a random model the fallback ladder usually engages; just assert
    # the plumbing recorded an avg_logprob
    assert all(np.isfinite(s.avg_logprob) for s in res.segments)


def test_timestamp_rules_monotonicity_strictness():
    """Unit test of apply_timestamp_rules against openai's exact rule:
    mid-pair the closer may EQUAL the opener; a new opener must be STRICTLY
    greater (zero-width segment loops are impossible); before any timestamp,
    <|0.00|> is allowed."""
    import jax.numpy as jnp

    from audax.infer.decode import TimestampRules, apply_timestamp_rules

    ts0, eot, v = 20, 19, 31            # timestamps are ids 20..30
    rules = TimestampRules(ts0, eot)
    logits = jnp.zeros((1, v))
    neg = jnp.finfo(jnp.float32).min

    def masked(first, prev, prevprev, last):
        out = apply_timestamp_rules(
            logits, rules, first=jnp.bool_(first),
            prev_ts=jnp.asarray([prev]), prevprev_ts=jnp.asarray([prevprev]),
            last_ts=jnp.asarray([last], jnp.int32))
        return np.asarray(out)[0]

    # start: nothing emitted (last = ts0-1): 0.00 allowed, and openai bans
    # EVERYTHING below timestamp_begin at the first position — EOT included
    # (logits[:timestamp_begin] = -inf), so a quiet window still opens a
    # segment instead of returning empty
    m = masked(True, True, True, ts0 - 1)
    assert m[ts0] == 0.0 and m[ts0 + 5] == 0.0
    assert m[eot] == neg and m[0] == neg
    # after a LONE opening timestamp: (prev=True, prevprev=True) — the
    # len(seq)<2 rule makes the opener read as a completed pair, so text
    # must follow and timestamps are banned (regression: the carry init
    # used to leave this state unreachable, forcing a doubled opener)
    m = masked(False, True, True, ts0 + 5)
    assert m[0] == 0.0 and m[ts0 + 6] == neg
    # mid-pair after opener at ts0+5: closer may EQUAL the opener
    m = masked(False, True, False, ts0 + 5)
    assert m[ts0 + 5] == 0.0 and m[ts0 + 4] == neg
    # ... and EOT stays allowed mid-pair
    assert m[eot] == 0.0
    # after a completed pair ending at ts0+5, then text: next opener must be
    # STRICTLY greater
    m = masked(False, False, False, ts0 + 5)
    assert m[ts0 + 5] == neg and m[ts0 + 6] == 0.0


def test_opening_timestamp_followed_by_text(setup, rng):
    """End-to-end regression for the carry-init bug: the token after the
    forced opening timestamp must be drawn from TEXT (or EOT), never a
    second timestamp."""
    params, cfg, tok = setup
    for seed in range(4):
        ids, _ = _decode(params, cfg, tok, rng, temperature=1.2, seed=seed)
        assert ids and tok.is_timestamp(ids[0])
        if len(ids) > 1:
            assert not tok.is_timestamp(ids[1]), ids[:4]


def test_seek_by_timestamps(setup, rng):
    """openai's seek loop: windows advance to the last complete segment's
    end, so segment starts are NOT multiples of the window length, every
    boundary lands on a segment edge, progress is guaranteed, and the
    full audio is covered."""
    tok80 = WhisperTokenizer(train_bpe(["hello world"] * 3, vocab_size=280),
                             timestamp_count=1501)
    cfg80 = WhisperConfig(n_mels=80, n_audio_ctx=1500, d_model=32,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=tok80.vocab_size, n_text_ctx=64)
    params80 = init_whisper_params(cfg80, jax.random.key(2))
    tr = Transcriber(params80, cfg80, tok80, max_new_tokens=12,
                     timestamps=True, seek_by_timestamps=True,
                     temperature_fallback=False, backend="xla")
    audio = (0.05 * rng.standard_normal(16000 * 70)).astype(np.float32)
    res = tr.transcribe(audio)
    assert res.audio_seconds == pytest.approx(70.0)
    for seg in res.segments:
        assert 0.0 <= seg.start <= seg.end <= 70.0
    # monotonic, non-overlapping coverage up to the end of the audio
    ends = [s.end for s in res.segments]
    assert ends == sorted(ends)
    # seek covered the whole file: the loop terminated (this assertion
    # running at all proves forward progress) and the last decode window
    # reached the audio tail
    assert max(ends, default=0.0) > 40.0
