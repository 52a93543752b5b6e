"""Beam search: width-1 equals greedy; scores ordered; EOS freezing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.infer.beam import beam_search
from audax.infer.decode import generate
from audax.models.whisper import encode, init_whisper_params

CFG = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32, encoder_layers=1,
                    decoder_layers=2, heads=2, vocab_size=90, n_text_ctx=32)


@pytest.fixture(scope="module")
def model(rng_factory=None):
    params = init_whisper_params(CFG, jax.random.key(0))
    return params


def _enc(params, rng, b=2):
    mel = jnp.asarray(rng.standard_normal((b, 64, 16)).astype(np.float32))
    return encode(params, CFG, mel)


def test_beam1_equals_greedy(model, rng):
    enc = _enc(model, rng)
    prompt = jnp.asarray([[1, 3], [1, 3]], jnp.int32)
    greedy = generate(model, CFG, enc, prompt, max_len=20, eos_id=2)
    beam = beam_search(model, CFG, enc, prompt, max_len=20, eos_id=2,
                       beam_width=1)
    np.testing.assert_array_equal(np.asarray(beam.tokens[:, 0]),
                                  np.asarray(greedy.tokens))
    np.testing.assert_array_equal(np.asarray(beam.lengths[:, 0]),
                                  np.asarray(greedy.lengths))


def test_beam_width_scores_sorted_and_distinct(model, rng):
    enc = _enc(model, rng, b=1)
    prompt = jnp.asarray([[1]], jnp.int32)
    beam = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                       beam_width=4)
    scores = np.asarray(beam.scores[0])
    assert (np.diff(scores) <= 1e-6).all()          # best first
    toks = np.asarray(beam.tokens[0])
    # at least two distinct hypotheses among the 4 beams
    assert len({tuple(row) for row in toks}) >= 2
    # the best beam's score beats or equals the others by construction
    assert scores[0] >= scores[-1]


def test_beam_diverse_with_multitoken_prompt(model, rng):
    """Regression (review finding): with ANY prompt length >= 2 — every
    real SOT sequence is >= 3 tokens — the prompt-step score update used
    to gather beam 0's score 0 into every lane, wiping the -inf lane init
    and collapsing beam search into W identical greedy decodes."""
    enc = _enc(model, rng, b=1)
    for p in ([[1, 5]], [[1, 5, 9]]):
        prompt = jnp.asarray(p, jnp.int32)
        beam = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                           beam_width=4)
        toks = np.asarray(beam.tokens[0])
        assert len({tuple(row) for row in toks}) >= 2, (p, toks)
        scores = np.asarray(beam.scores[0])
        # distinct hypotheses should not all carry one identical score
        assert len(set(np.round(scores, 5))) >= 2, scores


def test_beam_best_at_least_greedy(model, rng):
    """Length-normalized best-beam score >= the greedy path's avg logprob
    (beam explores a superset)."""
    enc = _enc(model, rng, b=1)
    prompt = jnp.asarray([[1]], jnp.int32)
    greedy = generate(model, CFG, enc, prompt, max_len=16, eos_id=2)
    beam = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                       beam_width=4)
    greedy_avg = float(np.asarray(greedy.avg_logprob)[0])
    assert float(np.asarray(beam.scores)[0, 0]) >= greedy_avg - 1e-4


def test_beam_suppress(model, rng):
    enc = _enc(model, rng, b=1)
    prompt = jnp.asarray([[1]], jnp.int32)
    free = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                       beam_width=2)
    emitted = set(np.asarray(free.tokens[0, 0, 1:]).tolist()) - {0, 2}
    if not emitted:
        pytest.skip("nothing emitted to suppress")
    banned = jnp.asarray(sorted(emitted), jnp.int32)
    out = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                      beam_width=2, suppress=banned)
    gen = np.asarray(out.tokens[0, :, 1:])
    assert not set(gen.ravel().tolist()) & set(np.asarray(banned).tolist())


def test_transcriber_beam_mode(rng):
    """Transcriber(beam_width=K): beam decode at temperature 0, with
    timestamp rules enforced inside the beam (first token is a timestamp,
    monotonic, no doubled opener)."""
    import numpy as np

    from audax.infer.transcribe import Transcriber
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    tok = WhisperTokenizer(train_bpe(["hello world how are you"] * 4,
                                     vocab_size=280), timestamp_count=1501)
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=300, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=48)
    params = init_whisper_params(cfg, jax.random.key(7))
    tr = Transcriber(params, cfg, tok, max_new_tokens=12, timestamps=True,
                     temperature_fallback=False, beam_width=3, backend="xla")
    audio = (0.05 * rng.standard_normal(16000 * 3)).astype(np.float32)
    (res_one, _) = tr._decode_chunk_batch(
        np.asarray(audio[: tr.chunk_samples])[None])
    ids, avg_lp, temp, _, _ = res_one[0]
    assert temp == 0.0 and np.isfinite(avg_lp)
    assert ids and tok.is_timestamp(ids[0])
    # openai ApplyTimestampRules walk (see test_timestamps.py): the lone
    # opener reads as a completed pair (len<2 rule), so text must follow it
    last = -1
    for i, t in enumerate(ids):
        seq = ids[:i]
        last_was = len(seq) >= 1 and tok.is_timestamp(seq[-1])
        penult = len(seq) < 2 or tok.is_timestamp(seq[-2])
        if tok.is_timestamp(t):
            assert t >= last
            last = t
            assert not (last_was and penult), \
                "timestamp after a completed pair / lone opener"
        else:
            assert not (last_was and not penult), "text mid-pair"
    # full transcribe with segments also works in beam mode
    out = tr.transcribe(audio)
    assert out.segments


def test_fcfs_partition_openai_scan_order():
    """Unit test of the candidate classification against openai's
    BeamSearchDecoder.update scan (whisper/decoding.py): candidates are
    walked best-first; EOTs before the W-th live candidate are pooled in
    scan order; non-EOTs fill lanes 0..W-1; everything after the W-th
    live candidate is dropped."""
    from audax.infer.beam import _fcfs_partition

    v, eos, w = 10, 7, 2
    # best-first candidate token ids (beam*v + tok): EOT, live, EOT, live,
    # then trailing candidates past the break
    top_idx = jnp.asarray([[0 * v + eos, 0 * v + 3, 1 * v + eos, 1 * v + 4]])
    is_live, lane, is_pooled, pool_rank = _fcfs_partition(top_idx, v, eos, w)
    np.testing.assert_array_equal(np.asarray(is_live[0]),
                                  [False, True, False, True])
    np.testing.assert_array_equal(np.asarray(lane[0])[[1, 3]], [0, 1])
    np.testing.assert_array_equal(np.asarray(is_pooled[0]),
                                  [True, False, True, False])
    np.testing.assert_array_equal(np.asarray(pool_rank[0])[[0, 2]], [0, 1])

    # an EOT ranked AFTER the W-th live candidate is discarded (openai's
    # loop breaks once beam_size live candidates are collected)
    top_idx = jnp.asarray([[0 * v + 1, 0 * v + 2, 1 * v + eos, 1 * v + 5]])
    is_live, lane, is_pooled, _ = _fcfs_partition(top_idx, v, eos, w)
    np.testing.assert_array_equal(np.asarray(is_live[0]),
                                  [True, True, False, False])
    assert not bool(np.asarray(is_pooled).any())


def test_fcfs_pool_drops_later_better_candidates():
    """The FCFS contract, tested where it can actually FAIL: a full pool
    (cnt == m) drops every new candidate — even top-ranked (best-scoring)
    ones — and a nearly-full pool inserts exactly in first-come order. A
    keep-best-scoring eviction policy would violate both."""
    from audax.infer.beam import _pool_slots

    m = 3
    # pool already full: the step's best candidate (rank 0) is pooled and
    # would WIN a keep-best policy — FCFS must drop it (slot == m)
    is_pooled = jnp.asarray([[True, False, True, False]])
    pool_rank = jnp.asarray([[0, 0, 1, 1]])
    slot, ok = _pool_slots(is_pooled, pool_rank, jnp.asarray([m]), m)
    assert not bool(np.asarray(ok).any())
    assert (np.asarray(slot) == m).all()

    # one slot left, two finishing candidates: only the FIRST (scan-order,
    # not score-order beyond it) gets in
    slot, ok = _pool_slots(is_pooled, pool_rank, jnp.asarray([m - 1]), m)
    np.testing.assert_array_equal(np.asarray(ok[0]),
                                  [True, False, False, False])
    assert int(slot[0, 0]) == m - 1 and int(slot[0, 2]) == m

    # independent per-row counts
    is_pooled2 = jnp.asarray([[True, True], [True, True]])
    rank2 = jnp.asarray([[0, 1], [0, 1]])
    slot2, ok2 = _pool_slots(is_pooled2, rank2, jnp.asarray([0, m]), m)
    np.testing.assert_array_equal(np.asarray(ok2),
                                  [[True, True], [False, False]])


def test_finalize_pads_only_below_beam_width(model, rng):
    """openai finalize gate: in-flight beams pad the pool only when fewer
    than beam_width candidates finished, and only up to beam_width — a
    patience pool with >= W finished takes NO unfinished hypotheses.
    Observable: every patience-run hypothesis that differs from the base
    run's must be finished (length < max_len) OR the base run must itself
    contain unfinished lanes."""
    enc = _enc(model, rng, b=1)
    prompt = jnp.asarray([[1]], jnp.int32)
    max_len = 14                # tight budget: forces the finalize path
    base = beam_search(model, CFG, enc, prompt, max_len=max_len, eos_id=2,
                       beam_width=2)
    pat = beam_search(model, CFG, enc, prompt, max_len=max_len, eos_id=2,
                      beam_width=2, patience=3.0)
    base_unfinished = int((np.asarray(base.lengths) == max_len).sum())
    pat_unfinished = int((np.asarray(pat.lengths) == max_len).sum())
    # the pad gate can only ever ADD up to W unfinished lanes, and the
    # patience run (bigger pool of finished candidates) may never return
    # MORE unfinished hypotheses than the base run
    assert pat_unfinished <= base_unfinished
    assert pat_unfinished <= 2


def test_patience_one_is_identity_and_invalid_rejected(model, rng):
    """patience=1.0 is bit-identical to the default search; patience<1
    violates the openai contract and raises."""
    enc = _enc(model, rng, b=1)
    prompt = jnp.asarray([[1]], jnp.int32)
    base = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                       beam_width=3)
    p1 = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                     beam_width=3, patience=1.0)
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(p1.tokens))
    np.testing.assert_array_equal(np.asarray(base.scores),
                                  np.asarray(p1.scores))
    with pytest.raises(ValueError, match="patience"):
        beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                    beam_width=3, patience=0.5)


def test_patience_widens_candidates(model, rng):
    """patience=2.0 searches 2W lanes and still returns W best-first
    hypotheses whose best is >= the no-patience best (wider candidate
    pool under the same ranker)."""
    enc = _enc(model, rng, b=2)
    prompt = jnp.asarray([[1], [1]], jnp.int32)
    base = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                       beam_width=2)
    pat = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                      beam_width=2, patience=2.0)
    assert pat.tokens.shape == base.tokens.shape == (2, 2, 16)
    s = np.asarray(pat.scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    assert (s[:, 0] >= np.asarray(base.scores)[:, 0] - 1e-6).all()


def test_length_penalty_is_gnmt_formula(model, rng):
    """length_penalty=alpha ranks by sum_logprob / ((5+len)/6)^alpha
    (openai MaximumLikelihoodRanker); returned scores follow the formula
    exactly and sum_logprob is the raw sum."""
    enc = _enc(model, rng, b=1)
    prompt = jnp.asarray([[1]], jnp.int32)
    alpha = 0.8
    res = beam_search(model, CFG, enc, prompt, max_len=16, eos_id=2,
                      beam_width=3, length_penalty=alpha)
    gen_len = np.maximum(np.asarray(res.lengths) - 1, 1)
    want = np.asarray(res.sum_logprob) / ((5.0 + gen_len) / 6.0) ** alpha
    np.testing.assert_allclose(np.asarray(res.scores), want, rtol=1e-5)
    assert (np.diff(np.asarray(res.scores), axis=1) <= 1e-6).all()


def test_transcriber_best_of_picks_ranker_max(rng):
    """Transcriber(best_of=K) at a t>0 rung: K candidates are sampled
    batched (tiled rows) and the returned hypothesis is the ranker's max —
    reproduced independently by tiling generate() by hand (same PRNG, so
    the candidate set is identical)."""
    from audax.infer.transcribe import Transcriber
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer

    tok = WhisperTokenizer(train_bpe(["hello world how are you"] * 4,
                                     vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=100, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=48)
    params = init_whisper_params(cfg, jax.random.key(3))
    tr = Transcriber(params, cfg, tok, max_new_tokens=8,
                     temperature_fallback=False, best_of=3, backend="xla",
                     temperatures=(0.7,))
    audio = (0.05 * rng.standard_normal(tr.chunk_samples)).astype(np.float32)
    mel = tr.frontend(jnp.asarray(audio)[None])
    enc_states = encode(params, cfg, mel)
    prompt = tr._prompt(1, None, "en")
    out = tr._decode_once(enc_states, prompt, 0.7)
    assert out.tokens.shape[0] == 1

    # hand-tiled candidate set with the same fixed PRNG
    max_len = min(prompt.shape[1] + 8, cfg.n_text_ctx)
    hand = generate(params, cfg, jnp.repeat(enc_states, 3, 0),
                    jnp.asarray(np.repeat(prompt, 3, 0)), max_len=max_len,
                    eos_id=tok.eot, temperature=0.7,
                    suppress=jnp.asarray(tr.suppress),
                    first_suppress=jnp.asarray(tr.first_suppress),
                    no_speech_id=tok.no_speech)
    avg = np.asarray(hand.sum_logprob) / np.maximum(
        np.asarray(hand.gen_count), 1)
    best = int(avg.argmax())
    np.testing.assert_array_equal(np.asarray(out.tokens[0]),
                                  np.asarray(hand.tokens[best]))
    np.testing.assert_allclose(float(out.avg_logprob[0]), avg[best],
                               rtol=1e-6)
    # the pick is meaningful: candidates differ (independent gumbel rows)
    assert len({tuple(np.asarray(r)) for r in hand.tokens}) >= 2
