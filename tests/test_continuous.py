"""Continuous batching engine: slot refill mid-flight must reproduce the
fixed-batch generate() result per request (greedy), including after a slot
has been reused — stale self-KV from the previous occupant must be
unreachable under the per-slot causal mask."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.frontend import LogMelFrontend
from audax.infer.continuous import ContinuousBatcher
from audax.infer.decode import generate
from audax.models.whisper import encode, init_whisper_params
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


def _reference_ids(params, cfg, tok, samples, *, max_new, budget=None,
                   kv_quant=False):
    """What generate() produces for one request on its own. ``budget``
    truncates the generated stream to k tokens (incl. any EOT) WITHOUT
    shrinking the KV cache — random-weight logits are near-uniform, so the
    comparison must hold cache shapes fixed to keep argmax ties stable."""
    fe = LogMelFrontend.whisper(cfg.n_mels)
    window = 30 * fe.cfg.sample_rate
    x = np.zeros(window, np.float32)
    x[: len(samples)] = samples[: window]
    mel = fe(jnp.asarray(x[None]))
    enc = encode(params, cfg, mel)
    prompt = jnp.asarray([tok.sot_sequence(lang="en")], jnp.int32)
    # the engine's default SuppressTokens="-1" (specials + the vocab's
    # non-speech symbol set) — the generate side must match exactly
    suppress = jnp.asarray(sorted(
        set([i for i in tok.special_ids() if i != tok.eot]
            + tok.non_speech_tokens())), jnp.int32)
    res = generate(params, cfg, enc, prompt,
                   max_len=min(prompt.shape[1] + max_new, cfg.n_text_ctx),
                   eos_id=tok.eot, suppress=suppress, kv_quant=kv_quant)
    p = prompt.shape[1]
    n = int(res.lengths[0])
    raw = np.asarray(res.tokens)[0, p:n]
    if budget is not None:
        raw = raw[:budget]
    return [int(t) for t in raw if t != tok.eot]


@pytest.mark.parametrize("kv_quant", [False, True])
def test_continuous_matches_generate(setup, rng, kv_quant):
    """4 requests through 2 slots (forced refills) == per-request
    generate(), token for token."""
    params, cfg, tok = setup
    sr = 16000
    reqs = {f"r{i}": 0.01 * rng.standard_normal(sr).astype(np.float32)
            for i in range(4)}
    cb = ContinuousBatcher(params, cfg, tok, slots=2, max_new_tokens=6,
                           steps_per_sync=4, kv_quant=kv_quant)
    for rid, samples in reqs.items():
        cb.submit(rid, samples)
    results = {r.request_id: r for r in cb.run()}
    assert set(results) == set(reqs)
    assert cb.chunks_run >= 2           # refill really happened mid-flight
    for rid, samples in reqs.items():
        ref = _reference_ids(params, cfg, tok, samples, max_new=6,
                             kv_quant=kv_quant)
        assert results[rid].tokens == ref, rid
        assert results[rid].text == tok.decode(ref)
        assert results[rid].audio_seconds == 1.0   # actual clip, not window


def test_submit_during_serving(setup, rng):
    """Requests submitted while slots are mid-decode are admitted as slots
    free up, not dropped."""
    params, cfg, tok = setup
    sr = 16000
    cb = ContinuousBatcher(params, cfg, tok, slots=2, max_new_tokens=6,
                           steps_per_sync=2)
    cb.submit("a", 0.01 * rng.standard_normal(sr).astype(np.float32))
    cb.submit("b", 0.01 * rng.standard_normal(sr).astype(np.float32))
    got = list(cb.step())               # both admitted, decoding
    cb.submit("c", 0.01 * rng.standard_normal(sr).astype(np.float32))
    while cb.pending() or cb.live():
        got.extend(cb.step())
    assert {r.request_id for r in got} == {"a", "b", "c"}
    for r in got:
        assert np.isfinite(r.avg_logprob)


def test_per_request_token_budget(setup, rng):
    """submit(max_new_tokens=k) caps that request alone (serving-API
    max_tokens semantics). Compared against an unbudgeted run of the SAME
    engine at the same slot count: live rows of a fixed-shape batch compute
    identically, so each budgeted result must be the k-truncation of the
    unbudgeted one. (A B=1 generate() reference would differ in batch
    numerics — random-weight logits are near-uniform, so argmax ties flip.)"""
    params, cfg, tok = setup
    sr = 16000
    budgets = {"short": 2, "mid": 5, "long": 9}
    audio = {rid: 0.01 * rng.standard_normal(sr).astype(np.float32)
             for rid in budgets}

    def serve(caps):
        cb = ContinuousBatcher(params, cfg, tok, slots=3, max_new_tokens=12,
                               steps_per_sync=3)
        for rid in budgets:
            cb.submit(rid, audio[rid], max_new_tokens=caps.get(rid))
        return {r.request_id: r for r in cb.run()}

    capped = serve(budgets)
    free = serve({})
    assert set(capped) == set(budgets)
    for rid, k in budgets.items():
        assert capped[rid].tokens == free[rid].tokens[:k], rid
        assert len(capped[rid].tokens) <= k


def test_per_request_language(setup, rng):
    """submit(lang=...) decodes THAT slot under the requested language's
    sot prompt (serving-API language param): a 'de' request through an
    'en'-default engine must equal the same clip through a 'de'-default
    engine."""
    params, cfg, tok = setup
    clip = 0.01 * rng.standard_normal(16000).astype(np.float32)

    en = ContinuousBatcher(params, cfg, tok, slots=2, max_new_tokens=5,
                           steps_per_sync=4, lang="en")
    en.submit("a", clip)
    en.submit("b", clip, lang="de")
    got = {r.request_id: r.tokens for r in en.run()}

    de = ContinuousBatcher(params, cfg, tok, slots=2, max_new_tokens=5,
                           steps_per_sync=4, lang="de")
    de.submit("c", clip)
    de.submit("d", clip)                 # same batch shape as the en run
    ref = {r.request_id: r.tokens for r in de.run()}
    assert got["b"] == ref["c"]


def test_bucketed_admit_padding_is_inert(setup, rng):
    """Admitting a non-power-of-two request count uses a padded bucket;
    the padding rows (slot_id == slots, out of bounds) must not touch ANY
    slot's state, and every real request must still complete."""
    params, cfg, tok = setup
    cb = ContinuousBatcher(params, cfg, tok, slots=4, max_new_tokens=5,
                           steps_per_sync=8)
    for i in range(3):                   # bucket rounds 3 -> 4: one pad row
        cb.submit(f"r{i}",
                  0.01 * rng.standard_normal(16000).astype(np.float32))
    cb._admit_waiting()
    assert cb.live() == 3
    state = cb._state
    # the never-admitted slot keeps its init state: free and zero cross-KV
    assert bool(np.asarray(state.done)[3])
    k = state.cross_kv[0] if isinstance(state.cross_kv, tuple) \
        else state.cross_kv.k_q
    assert np.abs(np.asarray(k[:, 3])).sum() == 0
    assert np.abs(np.asarray(k[:, :3])).sum() > 0
    results = cb.run()
    assert {r.request_id for r in results} == {"r0", "r1", "r2"}


def test_warmup_resets_telemetry(setup):
    params, cfg, tok = setup
    cb = ContinuousBatcher(params, cfg, tok, slots=2, max_new_tokens=4,
                           steps_per_sync=4)
    cb.warmup()
    assert cb.steps_run == 0 and cb.chunks_run == 0
    assert cb.live() == 0 and cb.pending() == 0


# ------------------------------------------------- two-tower generator ----
from audax.core.config import TwoTowerConfig  # noqa: E402
from audax.infer.continuous import ContinuousGenerator  # noqa: E402
from audax.models.causal_lm import CausalLMConfig, init_causal_lm  # noqa: E402
from audax.models.two_tower import TwoTowerModel, init_adapter  # noqa: E402

START, END = 0, 1
WIN_S = 0.64                        # 10240 samples -> 64 frames -> S=32


@pytest.fixture(scope="module")
def tt_model():
    audio = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=24,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=40, n_text_ctx=8)
    lm = CausalLMConfig(vocab_size=64, d_model=32, layers=2, heads=4,
                        kv_heads=2, ffn_dim=64, tie_embeddings=True,
                        rope_theta=1e4)
    tt = TwoTowerConfig(adapter_heads=4)
    audio_params = init_whisper_params(audio, jax.random.key(0))
    lm_params = init_causal_lm(lm, jax.random.key(1))
    adapter = init_adapter(jax.random.key(2), audio.d_model, lm.d_model,
                           heads=tt.adapter_heads)
    return TwoTowerModel(audio_params, audio,
                         {"adapter": adapter, "lm": lm_params}, lm, tt)


def _gen_reference(model, samples, *, max_new, params=None):
    """model.generate (fixed batch, B=1, greedy) on the same window."""
    fe = LogMelFrontend.whisper(model.audio_cfg.n_mels)
    window = int(WIN_S * fe.cfg.sample_rate)
    x = np.zeros(window, np.float32)
    x[: len(samples)] = samples[: window]
    enc = model.encode_audio(fe(jnp.asarray(x[None])))
    tokens, lengths = model.generate(
        model.params if params is None else params, enc, start_id=START,
        end_id=END, max_len=1 + max_new, temperature=0.0)
    n = int(np.asarray(lengths)[0])
    return [int(t) for t in np.asarray(tokens)[0, 1:n] if t != END]


def test_generator_matches_generate(tt_model, rng):
    """3 clips through 2 slots (forced refill) at temperature 0 == the
    fixed-batch model.generate per clip, token for token."""
    sr = 16000
    reqs = {f"m{i}": 0.05 * rng.standard_normal(8000).astype(np.float32)
            for i in range(3)}
    g = ContinuousGenerator(tt_model, start_id=START, end_id=END, slots=2,
                            window_seconds=WIN_S, max_new_tokens=6,
                            temperature=0.0, steps_per_sync=3)
    for rid, samples in reqs.items():
        g.submit(rid, samples)
    results = {r.request_id: r for r in g.run()}
    assert set(results) == set(reqs)
    assert g.chunks_run >= 2
    for rid, samples in reqs.items():
        assert results[rid].tokens == _gen_reference(tt_model, samples,
                                                     max_new=6), rid


def test_generator_seeded_sampling_is_slot_invariant(tt_model, rng):
    """temperature>0: a request's sampled tokens depend only on its
    (seed, position) stream — identical across arrival orders, slot
    assignments, and admit bucket shapes."""
    sr = 16000
    audio = {f"m{i}": 0.05 * rng.standard_normal(sr).astype(np.float32)
             for i in range(3)}
    seeds = {"m0": 11, "m1": 23, "m2": 37}

    def serve(order):
        g = ContinuousGenerator(tt_model, start_id=START, end_id=END,
                                slots=2, window_seconds=WIN_S,
                                max_new_tokens=8, temperature=0.7,
                                steps_per_sync=4)
        for rid in order:
            g.submit(rid, audio[rid], seed=seeds[rid])
        return {r.request_id: r.tokens for r in g.run()}

    a = serve(["m0", "m1", "m2"])
    b = serve(["m2", "m0", "m1"])
    assert a == b
    # and the sampled streams are genuinely different across seeds
    assert len({tuple(v) for v in a.values()}) > 1


def test_tp_continuous_matches_replicated(setup, rng):
    """TP=2 serving: sharded params + head-sharded KV state through the
    SAME chunk/admit programs must reproduce the replicated engine's
    tokens across slot refills."""
    from audax.core.config import MeshConfig
    from audax.parallel.mesh import make_mesh
    from audax.parallel.sharding import shard_params

    params, cfg, tok = setup
    mesh = make_mesh(MeshConfig(model=2))
    reqs = {f"t{i}": 0.01 * rng.standard_normal(16000).astype(np.float32)
            for i in range(3)}

    def serve(p, m):
        cb = ContinuousBatcher(p, cfg, tok, slots=2, max_new_tokens=6,
                               steps_per_sync=4, mesh=m)
        for rid, samples in reqs.items():
            cb.submit(rid, samples)
        return {r.request_id: r for r in cb.run()}

    ref = serve(params, None)
    tp = serve(shard_params(params, mesh), mesh)
    assert set(tp) == set(ref)
    for rid in reqs:
        assert tp[rid].tokens == ref[rid].tokens, rid
        np.testing.assert_allclose(tp[rid].avg_logprob, ref[rid].avg_logprob,
                                   atol=1e-4, rtol=1e-4)


def test_tp_generator_matches_replicated(tt_model, rng):
    """TP=2 two-tower serving: LM params Megatron-sharded, LM KV cache
    head-sharded; greedy tokens must equal the replicated engine's."""
    from audax.core.config import MeshConfig
    from audax.parallel.mesh import make_mesh
    from audax.parallel.sharding import CAUSAL_LM_TP_RULES, shard_params

    mesh = make_mesh(MeshConfig(model=2))
    reqs = {f"g{i}": 0.05 * rng.standard_normal(8000).astype(np.float32)
            for i in range(3)}

    def serve(p, m):
        g = ContinuousGenerator(tt_model, params=p, start_id=START,
                                end_id=END, slots=2, window_seconds=WIN_S,
                                max_new_tokens=6, temperature=0.0,
                                steps_per_sync=3, mesh=m)
        for rid, samples in reqs.items():
            g.submit(rid, samples)
        return {r.request_id: r.tokens for r in g.run()}

    ref = serve(None, None)
    tp_params = {"adapter": tt_model.params["adapter"],
                 "lm": shard_params(tt_model.params["lm"], mesh,
                                    CAUSAL_LM_TP_RULES)}
    tp = serve(tp_params, mesh)
    assert tp == ref


def test_generator_quantized_params_drop_in(tt_model, rng):
    """int8 weight-only params serve unchanged through the engine (dense
    dispatch on kernel_q; embed_lookup on embed_q) and match the
    fixed-batch generate() run on the SAME quantized tree."""
    from audax.models.quantize import quantize_tree
    qp = quantize_tree(tt_model.params)
    samples = 0.05 * rng.standard_normal(8000).astype(np.float32)
    g = ContinuousGenerator(tt_model, params=qp, start_id=START,
                            end_id=END, slots=2, window_seconds=WIN_S,
                            max_new_tokens=5, temperature=0.0,
                            steps_per_sync=4)
    g.submit("q", samples)
    res = {r.request_id: r for r in g.run()}
    ref = _gen_reference(tt_model, samples, max_new=5, params=qp)
    assert res["q"].tokens == ref


def test_generator_constrained(tt_model, rng):
    """Engine-level constrained decoding: every emitted token of every
    request is in the allowed set."""
    allowed = [5, 9, 12, 33]
    g = ContinuousGenerator(tt_model, start_id=START, end_id=END, slots=2,
                            window_seconds=WIN_S, max_new_tokens=6,
                            temperature=0.7, steps_per_sync=3,
                            allowed_ids=allowed)
    for i in range(3):
        g.submit(f"c{i}", 0.05 * rng.standard_normal(8000)
                 .astype(np.float32), seed=i)
    ok = set(allowed) | {END}
    for r in g.run():
        assert set(r.tokens) <= ok, r.tokens


def test_suppress_blank_engine_matches_generate(setup, rng):
    """ContinuousBatcher(suppress_blank=True) == generate() with the same
    first_suppress set, across a refill (per-slot pos vectors key the
    first-position ban, so slot reuse stays exact)."""
    params, cfg, tok = setup
    sr = 16000
    fs = jnp.asarray(sorted(set(tok.encode(" ") + [tok.eot])), jnp.int32)
    reqs = {f"s{i}": 0.01 * rng.standard_normal(sr).astype(np.float32)
            for i in range(3)}
    cb = ContinuousBatcher(params, cfg, tok, slots=2, max_new_tokens=6,
                           steps_per_sync=4, suppress_blank=True)
    for rid, samples in reqs.items():
        cb.submit(rid, samples)
    results = {r.request_id: r for r in cb.run()}
    fe = LogMelFrontend.whisper(cfg.n_mels)
    window = 30 * fe.cfg.sample_rate
    # the engine's default SuppressTokens="-1" (specials + the vocab's
    # non-speech symbol set) — the generate side must match exactly
    suppress = jnp.asarray(sorted(
        set([i for i in tok.special_ids() if i != tok.eot]
            + tok.non_speech_tokens())), jnp.int32)
    for rid, samples in reqs.items():
        x = np.zeros(window, np.float32)
        x[: len(samples)] = samples
        enc = encode(params, cfg, fe(jnp.asarray(x[None])))
        prompt = jnp.asarray([tok.sot_sequence(lang="en")], jnp.int32)
        res = generate(params, cfg, enc, prompt,
                       max_len=min(prompt.shape[1] + 6, cfg.n_text_ctx),
                       eos_id=tok.eot, suppress=suppress, first_suppress=fs)
        p = prompt.shape[1]
        ref = [int(t) for t in
               np.asarray(res.tokens)[0, p:int(res.lengths[0])]
               if t != tok.eot]
        assert results[rid].tokens == ref, rid
        blank = set(int(i) for i in fs.tolist())
        if results[rid].tokens:
            assert results[rid].tokens[0] not in blank
