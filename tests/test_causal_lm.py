"""Causal LM parity vs HF (random tiny Qwen2/Qwen3 configs, no network),
KV-cache decode consistency, vocab-resize contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.models.causal_lm import (CausalLMConfig, embed_tokens,
                                    forward_with_embeds, init_causal_lm,
                                    init_lm_cache, lm_decode_step, lm_forward,
                                    port_causal_lm_from_hf, resize_embeddings)

TINY = CausalLMConfig(vocab_size=120, d_model=32, layers=2, heads=4,
                      kv_heads=2, ffn_dim=64, qkv_bias=True, qk_norm=False,
                      tie_embeddings=True, rope_theta=1e4)


def _hf_qwen2(tie=True):
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM
    hc = Qwen2Config(
        vocab_size=TINY.vocab_size, hidden_size=TINY.d_model,
        num_hidden_layers=TINY.layers, num_attention_heads=TINY.heads,
        num_key_value_heads=TINY.kv_heads, intermediate_size=TINY.ffn_dim,
        rope_theta=TINY.rope_theta, rms_norm_eps=1e-6,
        tie_word_embeddings=tie, max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return Qwen2ForCausalLM(hc).eval()


@pytest.mark.parametrize("tie", [True, False])
def test_qwen2_logit_parity(tie, rng):
    torch = pytest.importorskip("torch")
    hf = _hf_qwen2(tie)
    params, cfg = port_causal_lm_from_hf(hf)
    assert cfg.tie_embeddings == tie
    tokens = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int32)
    ours = np.asarray(lm_forward(params, cfg, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


def test_qwen3_style_qk_norm_parity(rng):
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen3Config, Qwen3ForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Qwen3")
    hc = Qwen3Config(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        head_dim=8, rope_theta=1e6, tie_word_embeddings=True,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(hc).eval()
    params, cfg = port_causal_lm_from_hf(hf)
    assert cfg.qk_norm
    tokens = rng.integers(0, 100, (1, 7)).astype(np.int32)
    ours = np.asarray(lm_forward(params, cfg, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


def test_qwen3_decoupled_head_dim_parity(rng):
    """Regression (review finding): real Qwen3 checkpoints DECOUPLE
    head_dim from hidden_size//heads (0.6B: hidden 1024, 16 heads,
    head_dim 128). The port used to derive head_dim and break every
    q/k/v reshape; this config makes head_dim (16) != hidden//heads (8)."""
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen3Config, Qwen3ForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Qwen3")
    hc = Qwen3Config(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        head_dim=16, rope_theta=1e6, tie_word_embeddings=True,
        max_position_embeddings=64, attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = Qwen3ForCausalLM(hc).eval()
    params, cfg = port_causal_lm_from_hf(hf)
    assert cfg.head_dim == 16 and cfg.d_model == 32
    tokens = rng.integers(0, 100, (1, 7)).astype(np.int32)
    ours = np.asarray(lm_forward(params, cfg, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)
    # KV-cached decode agrees under the decoupled head_dim too
    cache = init_lm_cache(cfg, batch=1, max_len=8)
    outs = []
    for t in range(7):
        emb = embed_tokens(params, jnp.asarray(tokens[:, t]))
        logits, cache = lm_decode_step(params, cfg, emb, jnp.int32(t), cache)
        outs.append(logits)
    stepped = np.asarray(jnp.stack(outs, axis=1))
    np.testing.assert_allclose(stepped, ours, atol=2e-5, rtol=1e-4)


def test_attention_mask_padding(rng):
    params = init_causal_lm(TINY, jax.random.key(0))
    toks = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 6)), jnp.int32)
    # same prefix with extra padded tail must give identical prefix logits
    mask = jnp.asarray([[1, 1, 1, 1, 0, 0]])
    full = lm_forward(params, TINY, toks, attention_mask=mask)
    short = lm_forward(params, TINY, toks[:, :4])
    np.testing.assert_allclose(np.asarray(full[:, :4]), np.asarray(short),
                               atol=1e-5, rtol=1e-4)


def test_kv_cache_decode_matches_full(rng):
    params = init_causal_lm(TINY, jax.random.key(0))
    toks = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 5)), jnp.int32)
    full = lm_forward(params, TINY, toks)
    cache = init_lm_cache(TINY, batch=2, max_len=8)
    outs = []
    for t in range(5):
        emb = embed_tokens(params, toks[:, t])
        logits, cache = lm_decode_step(params, TINY, emb, jnp.int32(t), cache)
        outs.append(logits)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def test_ragged_decode_matches_scalar(rng):
    """Per-slot [B] positions (continuous batching): a row decoding at its
    own depth must produce the same logits as a B=1 scalar-pos decode of
    that row alone — including a 'refilled' row whose cache still holds a
    previous occupant's K/V beyond its position (masked + overwritten)."""
    params = init_causal_lm(TINY, jax.random.key(0))
    toks0 = rng.integers(0, TINY.vocab_size, 5).astype(np.int32)
    toks1 = rng.integers(0, TINY.vocab_size, 3).astype(np.int32)

    refs = []
    for toks in (toks0, toks1):
        cache = init_lm_cache(TINY, batch=1, max_len=8)
        outs = []
        for t in range(len(toks)):
            emb = embed_tokens(params, jnp.asarray(toks[None, t]))
            lg, cache = lm_decode_step(params, TINY, emb, jnp.int32(t),
                                       cache)
            outs.append(np.asarray(lg[0]))
        refs.append(outs)

    # ragged batch: row 1 joins 2 steps late (its early dummy writes at
    # pos 0 are overwritten when it really starts — the refill scenario)
    cache = init_lm_cache(TINY, batch=2, max_len=8)
    got0, got1 = [], []
    for i in range(5):
        p0, p1 = i, max(i - 2, 0)
        tok = jnp.asarray([toks0[p0], toks1[p1]], jnp.int32)
        emb = embed_tokens(params, tok)
        lg, cache = lm_decode_step(
            params, TINY, emb, jnp.asarray([p0, p1], jnp.int32), cache)
        got0.append(np.asarray(lg[0]))
        if i >= 2:
            got1.append(np.asarray(lg[1]))
    np.testing.assert_allclose(np.stack(got0), np.stack(refs[0]),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.stack(got1), np.stack(refs[1]),
                               atol=2e-5, rtol=1e-4)


def test_forward_with_embeds_fusion_prefix(rng):
    """Audio-prefix fusion path: prepending non-token embeddings shifts
    positions correctly (two-tower usage)."""
    params = init_causal_lm(TINY, jax.random.key(0))
    toks = jnp.asarray(rng.integers(0, TINY.vocab_size, (1, 4)), jnp.int32)
    prefix = jnp.asarray(rng.standard_normal((1, 3, TINY.d_model)), jnp.float32)
    embeds = jnp.concatenate([prefix, embed_tokens(params, toks)], axis=1)
    hidden = forward_with_embeds(params, TINY, embeds)
    assert hidden.shape == (1, 7, TINY.d_model)


def test_resize_embeddings_contract():
    params = init_causal_lm(TINY, jax.random.key(0))
    new_params, new_cfg = resize_embeddings(params, TINY, 150, jax.random.key(1))
    assert new_cfg.vocab_size == 150
    assert new_params["embed"].shape == (150, TINY.d_model)
    np.testing.assert_array_equal(np.asarray(new_params["embed"][:120]),
                                  np.asarray(params["embed"]))
    # forward works with extended ids
    toks = jnp.asarray([[0, 130, 149]], jnp.int32)
    logits = lm_forward(new_params, new_cfg, toks)
    assert logits.shape == (1, 3, 150)
