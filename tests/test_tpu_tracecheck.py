"""Abstract traces (jax.eval_shape) of the TPU-only kernel paths, on CPU.

The pallas kernels only LOWER on TPU, but all their trace-time Python —
jit staticness, shape math, grid/block construction, backend dispatch —
runs on any host under ``jax.eval_shape`` (no kernel execution). A whole
class of serving-breaking bugs lives exactly there: the ``whisper_post``
staticness regression broke every whisper-mode serving path on the real
chip while the CPU suite (XLA backends) stayed green. These tests force
the pallas backends and trace the serving/training entry points
abstractly, so trace-time breakage fails in CI without a chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.models.causal_lm import (CausalLMConfig, init_causal_lm,
                                    init_lm_cache, lm_decode_step,
                                    lm_forward)
from audax.models.whisper import encode, init_whisper_params
from audax.infer.decode import generate

pytestmark = pytest.mark.fast


@pytest.fixture
def pallas(monkeypatch):
    """Force the pallas backends the way a real TPU process would pick
    them (the env override is read into module globals at import)."""
    import audax.ops.attention as attn
    import audax.ops.int4_matmul as i4
    monkeypatch.setattr(attn, "_ENV_BACKEND", "pallas")
    monkeypatch.setattr(i4, "_ENV_BACKEND", "pallas")


WCFG = WhisperConfig(n_mels=80, n_audio_ctx=64, d_model=64,
                     encoder_layers=2, decoder_layers=2, heads=4,
                     vocab_size=600, n_text_ctx=48)


def test_whisper_serving_paths_trace(pallas):
    params = init_whisper_params(WCFG, jax.random.key(0))
    mel = jax.ShapeDtypeStruct((2, 2 * WCFG.n_audio_ctx, WCFG.n_mels),
                               jnp.float32)
    enc_s = jax.eval_shape(lambda p, m: encode(p, WCFG, m), params, mel)
    assert enc_s.shape == (2, WCFG.n_audio_ctx, WCFG.d_model)
    # grad traces the flash custom-VJP backward kernel
    grads = jax.eval_shape(
        jax.grad(lambda p, m: encode(p, WCFG, m).sum()), params, mel)
    assert jax.tree.structure(grads) == jax.tree.structure(params)
    # KV-cached generate: float and int8-quantized cache decode kernels
    prompt = jax.ShapeDtypeStruct((2, 3), jnp.int32)
    for kvq in (False, True):
        out = jax.eval_shape(
            lambda p, e, pr, kvq=kvq: generate(p, WCFG, e, pr, max_len=10,
                                               eos_id=2, kv_quant=kvq),
            params, enc_s, prompt)
        assert out.tokens.shape == (2, 10)


LCFG = CausalLMConfig(vocab_size=300, d_model=64, layers=2, heads=4,
                      kv_heads=2, ffn_dim=96, tie_embeddings=True)


def test_causal_lm_paths_trace(pallas):
    from audax.models.quantize import quantize_tree
    params = init_causal_lm(LCFG, jax.random.key(0))
    toks = jax.ShapeDtypeStruct((2, 16), jnp.int32)
    out = jax.eval_shape(lambda p, t: lm_forward(p, LCFG, t), params, toks)
    assert out.shape == (2, 16, LCFG.vocab_size)
    # int4 decode rides the pallas nibble kernel (scalar-prefetch stacked
    # weights); the whole-stack view goes through lm_decode_step
    q4 = quantize_tree(params, bits=4)
    cache = init_lm_cache(LCFG, batch=2, max_len=8)
    emb = jax.ShapeDtypeStruct((2, LCFG.d_model), jnp.float32)
    lg, _ = jax.eval_shape(
        lambda p, e, c: lm_decode_step(p, LCFG, e, jnp.int32(0), c),
        q4, emb, cache)
    assert lg.shape == (2, LCFG.vocab_size)


MCFG = CausalLMConfig(vocab_size=200, d_model=64, layers=2, heads=4,
                      kv_heads=2, ffn_dim=96, num_experts=4,
                      experts_per_tok=2, moe_ffn_dim=64, qk_norm=True)


@pytest.mark.parametrize("bits", [8, 4])
def test_moe_quantized_decode_trace(pallas, bits):
    """Quantized-expert decode (selected-scan; int4 goes through the flat
    [L*E, K/2, N] pallas view) traces at B=1 where n*k <= E."""
    from audax.models.quantize import quantize_tree
    params = quantize_tree(init_causal_lm(MCFG, jax.random.key(0)),
                           bits=bits)
    cache = init_lm_cache(MCFG, batch=1, max_len=4)
    emb = jax.ShapeDtypeStruct((1, MCFG.d_model), jnp.float32)
    lg, _ = jax.eval_shape(
        lambda p, e, c: lm_decode_step(p, MCFG, e, jnp.int32(0), c),
        params, emb, cache)
    assert lg.shape == (1, MCFG.vocab_size)


def test_continuous_and_speculative_kernels_trace(pallas):
    """The continuous-batching ragged decode (per-slot [B] pos vector into
    the stacked decode kernel) and the speculative verifier's K-row span
    decode trace with the pallas backends forced."""
    from audax.models.whisper import (decode_span, decode_step_ragged,
                                      init_kv_cache, precompute_cross_kv)
    params = init_whisper_params(WCFG, jax.random.key(0))
    enc = jax.ShapeDtypeStruct((3, WCFG.n_audio_ctx, WCFG.d_model),
                               jnp.float32)
    cache = init_kv_cache(WCFG, batch=3, max_len=16)
    cross = jax.eval_shape(
        lambda p, e: precompute_cross_kv(p, WCFG, e), params, enc)
    tok = jax.ShapeDtypeStruct((3,), jnp.int32)
    pos = jax.ShapeDtypeStruct((3,), jnp.int32)
    lg, _ = jax.eval_shape(
        lambda p, t, po, c, x: decode_step_ragged(p, WCFG, t, po, c, x),
        params, tok, pos, cache, cross)
    assert lg.shape == (3, WCFG.vocab_size)
    span = jax.ShapeDtypeStruct((3, 8), jnp.int32)
    lg2, _ = jax.eval_shape(
        lambda p, t, c, x: decode_span(p, WCFG, t, jnp.int32(1), c, x),
        params, span, cache, cross)
    assert lg2.shape == (3, 8, WCFG.vocab_size)
