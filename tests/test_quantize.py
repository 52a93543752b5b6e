"""Int8 weight-only quantization: logit closeness, decode agreement,
memory shrink, and drop-in compatibility across model families.

No reference equivalent (the reference serves f32 torch checkpoints,
.charles/music2midi/inference.py:300-369); this is a TPU-serving
capability of the rebuild. Oracle: the float model itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.models.causal_lm import (CausalLMConfig, init_causal_lm,
                                    lm_forward)
from audax.models.quantize import (dequant_dense, embed_logits, embed_lookup,
                                   quantize_matrix, quantize_tree,
                                   tree_bytes)
from audax.models.whisper import init_whisper_params, whisper_forward

CFG = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=64, encoder_layers=2,
                    decoder_layers=2, heads=4, vocab_size=128, n_text_ctx=16)


@pytest.fixture(scope="module")
def wparams():
    return init_whisper_params(CFG, jax.random.key(0))


def test_quantize_matrix_roundtrip(rng):
    k = jnp.asarray(rng.standard_normal((48, 96)), jnp.float32)
    q, s = quantize_matrix(k, axis=-2)
    assert q.dtype == jnp.int8 and s.shape == (96,)
    deq = q.astype(jnp.float32) * s[None, :]
    # max error per channel is scale/2 = max|col|/254
    err = np.abs(np.asarray(deq - k))
    bound = np.abs(np.asarray(k)).max(axis=0) / 254.0 + 1e-7
    assert (err <= bound[None, :] + 1e-6).all()


def test_dequant_dense_matches_float(rng):
    k = jnp.asarray(rng.standard_normal((32, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    q, s = quantize_matrix(k)
    y_q = dequant_dense({"kernel_q": q, "kernel_scale": s, "bias": b}, x)
    y_f = x @ k + b
    assert np.abs(np.asarray(y_q - y_f)).max() < 0.05 * float(
        jnp.abs(y_f).max())


def test_quantize_tree_structure_and_bytes(wparams):
    qp = quantize_tree(wparams)
    # stacked dense kernels become int8 with per-(layer, channel) scales
    enc = qp["encoder"]["layers"]["attn"]["q"]
    assert enc["kernel_q"].dtype == jnp.int8
    assert enc["kernel_scale"].shape == (CFG.encoder_layers, CFG.d_model)
    assert "bias" in enc and "kernel" not in enc
    # convs stay float
    assert "kernel" in qp["encoder"]["conv1"]
    # embed quantized per vocab row
    dec = qp["decoder"]
    assert dec["embed_q"].shape == (CFG.vocab_size, CFG.d_model)
    assert dec["embed_scale"].shape == (CFG.vocab_size,)
    # >=3x smaller (int8 + f32 scales vs f32 weights; LN/pos stay f32)
    assert tree_bytes(qp) < 0.35 * tree_bytes(wparams)


def test_embed_helpers_match_float(wparams, rng):
    dec = wparams["decoder"]
    qdec = quantize_tree(wparams)["decoder"]
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, (3, 5)), jnp.int32)
    lf = embed_lookup(dec, idx, jnp.float32)
    lq = embed_lookup(qdec, idx, jnp.float32)
    assert np.abs(np.asarray(lf - lq)).max() < 0.01
    x = jnp.asarray(rng.standard_normal((2, 4, CFG.d_model)), jnp.float32)
    gf = embed_logits(dec, x)
    gq = embed_logits(qdec, x)
    assert np.abs(np.asarray(gf - gq)).max() < 0.05 * float(
        jnp.abs(gf).max())


def test_whisper_quantized_forward_close(wparams, rng):
    mel = jnp.asarray(rng.standard_normal((2, 2 * CFG.n_audio_ctx,
                                           CFG.n_mels)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)), jnp.int32)
    lf = whisper_forward(wparams, CFG, mel, toks)
    lq = whisper_forward(quantize_tree(wparams), CFG, mel, toks)
    # distribution-level agreement (weight-only int8, per-channel scales)
    pf = jax.nn.softmax(lf, -1)
    pq = jax.nn.softmax(lq, -1)
    kl = (pf * (jnp.log(pf + 1e-9) - jnp.log(pq + 1e-9))).sum(-1)
    assert float(kl.max()) < 0.05
    # top-1 tokens almost always agree
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert float(agree) >= 0.9


def test_whisper_quantized_greedy_decode_agrees(wparams, rng):
    from audax.infer.decode import generate
    from audax.models.whisper import encode

    mel = jnp.asarray(rng.standard_normal((1, 2 * CFG.n_audio_ctx,
                                           CFG.n_mels)), jnp.float32)
    qp = quantize_tree(wparams)
    out_f = generate(wparams, CFG, encode(wparams, CFG, mel),
                     jnp.asarray([[1, 2]], jnp.int32), max_len=12, eos_id=0)
    out_q = generate(qp, CFG, encode(qp, CFG, mel),
                     jnp.asarray([[1, 2]], jnp.int32), max_len=12, eos_id=0)
    # same shapes and dtype; token-level agreement is chaotic for random
    # weights, so assert the decode path runs identically shaped
    assert out_q.tokens.shape == out_f.tokens.shape
    assert out_q.tokens.dtype == jnp.int32


def test_causal_lm_quantized_close(rng):
    cfg = CausalLMConfig(vocab_size=96, d_model=48, layers=2, heads=4,
                         kv_heads=2, ffn_dim=96, tie_embeddings=True,
                         rope_theta=1e4)
    params = init_causal_lm(cfg, jax.random.key(1))
    toks = jnp.asarray(rng.integers(0, 96, (2, 10)), jnp.int32)
    lf = lm_forward(params, cfg, toks)
    lq = lm_forward(quantize_tree(params), cfg, toks)
    pf = jax.nn.softmax(lf, -1)
    pq = jax.nn.softmax(lq, -1)
    kl = (pf * (jnp.log(pf + 1e-9) - jnp.log(pq + 1e-9))).sum(-1)
    assert float(kl.max()) < 0.05


def test_transcriber_quantize_flag(wparams):
    """Transcriber(quantize=True) is a drop-in: transcribes a short clip
    through the full pipeline with int8 weights."""
    from audax.infer.transcribe import Transcriber
    from audax.symbolic.tokenizer import WhisperTokenizer
    from audax.symbolic.bpe import train_bpe

    tok = WhisperTokenizer(train_bpe(["a b c"], vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=100, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(2))
    tr = Transcriber(params, cfg, tok, max_new_tokens=6,
                     temperature_fallback=False, chunk_seconds=2.0,
                     quantize=True, dtype=jnp.bfloat16)
    res = tr.transcribe(np.zeros(16000, np.float32))
    assert isinstance(res.text, str)


# ------------------------------------------------------ int8 KV cache ----
def test_quantize_kv_roundtrip(rng):
    from audax.models.whisper import quantize_kv

    k = jnp.asarray(rng.standard_normal((2, 4, 7, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 4, 7, 16)), jnp.float32)
    q = quantize_kv(k, v)
    assert q.k_q.dtype == jnp.int8 and q.k_scale.shape == (2, 4, 7)
    deq = q.k_q.astype(jnp.float32) * q.k_scale[..., None]
    err = np.abs(np.asarray(deq - k))
    bound = np.abs(np.asarray(k)).max(-1) / 254.0 + 1e-6
    assert (err <= bound[..., None] + 1e-6).all()


def test_cross_attention_quant_kv_close(wparams, rng):
    """attention() with QuantKV cross-KV matches the float path closely."""
    from audax.models.whisper import (attention, precompute_cross_kv,
                                      _split_heads, dense)

    enc = jnp.asarray(rng.standard_normal((2, 10, CFG.d_model)) * 0.3,
                      jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 3, CFG.d_model)) * 0.3,
                    jnp.float32)
    layer0 = jax.tree.map(lambda a: a[0],
                          wparams["decoder"]["layers"])["cross_attn"]
    kf, vf = (_split_heads(dense(layer0["k"], enc), CFG.heads),
              _split_heads(dense(layer0["v"], enc), CFG.heads))
    out_f = attention(layer0, x, CFG.heads, kv_cached=(kf, vf))
    from audax.models.whisper import quantize_kv
    out_q = attention(layer0, x, CFG.heads, kv_cached=quantize_kv(kf, vf))
    scale = float(jnp.abs(out_f).max())
    assert np.abs(np.asarray(out_f - out_q)).max() < 0.03 * scale + 1e-4


def test_generate_kv_quant_close(wparams, rng):
    """Greedy decode with int8 KV: logprob trajectory stays close to float
    decode (token-exact on most steps for a random model; we assert the
    structural outputs + score proximity rather than chaotic token ids)."""
    from audax.infer.decode import generate
    from audax.models.whisper import encode

    mel = jnp.asarray(rng.standard_normal((2, 2 * CFG.n_audio_ctx,
                                           CFG.n_mels)), jnp.float32)
    enc = encode(wparams, CFG, mel)
    prompt = jnp.asarray([[1, 2], [1, 2]], jnp.int32)
    out_f = generate(wparams, CFG, enc, prompt, max_len=10, eos_id=0)
    out_q = generate(wparams, CFG, enc, prompt, max_len=10, eos_id=0,
                     kv_quant=True)
    assert out_q.tokens.shape == out_f.tokens.shape
    assert np.allclose(np.asarray(out_q.avg_logprob),
                       np.asarray(out_f.avg_logprob), atol=0.25)


def test_decode_step_kv_quant_first_logits_close(wparams, rng):
    """First decode step (empty cache) with int8 self+cross KV produces
    near-identical logits to the float step — the per-step quantization
    error bound, before any trajectory divergence."""
    from audax.models.whisper import (decode_step, encode, init_kv_cache,
                                      precompute_cross_kv)

    mel = jnp.asarray(rng.standard_normal((1, 2 * CFG.n_audio_ctx,
                                           CFG.n_mels)), jnp.float32)
    enc = encode(wparams, CFG, mel)
    tok = jnp.asarray([3], jnp.int32)
    pos = jnp.int32(0)
    lf, _ = decode_step(wparams, CFG, tok, pos,
                        init_kv_cache(CFG, 1, 8),
                        precompute_cross_kv(wparams, CFG, enc))
    lq, _ = decode_step(wparams, CFG, tok, pos,
                        init_kv_cache(CFG, 1, 8, quant=True),
                        precompute_cross_kv(wparams, CFG, enc, quant=True))
    pf = jax.nn.softmax(lf, -1)
    pq = jax.nn.softmax(lq, -1)
    kl = (pf * (jnp.log(pf + 1e-9) - jnp.log(pq + 1e-9))).sum(-1)
    assert float(kl.max()) < 0.05


def test_beam_search_kv_quant_runs(wparams, rng):
    from audax.infer.beam import beam_search
    from audax.models.whisper import encode

    mel = jnp.asarray(rng.standard_normal((1, 2 * CFG.n_audio_ctx,
                                           CFG.n_mels)), jnp.float32)
    enc = encode(wparams, CFG, mel)
    prompt = jnp.asarray([[1, 2]], jnp.int32)
    res = beam_search(wparams, CFG, enc, prompt, max_len=8, eos_id=0,
                      beam_width=2, kv_quant=True)
    assert res.tokens.shape[:2] == (1, 2)


def test_transcriber_kv_quant(wparams):
    from audax.infer.transcribe import Transcriber
    from audax.symbolic.bpe import train_bpe
    from audax.symbolic.tokenizer import WhisperTokenizer
    from audax.core.config import WhisperConfig
    from audax.models.whisper import init_whisper_params

    tok = WhisperTokenizer(train_bpe(["x y z"], vocab_size=280))
    cfg = WhisperConfig(n_mels=80, n_audio_ctx=100, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=2,
                        vocab_size=tok.vocab_size, n_text_ctx=32)
    params = init_whisper_params(cfg, jax.random.key(3))
    tr = Transcriber(params, cfg, tok, max_new_tokens=6,
                     temperature_fallback=False, chunk_seconds=2.0,
                     quantize=True, kv_quant=True, dtype=jnp.bfloat16)
    res = tr.transcribe(np.zeros(16000, np.float32))
    assert isinstance(res.text, str)
