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


# ------------------------------------------------- int4 (nibble-packed) ----
def _dequant_int4_twin(node):
    """Float twin of an int4-quantized tree: every packed leaf explicitly
    dequantized back, so decode-path tests isolate kernel math from
    quantization error."""
    from audax.ops.int4_matmul import dequantize_int4

    if isinstance(node, dict):
        out = {}
        for k in list(node):
            if k.endswith("_q4"):
                base = k[:-3]
                w_kn = dequantize_int4(node[k], node[base + "_scale4"])
                out[base] = (w_kn if base == "kernel"
                             else jnp.swapaxes(w_kn, -1, -2))
            elif k.endswith("_scale4"):
                pass
            else:
                out[k] = _dequant_int4_twin(node[k])
        return out
    return node


def test_int4_quantize_roundtrip(rng):
    from audax.ops.int4_matmul import (dequantize_int4, fit_group,
                                       quantize_int4)

    for (k_dim, n, g) in [(64, 96, 128), (256, 130, 64)]:
        w = jnp.asarray(rng.standard_normal((k_dim, n)), jnp.float32)
        packed, scales = quantize_int4(w, group=g)
        gf = fit_group(k_dim, g)
        assert packed.dtype == jnp.uint8
        assert packed.shape == (k_dim // 2, n)
        assert scales.shape == (k_dim // gf, n)
        deq = np.asarray(dequantize_int4(packed, scales))    # [K, N]
        err = np.abs(deq - np.asarray(w))
        wg = np.asarray(w).reshape(k_dim // gf, gf, n)
        bound = np.repeat(np.abs(wg).max(1) / 7.0, gf, axis=0) / 2
        assert (err <= bound + 1e-6).all()


def test_int4_matmul_xla_oracle(rng):
    from audax.ops.int4_matmul import (dequantize_int4, int4_matmul,
                                       quantize_int4)

    x = jnp.asarray(rng.standard_normal((5, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 96)), jnp.float32)
    packed, scales = quantize_int4(w, group=32)
    ref = np.asarray(x) @ np.asarray(dequantize_int4(packed, scales))
    out = np.asarray(int4_matmul(x, packed, scales, backend="xla"))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("m,k_dim,n,blk", [(3, 256, 384, 256),
                                           (1, 256, 130, 128),
                                           (9, 128, 300, 256)])
def test_int4_matmul_pallas_matches_xla(rng, m, k_dim, n, blk):
    from audax.ops.int4_matmul import int4_matmul, quantize_int4

    x = jnp.asarray(rng.standard_normal((m, k_dim)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k_dim, n)), jnp.float32)
    packed, scales = quantize_int4(w, group=64)
    ref = np.asarray(int4_matmul(x, packed, scales, backend="xla"))
    out = np.asarray(int4_matmul(x, packed, scales, backend="pallas",
                                 block_n=blk, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_int4_matmul_stacked_layer_select(rng):
    from audax.ops.int4_matmul import int4_matmul, quantize_int4

    ws = jnp.asarray(rng.standard_normal((3, 128, 200)), jnp.float32)
    packed, scales = quantize_int4(ws, group=32)
    x = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
    for li in range(3):
        ref = np.asarray(int4_matmul(x, packed, scales, layer=li,
                                     backend="xla"))
        out = np.asarray(int4_matmul(x, packed, scales, layer=li,
                                     backend="pallas", block_n=128,
                                     interpret=True))
        np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_int4_tree_structure_and_bytes(wparams):
    qp8 = quantize_tree(wparams)
    qp4 = quantize_tree(wparams, bits=4)
    enc = qp4["encoder"]["layers"]["attn"]["q"]
    assert enc["kernel_q4"].dtype == jnp.uint8
    assert enc["kernel_q4"].shape == (CFG.encoder_layers,
                                      CFG.d_model // 2, CFG.d_model)
    assert "bias" in enc and "kernel" not in enc
    assert "kernel" in qp4["encoder"]["conv1"]     # convs stay float
    dec = qp4["decoder"]
    assert dec["embed_q4"].shape == (CFG.d_model // 2, CFG.vocab_size)
    # packed weight leaves are exactly half their int8 twins; whole-tree
    # ratio is looser at these toy dims (f32 LN/pos/conv + group scales
    # are a fixed overhead that vanishes at real d_model)
    assert enc["kernel_q4"].nbytes == qp8["encoder"]["layers"]["attn"][
        "q"]["kernel_q"].nbytes // 2
    assert dec["embed_q4"].nbytes == dec_q8_bytes(qp8) // 2
    assert tree_bytes(qp4) < 0.75 * tree_bytes(qp8)


def dec_q8_bytes(qp8):
    return qp8["decoder"]["embed_q"].nbytes


def test_int4_embed_helpers_match_dequant(wparams, rng):
    from audax.ops.int4_matmul import dequantize_int4

    dec = wparams["decoder"]
    qdec = quantize_tree(wparams, bits=4)["decoder"]
    emb_deq = np.asarray(dequantize_int4(qdec["embed_q4"],
                                         qdec["embed_scale4"])).T  # [V, d]
    idx = jnp.asarray(rng.integers(0, CFG.vocab_size, (3, 5)), jnp.int32)
    lq = np.asarray(embed_lookup(qdec, idx, jnp.float32))
    np.testing.assert_allclose(lq, emb_deq[np.asarray(idx)], atol=1e-5)
    x = jnp.asarray(rng.standard_normal((2, 4, CFG.d_model)), jnp.float32)
    gq = np.asarray(embed_logits(qdec, x))
    np.testing.assert_allclose(gq, np.asarray(x) @ emb_deq.T,
                               atol=1e-4, rtol=1e-4)


def test_whisper_int4_forward_close(wparams, rng):
    mel = jnp.asarray(rng.standard_normal((2, 2 * CFG.n_audio_ctx,
                                           CFG.n_mels)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 8)), jnp.int32)
    lf = whisper_forward(wparams, CFG, mel, toks)
    lq = whisper_forward(quantize_tree(wparams, bits=4), CFG, mel, toks)
    pf = jax.nn.softmax(lf, -1)
    pq = jax.nn.softmax(lq, -1)
    kl = (pf * (jnp.log(pf + 1e-9) - jnp.log(pq + 1e-9))).sum(-1)
    assert float(kl.max()) < 0.12        # group-wise int4: looser than int8


def test_whisper_int4_decode_matches_dequantized_twin(wparams, rng):
    """decode_span through the stacked-int4 scan body vs the SAME weights
    explicitly dequantized to float: the only difference allowed is dot
    ordering (group partials), so logits must agree tightly."""
    from audax.models.whisper import (decode_span, encode, init_kv_cache,
                                      precompute_cross_kv)
    from audax.ops.int4_matmul import dequantize_int4

    p4 = quantize_tree(wparams, bits=4)

    pf = _dequant_int4_twin(p4)
    mel = jnp.asarray(rng.standard_normal((1, 2 * CFG.n_audio_ctx,
                                           CFG.n_mels)), jnp.float32)
    enc = encode(p4, CFG, mel)
    toks = jnp.asarray([[3, 5, 7]], jnp.int32)
    l4, _ = decode_span(p4, CFG, toks, 0, init_kv_cache(CFG, 1, 8),
                        precompute_cross_kv(p4, CFG, enc))
    lf, _ = decode_span(pf, CFG, toks, 0, init_kv_cache(CFG, 1, 8),
                        precompute_cross_kv(pf, CFG, enc))
    np.testing.assert_allclose(np.asarray(l4), np.asarray(lf),
                               atol=5e-5, rtol=1e-4)


def test_whisper_int4_generate_runs(wparams, rng):
    from audax.infer.decode import generate
    from audax.models.whisper import encode

    qp = quantize_tree(wparams, bits=4)
    mel = jnp.asarray(rng.standard_normal((1, 2 * CFG.n_audio_ctx,
                                           CFG.n_mels)), jnp.float32)
    out = generate(qp, CFG, encode(qp, CFG, mel),
                   jnp.asarray([[1, 2]], jnp.int32), max_len=10, eos_id=0,
                   kv_quant=True)
    assert out.tokens.shape == (1, 10)
    assert bool(jnp.isfinite(out.sum_logprob).all())


def test_causal_lm_int4_close(rng):
    cfg = CausalLMConfig(vocab_size=96, d_model=64, layers=2, heads=4,
                         kv_heads=2, ffn_dim=128, tie_embeddings=True,
                         rope_theta=1e4)
    params = init_causal_lm(cfg, jax.random.key(1))
    toks = jnp.asarray(rng.integers(0, 96, (2, 10)), jnp.int32)
    lf = lm_forward(params, cfg, toks)
    lq = lm_forward(quantize_tree(params, bits=4), cfg, toks)
    pf = jax.nn.softmax(lf, -1)
    pq = jax.nn.softmax(lq, -1)
    kl = (pf * (jnp.log(pf + 1e-9) - jnp.log(pq + 1e-9))).sum(-1)
    assert float(kl.max()) < 0.12


def test_causal_lm_int4_decode_matches_dequantized_twin(rng):
    """lm_decode_step through the stacked-int4 scan body vs the same
    weights explicitly dequantized: only dot ordering may differ."""
    from audax.models.causal_lm import (embed_tokens, init_lm_cache,
                                        lm_decode_step)
    from audax.ops.int4_matmul import dequantize_int4

    cfg = CausalLMConfig(vocab_size=96, d_model=64, layers=2, heads=4,
                         kv_heads=2, ffn_dim=128, tie_embeddings=True,
                         rope_theta=1e4)
    params = init_causal_lm(cfg, jax.random.key(5))
    p4 = quantize_tree(params, bits=4)

    pf = _dequant_int4_twin(p4)
    tok = jnp.asarray([7, 11], jnp.int32)
    pos = jnp.int32(0)
    l4, _ = lm_decode_step(p4, cfg, embed_tokens(p4, tok), pos,
                           init_lm_cache(cfg, 2, 8))
    lf, _ = lm_decode_step(pf, cfg, embed_tokens(pf, tok), pos,
                           init_lm_cache(cfg, 2, 8))
    np.testing.assert_allclose(np.asarray(l4), np.asarray(lf),
                               atol=5e-5, rtol=1e-4)


def test_transcriber_int4(wparams):
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
                     quantize="int4", kv_quant=True, dtype=jnp.bfloat16)
    res = tr.transcribe(np.zeros(16000, np.float32))
    assert isinstance(res.text, str)


def test_int4_tp_rules_replicate_whole_dense(wparams):
    """Every leaf of an int4 dense dict (packed, scales, AND bias) gets an
    empty PartitionSpec — a model-sharded bias next to the replicated
    pallas matmul output would reshard on every decode step."""
    from jax.sharding import PartitionSpec as P
    from audax.parallel.sharding import WHISPER_TP_RULES, param_specs

    qp4 = quantize_tree(wparams, bits=4)
    specs = param_specs(qp4, WHISPER_TP_RULES)
    q = specs["decoder"]["layers"]["attn"]["q"]
    assert q["kernel_q4"] == P() and q["kernel_scale4"] == P()
    assert q["bias"] == P()
    # the float tree still shards the same bias over 'model'
    specs_f = param_specs(wparams, WHISPER_TP_RULES)
    assert specs_f["decoder"]["layers"]["attn"]["q"]["bias"] == P(
        None, "model")
