"""Sequence-parallel encoder: exactness vs the plain encoder on a
(data, model, seq) mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from audax.core.config import WhisperConfig
from audax.models.whisper import encode, init_whisper_params
from audax.parallel.sp import encode_sequence_parallel

CFG = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32, encoder_layers=2,
                    decoder_layers=1, heads=4, vocab_size=64, n_text_ctx=8)


def _mesh3():
    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    return Mesh(devs, ("data", "model", "seq"))


@pytest.mark.parametrize("ring", [True, False])
def test_sp_encoder_matches_plain(rng, ring):
    mesh = _mesh3()
    params = init_whisper_params(CFG, jax.random.key(0))
    mel = jnp.asarray(rng.standard_normal((2, 2 * CFG.n_audio_ctx, CFG.n_mels))
                      .astype(np.float32))
    ref = encode(params, CFG, mel)
    out = encode_sequence_parallel(params, CFG, mel, mesh, ring=ring)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_ring_attention_long_sequence_small_blocks(rng):
    """Ring attention with seq=4: per-device KV is a quarter of the full KV
    (the case the all-gather variant cannot scale to), and the result still
    matches the plain encoder exactly."""
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "seq"))
    cfg = WhisperConfig(n_mels=16, n_audio_ctx=64, d_model=32,
                        encoder_layers=2, decoder_layers=1, heads=4,
                        vocab_size=64, n_text_ctx=8)
    params = init_whisper_params(cfg, jax.random.key(1))
    mel = jnp.asarray(rng.standard_normal((2, 2 * cfg.n_audio_ctx, cfg.n_mels))
                      .astype(np.float32))
    ref = encode(params, cfg, mel)
    out = encode_sequence_parallel(params, cfg, mel, mesh, ring=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_sp_rejects_indivisible_sequence(rng):
    mesh = _mesh3()
    cfg = WhisperConfig(n_mels=16, n_audio_ctx=17, d_model=32,
                        encoder_layers=1, decoder_layers=1, heads=4,
                        vocab_size=64, n_text_ctx=8)
    params = init_whisper_params(cfg, jax.random.key(0))
    mel = jnp.zeros((2, 34, 16))
    with pytest.raises(ValueError, match="not divisible"):
        encode_sequence_parallel(params, cfg, mel, mesh)
