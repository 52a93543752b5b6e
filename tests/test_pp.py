"""Pipeline-parallel encoder: exactness vs plain encode across stage/micro
configurations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from audax.core.config import WhisperConfig
from audax.models.whisper import encode, init_whisper_params
from audax.parallel.pp import encode_pipelined

CFG = WhisperConfig(n_mels=16, n_audio_ctx=16, d_model=32, encoder_layers=4,
                    decoder_layers=1, heads=4, vocab_size=64, n_text_ctx=8)


def _mesh(stages):
    devs = np.array(jax.devices()[:stages]).reshape(stages)
    return Mesh(devs, ("stage",))


@pytest.mark.parametrize("stages,n_micro", [(2, 4), (4, 4), (2, 2), (4, 8)])
def test_pipeline_matches_plain(rng, stages, n_micro):
    mesh = _mesh(stages)
    params = init_whisper_params(CFG, jax.random.key(0))
    b = n_micro * 2
    mel = jnp.asarray(rng.standard_normal((b, 2 * CFG.n_audio_ctx, CFG.n_mels))
                      .astype(np.float32))
    ref = encode(params, CFG, mel)
    out = encode_pipelined(params, CFG, mel, mesh, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_pipeline_rejects_bad_divisibility(rng):
    mesh = _mesh(3)
    params = init_whisper_params(CFG, jax.random.key(0))
    mel = jnp.zeros((4, 32, 16))
    with pytest.raises(ValueError, match="not divisible"):
        encode_pipelined(params, CFG, mel, mesh, n_micro=2)
    with pytest.raises(ValueError, match="not divisible"):
        encode_pipelined(params, CFG, mel, _mesh(2), n_micro=3)
