"""Tensor-parallel sharding: rule resolution, and the load-bearing test —
a TP=2 sharded Whisper forward must produce the same numbers as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from audax.core.config import MeshConfig, WhisperConfig
from audax.models.whisper import init_whisper_params, whisper_forward
from audax.parallel.mesh import make_mesh
from audax.parallel.sharding import (WHISPER_TP_RULES, param_specs,
                                     shard_params, spec_for_path)

CFG = WhisperConfig(n_mels=16, n_audio_ctx=32, d_model=32, encoder_layers=2,
                    decoder_layers=2, heads=4, vocab_size=128, n_text_ctx=16)


def test_spec_resolution():
    assert spec_for_path("decoder/layers/attn/q/kernel", WHISPER_TP_RULES, 3) \
        == P(None, None, "model")
    assert spec_for_path("decoder/layers/attn/out/kernel", WHISPER_TP_RULES, 3) \
        == P(None, "model", None)
    assert spec_for_path("decoder/layers/mlp_in/bias", WHISPER_TP_RULES, 2) \
        == P(None, "model")
    assert spec_for_path("decoder/embed", WHISPER_TP_RULES, 2) == P("model", None)
    assert spec_for_path("encoder/conv1/kernel", WHISPER_TP_RULES, 3) == P()
    assert spec_for_path("encoder/ln/scale", WHISPER_TP_RULES, 1) == P()


def test_param_specs_tree():
    params = init_whisper_params(CFG, jax.random.key(0))
    specs = param_specs(params)
    assert specs["decoder"]["layers"]["attn"]["q"]["kernel"] \
        == P(None, None, "model")
    assert specs["encoder"]["ln"]["scale"] == P()


def test_tp_sharded_forward_matches_single_device(rng):
    """DP=4 x TP=2 mesh: sharded params + sharded batch produce logits equal
    to the unsharded single-device forward (XLA collectives are exact)."""
    mesh = make_mesh(MeshConfig(model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    params = init_whisper_params(CFG, jax.random.key(0))
    mel = jnp.asarray(rng.standard_normal((4, 2 * CFG.n_audio_ctx, CFG.n_mels))
                      .astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 8)), jnp.int32)

    ref = whisper_forward(params, CFG, mel, tokens)

    sharded_params = shard_params(params, mesh)
    q = sharded_params["decoder"]["layers"]["attn"]["q"]["kernel"]
    assert q.sharding.spec == P(None, None, "model")
    mel_s = jax.device_put(mel, NamedSharding(mesh, P("data", None, None)))
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))

    fwd = jax.jit(lambda p, m, t: whisper_forward(p, CFG, m, t))
    out = fwd(sharded_params, mel_s, tok_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_indivisible_dims_fall_back_to_replication():
    cfg = WhisperConfig(n_mels=16, n_audio_ctx=8, d_model=24, encoder_layers=1,
                        decoder_layers=1, heads=3, vocab_size=101, n_text_ctx=8)
    mesh = make_mesh(MeshConfig(model=2))
    params = init_whisper_params(cfg, jax.random.key(0))
    sharded = shard_params(params, mesh)   # 101 % 2 != 0 -> embed replicated
    emb = sharded["decoder"]["embed"]
    assert emb.sharding.spec in (P(), P(None), P(None, None))
