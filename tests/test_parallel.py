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


def test_tp_decode_matches_replicated(rng):
    """TP=2 KV-cached generation (cache + cross-KV sharded over heads on
    'model') must produce the same tokens and scores as replicated decode —
    the decode path scales with the mesh, not just the teacher-forced one."""
    from audax.infer.decode import generate
    from audax.models.whisper import encode

    mesh = make_mesh(MeshConfig(model=2))
    params = init_whisper_params(CFG, jax.random.key(0))
    mel = jnp.asarray(rng.standard_normal((4, 2 * CFG.n_audio_ctx, CFG.n_mels))
                      .astype(np.float32))
    prompt = jnp.full((4, 1), 3, jnp.int32)

    enc_ref = encode(params, CFG, mel)
    ref = generate(params, CFG, enc_ref, prompt, max_len=12, eos_id=2)

    sharded_params = shard_params(params, mesh)
    mel_s = jax.device_put(mel, NamedSharding(mesh, P("data", None, None)))
    enc_s = encode(sharded_params, CFG, mel_s)
    out = generate(sharded_params, CFG, enc_s, prompt, max_len=12, eos_id=2,
                   mesh=mesh)
    assert (np.asarray(out.tokens) == np.asarray(ref.tokens)).all()
    np.testing.assert_allclose(np.asarray(out.sum_logprob),
                               np.asarray(ref.sum_logprob),
                               atol=1e-3, rtol=1e-4)


def test_tp_beam_matches_replicated(rng):
    from audax.infer.beam import beam_search
    from audax.models.whisper import encode

    mesh = make_mesh(MeshConfig(model=2))
    params = init_whisper_params(CFG, jax.random.key(1))
    mel = jnp.asarray(rng.standard_normal((2, 2 * CFG.n_audio_ctx, CFG.n_mels))
                      .astype(np.float32))
    prompt = jnp.full((2, 1), 3, jnp.int32)
    enc = encode(params, CFG, mel)
    ref = beam_search(params, CFG, enc, prompt, max_len=10, eos_id=2,
                      beam_width=3)
    sharded_params = shard_params(params, mesh)
    out = beam_search(sharded_params, CFG, enc, prompt, max_len=10, eos_id=2,
                      beam_width=3, mesh=mesh)
    assert (np.asarray(out.tokens) == np.asarray(ref.tokens)).all()
    np.testing.assert_allclose(np.asarray(out.scores), np.asarray(ref.scores),
                               atol=1e-3, rtol=1e-4)


def test_causal_lm_tp_matches_single_device(rng):
    """Qwen-family LM under CAUSAL_LM_TP_RULES: TP=2 logits equal the
    unsharded forward (GQA kv_heads shard too when divisible)."""
    from audax.models.causal_lm import CausalLMConfig, init_causal_lm, lm_forward
    from audax.parallel.sharding import CAUSAL_LM_TP_RULES

    cfg = CausalLMConfig(vocab_size=128, d_model=64, layers=2, heads=4,
                         kv_heads=2, ffn_dim=128, tie_embeddings=True)
    params = init_causal_lm(cfg, jax.random.key(0))
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 12)), jnp.int32)
    ref = lm_forward(params, cfg, tokens)

    mesh = make_mesh(MeshConfig(model=2))
    sharded = shard_params(params, mesh, rules=CAUSAL_LM_TP_RULES)
    q = sharded["layers"]["q"]["kernel"]
    assert q.sharding.spec == P(None, None, "model")
    assert sharded["layers"]["k"]["kernel"].sharding.spec \
        == P(None, None, "model")          # kv_heads=2 divides model=2
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("data", None)))
    out = jax.jit(lambda p, t: lm_forward(p, cfg, t))(sharded, tok_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_causal_lm_tp_single_kv_head_still_exact(rng):
    """kv_heads=1 over model=2 splits one KV head's head_dim across devices
    — a worst case for the layout, but GSPMD must still produce logits equal
    to the unsharded forward (it reshards where the einsums demand)."""
    from audax.models.causal_lm import CausalLMConfig, init_causal_lm, lm_forward
    from audax.parallel.sharding import CAUSAL_LM_TP_RULES

    cfg = CausalLMConfig(vocab_size=64, d_model=32, layers=1, heads=2,
                         kv_heads=1, ffn_dim=64)
    params = init_causal_lm(cfg, jax.random.key(0))
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    ref = lm_forward(params, cfg, tokens)
    mesh = make_mesh(MeshConfig(model=2))
    sharded = shard_params(params, mesh, rules=CAUSAL_LM_TP_RULES)
    out = jax.jit(lambda p, t: lm_forward(p, cfg, t))(sharded, tokens)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


class TestMultihostMesh:
    """DCN-aware mesh construction (pure layout logic, faked device lists —
    no real multi-host needed, per SURVEY.md §2.3 'ICI within slice, DCN
    across slices')."""

    def test_grid_layout_host_major(self):
        from audax.parallel.mesh import multihost_device_grid
        fake = [f"h{h}d{d}" for h in range(4) for d in range(8)]  # host-major
        grid = multihost_device_grid(fake, num_hosts=4, model=2)
        assert grid.shape == (4, 4, 2)
        # every device in grid[h] belongs to host h: TP/DP inner axes never
        # cross DCN
        for h in range(4):
            assert all(str(x).startswith(f"h{h}") for x in grid[h].ravel())

    def test_grid_rejects_cross_host_tp(self):
        from audax.parallel.mesh import multihost_device_grid
        fake = list(range(8))
        with pytest.raises(ValueError):
            multihost_device_grid(fake, num_hosts=4, model=4)  # 2/host < 4
        with pytest.raises(ValueError):
            multihost_device_grid(fake, num_hosts=3, model=1)  # 8 % 3

    def test_functional_on_cpu_mesh(self, rng):
        """(2 fake hosts, 2 data, 2 model) over the 8 virtual CPU devices:
        a batch sharded over both data axes trains one step fine."""
        from audax.parallel.mesh import make_multihost_mesh

        mesh = make_multihost_mesh(MeshConfig(model=2), num_hosts=2)
        assert dict(mesh.shape) == {"dcn_data": 2, "data": 2, "model": 2}
        x = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
        xs = jax.device_put(x, NamedSharding(mesh, P(("dcn_data", "data"), None)))
        ws = jax.device_put(w, NamedSharding(mesh, P(None, "model")))
        out = jax.jit(lambda a, b: jnp.mean(a @ b))(xs, ws)   # DCN+ICI psum
        np.testing.assert_allclose(float(out), float(jnp.mean(x @ w)),
                                   rtol=1e-5)

    def test_init_distributed_noop_single_process(self, monkeypatch):
        from audax.parallel.mesh import init_distributed
        monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
        assert init_distributed() == 1    # no coordinator -> single-process


def test_indivisible_dims_fall_back_to_replication():
    cfg = WhisperConfig(n_mels=16, n_audio_ctx=8, d_model=24, encoder_layers=1,
                        decoder_layers=1, heads=3, vocab_size=101, n_text_ctx=8)
    mesh = make_mesh(MeshConfig(model=2))
    params = init_whisper_params(cfg, jax.random.key(0))
    sharded = shard_params(params, mesh)   # 101 % 2 != 0 -> embed replicated
    emb = sharded["decoder"]["embed"]
    assert emb.sharding.spec in (P(), P(None), P(None, None))


def test_tp_decode_kv_quant_matches_replicated(rng):
    """TP=2 decode with int8 KV caches (QuantKV: scale leaves are 4D, so
    the sharding constraint must be rank-aware) equals replicated int8-KV
    decode token for token."""
    from audax.infer.decode import generate
    from audax.models.whisper import encode

    mesh = make_mesh(MeshConfig(model=2))
    params = init_whisper_params(CFG, jax.random.key(2))
    mel = jnp.asarray(rng.standard_normal((2, 2 * CFG.n_audio_ctx, CFG.n_mels))
                      .astype(np.float32))
    prompt = jnp.full((2, 1), 3, jnp.int32)
    enc = encode(params, CFG, mel)
    ref = generate(params, CFG, enc, prompt, max_len=10, eos_id=2,
                   kv_quant=True)
    sharded_params = shard_params(params, mesh)
    out = generate(sharded_params, CFG, enc, prompt, max_len=10, eos_id=2,
                   mesh=mesh, kv_quant=True)
    assert (np.asarray(out.tokens) == np.asarray(ref.tokens)).all()
    np.testing.assert_allclose(np.asarray(out.sum_logprob),
                               np.asarray(ref.sum_logprob),
                               atol=1e-3, rtol=1e-4)
