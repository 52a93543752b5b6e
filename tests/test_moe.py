"""Mixture-of-experts causal LM: HF Qwen3-MoE parity (random tiny config,
no network), ragged==dense impl equivalence, KV-cache decode consistency,
gradient flow, and expert-parallel sharding on the 8-CPU mesh.

The reference's decoder family is Qwen3 (.charles/music2midi/model.py:209);
Qwen3-MoE is the sparse member of that family — a new model capability
with an expert-parallel axis (SURVEY.md §2.3 parallelism inventory).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import MeshConfig
from audax.models.causal_lm import (CausalLMConfig, embed_tokens,
                                    init_causal_lm, init_lm_cache,
                                    lm_decode_step, lm_forward,
                                    port_causal_lm_from_hf)

MOE_TINY = CausalLMConfig(vocab_size=96, d_model=32, layers=2, heads=4,
                          kv_heads=2, ffn_dim=64, qk_norm=True,
                          tie_embeddings=True, rope_theta=1e6,
                          num_experts=4, experts_per_tok=2, moe_ffn_dim=48)


def _hf_qwen3_moe(norm_topk_prob=True, num_experts=4, top_k=2):
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Qwen3Moe")
    hc = Qwen3MoeConfig(
        vocab_size=MOE_TINY.vocab_size, hidden_size=MOE_TINY.d_model,
        num_hidden_layers=MOE_TINY.layers,
        num_attention_heads=MOE_TINY.heads,
        num_key_value_heads=MOE_TINY.kv_heads,
        intermediate_size=MOE_TINY.ffn_dim,
        moe_intermediate_size=MOE_TINY.moe_ffn_dim,
        num_experts=num_experts, num_experts_per_tok=top_k,
        norm_topk_prob=norm_topk_prob, decoder_sparse_step=1,
        mlp_only_layers=[], head_dim=8, rope_theta=1e6,
        tie_word_embeddings=True, max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return Qwen3MoeForCausalLM(hc).eval()


@pytest.mark.parametrize("impl", ["ragged", "dense"])
@pytest.mark.parametrize("norm_topk", [True, False])
def test_qwen3_moe_logit_parity(impl, norm_topk, rng):
    torch = pytest.importorskip("torch")
    hf = _hf_qwen3_moe(norm_topk_prob=norm_topk)
    params, cfg = port_causal_lm_from_hf(hf)
    assert cfg.num_experts == 4 and cfg.experts_per_tok == 2
    assert cfg.norm_topk_prob == norm_topk
    cfg = dataclasses.replace(cfg, moe_impl=impl)
    tokens = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int32)
    ours = np.asarray(lm_forward(params, cfg, jnp.asarray(tokens)))
    with torch.no_grad():
        theirs = hf(torch.tensor(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_moe_impls_agree(rng):
    params = init_causal_lm(MOE_TINY, jax.random.key(0))
    toks = jnp.asarray(rng.integers(0, MOE_TINY.vocab_size, (2, 7)),
                       jnp.int32)
    ragged = lm_forward(params, MOE_TINY, toks)
    dense = lm_forward(params,
                       dataclasses.replace(MOE_TINY, moe_impl="dense"), toks)
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(dense),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["ragged", "dense"])
def test_moe_decode_matches_full(impl, rng):
    cfg = dataclasses.replace(MOE_TINY, moe_impl=impl)
    params = init_causal_lm(cfg, jax.random.key(0))
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 5)), jnp.int32)
    full = lm_forward(params, cfg, toks)
    cache = init_lm_cache(cfg, batch=2, max_len=8)
    outs = []
    for t in range(5):
        emb = embed_tokens(params, toks[:, t])
        logits, cache = lm_decode_step(params, cfg, emb, jnp.int32(t), cache)
        outs.append(logits)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               atol=2e-5, rtol=1e-4)


def test_moe_grads_flow_and_agree(rng):
    """CE-loss grads reach router AND expert weights, are finite, and the
    ragged impl's grads match the dense impl's (same math, different
    dispatch)."""
    params = init_causal_lm(MOE_TINY, jax.random.key(0))
    toks = jnp.asarray(rng.integers(0, MOE_TINY.vocab_size, (2, 6)),
                       jnp.int32)

    def loss(p, cfg):
        logits = lm_forward(p, cfg, toks[:, :-1])
        lp = jax.nn.log_softmax(logits, -1)
        return -jnp.take_along_axis(lp, toks[:, 1:, None], -1).mean()

    g_r = jax.grad(loss)(params, MOE_TINY)
    g_d = jax.grad(loss)(params,
                         dataclasses.replace(MOE_TINY, moe_impl="dense"))
    for path in (("layers", "router", "kernel"),
                 ("layers", "experts", "gate", "kernel"),
                 ("layers", "experts", "down", "kernel")):
        a, b = g_r, g_d
        for k in path:
            a, b = a[k], b[k]
        assert np.isfinite(np.asarray(a)).all()
        assert float(jnp.abs(a).max()) > 0
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)


def test_moe_expert_parallel_matches_replicated(rng):
    """EP=2 on the CPU mesh: expert axis sharded over 'model'
    (CAUSAL_LM_TP_RULES), attention heads sharded on the same axis —
    forward logits equal the single-device result."""
    from audax.parallel.mesh import make_mesh
    from audax.parallel.sharding import CAUSAL_LM_TP_RULES, shard_params

    params = init_causal_lm(MOE_TINY, jax.random.key(0))
    cfg = dataclasses.replace(MOE_TINY, moe_impl="dense")
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 7)), jnp.int32)
    ref = np.asarray(lm_forward(params, cfg, toks))

    mesh = make_mesh(MeshConfig(model=2))
    sharded = shard_params(params, mesh, rules=CAUSAL_LM_TP_RULES)
    ek = sharded["layers"]["experts"]["gate"]["kernel"]
    assert "model" in ek.sharding.spec  # experts actually sharded
    with mesh:
        got = np.asarray(jax.jit(lm_forward, static_argnums=1)(
            sharded, cfg, toks))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_moe_all_to_all_ep_matches_single_device(rng):
    """GShard-style EP (tokens sharded, all_to_all dispatch, local expert
    FFN, all_to_all return, combine) must equal the single-device MoE
    block exactly at C = Nl, on the 8-CPU mesh with EP=4 over 4 experts."""
    from audax.models.causal_lm import _moe_block
    from audax.parallel.ep import moe_expert_parallel
    from audax.parallel.mesh import make_mesh

    params = init_causal_lm(MOE_TINY, jax.random.key(0))
    layer0 = jax.tree.map(lambda a: a[0], params["layers"])
    x = jnp.asarray(rng.standard_normal((2, 8, MOE_TINY.d_model))
                    .astype(np.float32))
    ref = np.asarray(_moe_block(layer0, MOE_TINY, x))
    mesh = make_mesh(MeshConfig(model=4))
    got = np.asarray(moe_expert_parallel(layer0, MOE_TINY, x, mesh))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)
    # generous capacity factor: still exact (cap >= worst-case load here)
    got_cf = np.asarray(moe_expert_parallel(layer0, MOE_TINY, x, mesh,
                                            capacity_factor=8.0))
    np.testing.assert_allclose(got_cf, ref, atol=1e-5, rtol=1e-4)
    # tight capacity drops overflow tokens (GShard semantics): finite,
    # right shape, and actually different from the exact result
    got_drop = np.asarray(moe_expert_parallel(layer0, MOE_TINY, x, mesh,
                                              capacity_factor=0.25))
    assert got_drop.shape == ref.shape
    assert np.isfinite(got_drop).all()


def test_moe_int8_quantization(rng):
    """int8 serving quantization covers the experts (in MoE models they
    ARE the parameter memory): per-(expert, out-channel) scales, float
    router (its output feeds a DISCRETE top-k — quant error there flips
    expert selection, not a matmul perturbation), small output noise in
    both impls, and KV-cached decode still matches the quantized full
    forward."""
    import dataclasses as dc
    from audax.models.quantize import quantize_tree
    params = init_causal_lm(MOE_TINY, jax.random.key(0))
    q = quantize_tree(params)
    eg = q["layers"]["experts"]["gate"]
    assert eg["kernel_q"].shape == (MOE_TINY.layers, 4, MOE_TINY.d_model,
                                    MOE_TINY.moe_ffn_dim)
    assert eg["kernel_q"].dtype == jnp.int8
    assert eg["kernel_scale"].shape == (MOE_TINY.layers, 4,
                                        MOE_TINY.moe_ffn_dim)
    assert "kernel_q" in q["layers"]["q"]                       # dense quantized
    assert "kernel" in q["layers"]["router"]                    # router FLOAT
    assert "kernel_q" not in q["layers"]["router"]
    toks = jnp.asarray(rng.integers(0, MOE_TINY.vocab_size, (2, 7)),
                       jnp.int32)
    ref = np.asarray(lm_forward(params, MOE_TINY, toks))
    for impl in ("ragged", "dense"):
        cfg = dc.replace(MOE_TINY, moe_impl=impl)
        out = np.asarray(lm_forward(q, cfg, toks))
        nrmse = np.sqrt(((out - ref) ** 2).mean()) / ref.std()
        assert nrmse < 0.05, (impl, nrmse)
    # decode consistency under quantized experts
    full_q = np.asarray(lm_forward(q, MOE_TINY, toks))
    cache = init_lm_cache(MOE_TINY, batch=2, max_len=8)
    outs = []
    for t in range(7):
        emb = embed_tokens(q, toks[:, t])
        lg, cache = lm_decode_step(q, MOE_TINY, emb, jnp.int32(t), cache)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(np.stack(outs, 1), full_q, atol=2e-5,
                               rtol=1e-4)
    # int4 capacity tier: experts nibble-pack too ([L, E, K/2, N])
    q4 = quantize_tree(params, bits=4)
    eg4 = q4["layers"]["experts"]["gate"]
    assert eg4["kernel_q4"].shape == (MOE_TINY.layers, 4,
                                      MOE_TINY.d_model // 2,
                                      MOE_TINY.moe_ffn_dim)
    assert eg4["kernel_q4"].dtype == jnp.uint8
    assert "kernel_q4" in q4["layers"]["q"]


def test_moe_int4_quantization(rng):
    """int4 experts: prefill (whole-set dequant + ragged/dense) and decode
    (selected-expert pallas matmul through the flat [L*E, K/2, N] stacked
    view) all EXACTLY match a float model running on the explicitly
    dequantized weights (the fake-quant twin) — kernel math isolated from
    RTN noise. The noise itself only gets a loose sanity bound: at these
    tiny dims (d_model=32) 4-bit RTN perturbs h enough to flip the
    router's discrete top-k on some tokens (measured NRMSE ~0.35; int8
    stays <0.05), which is selection change, not kernel error."""
    import dataclasses as dc
    from audax.models.quantize import quantize_tree
    from tests.test_quantize import _dequant_int4_twin
    params = init_causal_lm(MOE_TINY, jax.random.key(0))
    q4 = quantize_tree(params, bits=4)
    toks = jnp.asarray(rng.integers(0, MOE_TINY.vocab_size, (2, 7)),
                       jnp.int32)
    ref = np.asarray(lm_forward(params, MOE_TINY, toks))
    twin = _dequant_int4_twin(q4)
    ref_fq = np.asarray(lm_forward(twin, MOE_TINY, toks))
    for impl in ("ragged", "dense"):
        cfg = dc.replace(MOE_TINY, moe_impl=impl)
        out = np.asarray(lm_forward(q4, cfg, toks))
        np.testing.assert_allclose(out, ref_fq, atol=2e-5, rtol=1e-4,
                                   err_msg=impl)
        nrmse = np.sqrt(((out - ref) ** 2).mean()) / ref.std()
        assert nrmse < 0.5, (impl, nrmse)
    # decode (selected-scan int4 path; n*k=4 <= E=4) vs full int4 forward
    full_q = np.asarray(lm_forward(q4, MOE_TINY, toks))
    cache = init_lm_cache(MOE_TINY, batch=2, max_len=8)
    outs = []
    for t in range(7):
        emb = embed_tokens(q4, toks[:, t])
        lg, cache = lm_decode_step(q4, MOE_TINY, emb, jnp.int32(t), cache)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(np.stack(outs, 1), full_q, atol=5e-5,
                               rtol=1e-4)
    # EP refuses the opaque int4 layout with a clear message
    from audax.models.causal_lm import _moe_block
    from audax.parallel.ep import moe_expert_parallel
    from audax.parallel.mesh import make_mesh
    layer0 = jax.tree.map(lambda a: a[0], q4["layers"])
    x = jnp.asarray(rng.standard_normal((2, 8, MOE_TINY.d_model))
                    .astype(np.float32))
    with pytest.raises(ValueError, match="int4 experts"):
        moe_expert_parallel(layer0, MOE_TINY, x, make_mesh(MeshConfig(model=4)))


def test_moe_quantized_expert_parallel(rng):
    """Both EP paths run with int8 experts: the declarative dense-combine
    sharding and the GShard all_to_all schedule each match the
    single-device QUANTIZED forward exactly."""
    import dataclasses as dc
    from audax.models.causal_lm import _moe_block
    from audax.models.quantize import quantize_tree
    from audax.parallel.ep import moe_expert_parallel
    from audax.parallel.mesh import make_mesh
    from audax.parallel.sharding import CAUSAL_LM_TP_RULES, shard_params

    params = quantize_tree(init_causal_lm(MOE_TINY, jax.random.key(0)))
    cfg = dc.replace(MOE_TINY, moe_impl="dense")
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 8)), jnp.int32)
    ref = np.asarray(lm_forward(params, cfg, toks))
    mesh = make_mesh(MeshConfig(model=2))
    sharded = shard_params(params, mesh, rules=CAUSAL_LM_TP_RULES)
    ek = sharded["layers"]["experts"]["gate"]
    assert "model" in ek["kernel_q"].sharding.spec
    assert "model" in ek["kernel_scale"].sharding.spec
    with mesh:
        got = np.asarray(jax.jit(lm_forward, static_argnums=1)(
            sharded, cfg, toks))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)
    # all_to_all schedule, quantized experts
    layer0 = jax.tree.map(lambda a: a[0], params["layers"])
    x = jnp.asarray(rng.standard_normal((2, 8, MOE_TINY.d_model))
                    .astype(np.float32))
    blk_ref = np.asarray(_moe_block(layer0, MOE_TINY, x))
    mesh4 = make_mesh(MeshConfig(model=4))
    got_a2a = np.asarray(moe_expert_parallel(layer0, MOE_TINY, x, mesh4))
    np.testing.assert_allclose(got_a2a, blk_ref, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("with_mask", [False, True])
def test_load_balance_loss_matches_hf(with_mask, rng):
    """MoE training aux loss: Switch eq. 4-6 via HF load_balancing_loss_func
    parity, with and without padding masks — on router logits produced by
    the real forward (return_router_logits=True)."""
    torch = pytest.importorskip("torch")
    from audax.models.causal_lm import load_balance_loss
    hf = _hf_qwen3_moe()
    params, cfg = port_causal_lm_from_hf(hf)
    tokens = rng.integers(0, cfg.vocab_size, (2, 8)).astype(np.int32)
    if with_mask:
        am = np.ones((2, 8), np.int32)
        am[1, 5:] = 0
    else:
        am = None
    logits, router_logits = lm_forward(
        params, cfg, jnp.asarray(tokens),
        attention_mask=None if am is None else jnp.asarray(am),
        return_router_logits=True)
    assert router_logits.shape == (cfg.layers, 16, cfg.num_experts)
    ours = float(load_balance_loss(
        router_logits, cfg.num_experts, cfg.experts_per_tok,
        None if am is None else jnp.asarray(am)))
    with torch.no_grad():
        out = hf(torch.tensor(tokens.astype(np.int64)),
                 attention_mask=(None if am is None
                                 else torch.tensor(am.astype(np.int64))),
                 output_router_logits=True)
    from transformers.models.qwen3_moe.modeling_qwen3_moe import (
        load_balancing_loss_func)
    theirs = float(load_balancing_loss_func(
        out.router_logits, cfg.num_experts, cfg.experts_per_tok,
        None if am is None else torch.tensor(am.astype(np.int64))))
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)
    # and it differentiates: grads reach the router
    def aux(p):
        _, rl = lm_forward(p, cfg, jnp.asarray(tokens),
                           return_router_logits=True)
        return load_balance_loss(rl, cfg.num_experts, cfg.experts_per_tok)
    g = jax.grad(aux)(params)["layers"]["router"]["kernel"]
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0


def test_two_tower_composes_with_moe_decoder(rng):
    """The two-tower's decoder is 'any CausalLMConfig' — an MoE decoder
    (the sparse member of the reference's Qwen3 family) must train-forward
    and KV-generate through the same adapter fusion unchanged."""
    from audax.core.config import TwoTowerConfig, WhisperConfig
    from audax.models.two_tower import TwoTowerModel, init_adapter
    from audax.models.whisper import init_whisper_params

    audio = WhisperConfig(n_mels=8, n_audio_ctx=16, d_model=24,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=40, n_text_ctx=8)
    tt = TwoTowerConfig(adapter_heads=4, top_k_unfrozen_layers=1,
                        max_target_tokens=16)
    lm_params = init_causal_lm(MOE_TINY, jax.random.key(1))
    adapter = init_adapter(jax.random.key(2), audio.d_model,
                           MOE_TINY.d_model, heads=tt.adapter_heads)
    model = TwoTowerModel(init_whisper_params(audio, jax.random.key(0)),
                          audio, {"adapter": adapter, "lm": lm_params},
                          MOE_TINY, tt)
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * audio.n_audio_ctx, audio.n_mels)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, MOE_TINY.vocab_size, (2, 6)),
                      jnp.int32)
    enc = model.encode_audio(mel)
    logits = model.forward(model.params, enc, ids)
    assert logits.shape == (2, 6, MOE_TINY.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    tokens, lengths = model.generate(model.params, enc, start_id=1,
                                     end_id=2, max_len=8, temperature=0.0)
    assert tokens.shape == (2, 8) and lengths.shape == (2,)


def test_two_tower_train_step_with_moe_decoder(rng):
    """The jitted two-tower train step takes grads through the MoE decoder
    (ragged_dot VJP) and the top-K unfreeze mask broadcasts over the 4D
    stacked expert leaves: top layer's experts move, bottom layer's don't."""
    from audax.core.config import TwoTowerConfig, WhisperConfig
    from audax.models.two_tower import TwoTowerModel, init_adapter
    from audax.models.whisper import init_whisper_params
    from audax.train.two_tower import (TwoTowerState,
                                       init_two_tower_optimizer,
                                       make_two_tower_step)

    audio = WhisperConfig(n_mels=8, n_audio_ctx=16, d_model=24,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=40, n_text_ctx=8)
    tt = TwoTowerConfig(adapter_heads=4, top_k_unfrozen_layers=1,
                        max_target_tokens=16, adapter_lr=3e-3, lm_lr=1e-3)
    lm_params = init_causal_lm(MOE_TINY, jax.random.key(1))
    adapter = init_adapter(jax.random.key(2), audio.d_model,
                           MOE_TINY.d_model, heads=tt.adapter_heads)
    model = TwoTowerModel(init_whisper_params(audio, jax.random.key(0)),
                          audio, {"adapter": adapter, "lm": lm_params},
                          MOE_TINY, tt)
    tx, mask = init_two_tower_optimizer(model)
    state = TwoTowerState(step=jnp.int32(0), params=model.params,
                          opt_state=tx.init(model.params), tx=tx,
                          layer_mask=mask)
    train_step, _ = make_two_tower_step(model)
    batch = {
        "mel": jnp.asarray(rng.standard_normal(
            (2, 2 * audio.n_audio_ctx, audio.n_mels)).astype(np.float32)),
        "input_ids": jnp.asarray(
            rng.integers(1, MOE_TINY.vocab_size, (2, 6)), jnp.int32),
        "attention_mask": jnp.ones((2, 6), jnp.int32),
    }
    new_state, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    before = np.asarray(model.params["lm"]["layers"]["experts"]["gate"]
                        ["kernel"])
    after = np.asarray(new_state.params["lm"]["layers"]["experts"]["gate"]
                       ["kernel"])
    assert np.abs(after[-1] - before[-1]).max() > 0    # top layer trains
    np.testing.assert_array_equal(after[0], before[0])  # bottom frozen


def test_two_tower_moe_aux_loss_reachable(rng):
    """cfg.moe_aux_coef wires load_balance_loss into the two-tower loss:
    coef > 0 changes the loss by exactly coef * aux and pushes gradients
    into the router (which pure CE also reaches, but the aux term must
    change them)."""
    import dataclasses as dc
    from audax.core.config import TwoTowerConfig, WhisperConfig
    from audax.models.two_tower import TwoTowerModel, init_adapter
    from audax.models.whisper import init_whisper_params

    audio = WhisperConfig(n_mels=8, n_audio_ctx=16, d_model=24,
                          encoder_layers=1, decoder_layers=1, heads=2,
                          vocab_size=40, n_text_ctx=8)
    lm_params = init_causal_lm(MOE_TINY, jax.random.key(1))
    adapter = init_adapter(jax.random.key(2), audio.d_model,
                           MOE_TINY.d_model, heads=4)
    audio_params = init_whisper_params(audio, jax.random.key(0))
    mel = jnp.asarray(rng.standard_normal(
        (2, 2 * audio.n_audio_ctx, audio.n_mels)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, MOE_TINY.vocab_size, (2, 6)),
                      jnp.int32)
    am = jnp.ones((2, 6), jnp.int32)

    losses, router_grads = {}, {}
    for coef in (0.0, 0.5):
        tt = TwoTowerConfig(adapter_heads=4, top_k_unfrozen_layers=1,
                            max_target_tokens=16, moe_aux_coef=coef)
        model = TwoTowerModel(audio_params, audio,
                              {"adapter": adapter, "lm": lm_params},
                              MOE_TINY, tt)
        enc = model.encode_audio(mel)
        losses[coef] = float(model.loss(model.params, enc, ids, am))
        g = jax.grad(lambda p: model.loss(p, enc, ids, am))(model.params)
        router_grads[coef] = np.asarray(g["lm"]["layers"]["router"]["kernel"])
    assert losses[0.5] != losses[0.0]
    # the difference IS coef * aux (aux >= 1 by construction: sum of
    # fraction*prob products * E >= 1 at any routing)
    aux = (losses[0.5] - losses[0.0]) / 0.5
    assert aux >= 0.99, aux
    assert np.abs(router_grads[0.5] - router_grads[0.0]).max() > 0


def test_moe_port_rejects_mixed_stacks():
    torch = pytest.importorskip("torch")
    try:
        from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Qwen3Moe")
    hc = Qwen3MoeConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        moe_intermediate_size=48, num_experts=4, num_experts_per_tok=2,
        decoder_sparse_step=1, mlp_only_layers=[0], head_dim=8,
        tie_word_embeddings=True, max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = Qwen3MoeForCausalLM(hc).eval()
    with pytest.raises(NotImplementedError):
        port_causal_lm_from_hf(hf)
