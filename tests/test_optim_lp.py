"""Low-precision Adam moments (train/optim.py:scale_by_adam_lp).

Contracts:
  * moments="float32" is an exact twin of the optax chain init_finetune
    previously built (clip_by_global_norm + optax.adamw) — the default
    path cannot drift;
  * moments="bfloat16" stores bf16 moments (half the optimizer-state
    bytes) and optimizes a real problem to the same solution;
  * moments="int8" blockwise quantizer round-trips within its resolution
    and still trains;
  * init_finetune(moment_dtype=...) threads the knob end-to-end (state
    dtype + a loss-goes-down fine-tune step on the tiny whisper).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audax.train.optim import (_q8_decode, _q8_encode, adamw_lp,
                               moment_bytes_per_param, scale_by_adam_lp,
                               seq2seq_schedule)


def _tree(seed=0):
    r = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(r.standard_normal((7, 5)), jnp.float32),
        "b": jnp.asarray(r.standard_normal((5,)), jnp.float32),
        # a container with a "q" key, like whisper attention blocks —
        # regression for the int8 path's leaf/container confusion
        "attn": {"q": jnp.asarray(r.standard_normal((4, 4)), jnp.float32),
                 "k": jnp.asarray(r.standard_normal((4, 4)), jnp.float32)},
        "nested": {"s": jnp.asarray(r.standard_normal((3, 3, 2)),
                                    jnp.float32)},
    }


def _grads(step, seed=1):
    r = np.random.default_rng(seed + step)
    t = _tree()
    return jax.tree.map(
        lambda p: jnp.asarray(r.standard_normal(p.shape), jnp.float32), t)


def test_f32_mode_matches_previous_optax_chain():
    sched = seq2seq_schedule(1e-3, 3, 50)
    ref_tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(sched))
    new_tx = adamw_lp(sched, grad_clip=1.0, moments="float32")
    p_ref, p_new = _tree(), _tree()
    s_ref, s_new = ref_tx.init(p_ref), new_tx.init(p_new)
    for step in range(5):
        g = _grads(step)
        u_ref, s_ref = ref_tx.update(g, s_ref, p_ref)
        u_new, s_new = new_tx.update(g, s_new, p_new)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_new = optax.apply_updates(p_new, u_new)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6,
                                                    atol=1e-7),
            p_ref, p_new)


@pytest.mark.parametrize("moments", ["bfloat16", "int8"])
def test_lp_modes_track_f32_trajectory(moments):
    sched = 1e-3
    f32 = adamw_lp(sched, moments="float32")
    lp = adamw_lp(sched, moments=moments)
    p32, plp = _tree(), _tree()
    s32, slp = f32.init(p32), lp.init(plp)
    for step in range(20):
        g = _grads(step)
        u32, s32 = f32.update(g, s32, p32)
        ulp, slp = lp.update(g, slp, plp)
        p32 = optax.apply_updates(p32, u32)
        plp = optax.apply_updates(plp, ulp)
    # parameter drift after 20 steps stays far below the update scale
    # (20 steps x lr 1e-3 on ~N(0,1) Adam directions moves params ~0.02)
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(plp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_bf16_state_dtypes_and_bytes():
    tx = scale_by_adam_lp(moments="bfloat16")
    p = _tree()
    s = tx.init(p)
    for leaf in jax.tree.leaves(s.mu) + jax.tree.leaves(s.nu):
        assert leaf.dtype == jnp.bfloat16
    assert moment_bytes_per_param("bfloat16") == 4.0
    assert moment_bytes_per_param("float32") == 8.0
    assert moment_bytes_per_param("int8") < 3.5


def test_int8_state_dtypes():
    tx = scale_by_adam_lp(moments="int8")
    p = _tree()
    s = tx.init(p)
    for leaf in jax.tree.leaves(s.mu["q"]):
        assert leaf.dtype == jnp.int8
    for leaf in jax.tree.leaves(s.nu):
        assert leaf.dtype == jnp.bfloat16
    # one update keeps the layout (jit-compatible pytree structure)
    g = _grads(0)
    u, s2 = tx.update(g, s, p)
    assert jax.tree.structure(s2) == jax.tree.structure(s)


@pytest.mark.parametrize("shape", [(300,), (3, 5), (256,), (1, 257)])
def test_q8_roundtrip_resolution(shape):
    r = np.random.default_rng(3)
    x = jnp.asarray(r.standard_normal(shape) * 0.01, jnp.float32)
    enc = _q8_encode(x)
    dec = _q8_decode(enc, shape)
    assert dec.shape == shape
    # blockwise absmax resolution: error <= blockmax/127/2 <= absmax/254
    bound = float(jnp.max(jnp.abs(x))) / 254.0 + 1e-12
    assert float(jnp.max(jnp.abs(dec - x))) <= bound * 1.0001


def test_q8_zero_block_is_exact():
    x = jnp.zeros((513,), jnp.float32)
    enc = _q8_encode(x)
    assert float(jnp.max(jnp.abs(_q8_decode(enc, (513,))))) == 0.0


@pytest.mark.parametrize("moments", ["float32", "bfloat16", "int8"])
def test_least_squares_converges(moments):
    r = np.random.default_rng(0)
    a = jnp.asarray(r.standard_normal((64, 16)), jnp.float32)
    w_true = jnp.asarray(r.standard_normal((16,)), jnp.float32)
    y = a @ w_true
    tx = adamw_lp(3e-2, weight_decay=0.0, moments=moments)
    w = jnp.zeros((16,), jnp.float32)
    s = tx.init(w)

    @jax.jit
    def step(w, s):
        loss, g = jax.value_and_grad(
            lambda w: jnp.mean((a @ w - y) ** 2))(w)
        u, s = tx.update(g, s, w)
        return optax.apply_updates(w, u), s, loss

    for _ in range(400):
        w, s, loss = step(w, s)
    assert float(loss) < 5e-2, f"{moments}: {float(loss)}"


def test_init_finetune_moment_dtype_end_to_end():
    from audax.core.config import FineTuneConfig, WhisperConfig
    from audax.models.whisper import init_whisper_params
    from audax.train.seq2seq import (collate_seq2seq, init_finetune,
                                     make_finetune_step)
    tiny = WhisperConfig(n_mels=8, n_audio_ctx=16, d_model=16,
                         encoder_layers=1, decoder_layers=1, heads=2,
                         vocab_size=50, n_text_ctx=16)
    params = init_whisper_params(tiny, jax.random.key(0))
    cfg = FineTuneConfig(learning_rate=1e-3, warmup_steps=1, max_steps=100,
                         lora_rank=0, moment_dtype="bfloat16")
    state = init_finetune(params, cfg)
    mu_leaves = jax.tree.leaves(state.opt_state[1].mu)
    assert all(x.dtype == jnp.bfloat16 for x in mu_leaves)
    step = make_finetune_step(tiny, remat=False, donate=False)
    r = np.random.default_rng(0)
    batch = collate_seq2seq([[1, 5, 6, 9], [1, 5, 9]], decoder_start_id=1)
    batch = {"mel": jnp.asarray(r.standard_normal((2, 32, 8)), jnp.float32),
             "decoder_input_ids": jnp.asarray(batch["decoder_input_ids"]),
             "labels": jnp.asarray(batch["labels"])}
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
