"""Flash-attention kernel parity: Pallas (interpret) vs XLA twin vs numpy.

The reference's attention is torch softmax(QK^T)V with materialised
scores (.charles/spectrogram.py:831-867, .charles/music2midi/model.py);
audax's XLA twin reproduces that math and the Pallas kernel must match
the twin bit-tight in f32 — forward AND backward (custom VJP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.ops.attention import flash_attention, xla_attention

pytestmark = pytest.mark.fast


def _rand(rng, *shape, dtype=np.float32):
    return jnp.asarray(rng.standard_normal(shape).astype(dtype))


def _numpy_attention(q, k, v, causal=False):
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    group = q.shape[1] // k.shape[1]
    k, v = np.repeat(k, group, 1), np.repeat(v, group, 1)
    s = np.einsum("bhqd,bhkd->bhqk", q, k) * q.shape[-1] ** -0.5
    if causal:
        tq, tk = s.shape[-2:]
        s = np.where(np.tril(np.ones((tq, tk), bool), tk - tq), s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, v)


def test_xla_twin_matches_numpy(rng):
    q, k, v = (_rand(rng, 2, 4, 37, 16) for _ in range(3))
    out = xla_attention(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), _numpy_attention(q, k, v, True),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla_square(rng, causal):
    q, k, v = (_rand(rng, 2, 3, 128, 64) for _ in range(3))
    ref = xla_attention(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, interpret=True,
                          block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_headfold_parity_and_fallback(rng, monkeypatch):
    """Head folding (opt-in, AUDAX_ATTN_FOLD=2) computes exactly the
    fold=1 output, and causal / GQA / odd head counts / oversize tiles
    fall back to fold=1."""
    from audax.ops.attention import _pick_fold
    monkeypatch.setenv("AUDAX_ATTN_FOLD", "2")
    q, k, v = (_rand(rng, 2, 4, 96, 32) for _ in range(3))
    folded = flash_attention(q, k, v, interpret=True,
                             block_q=32, block_k=32)
    monkeypatch.setenv("AUDAX_ATTN_FOLD", "1")
    plain = flash_attention(q, k, v, interpret=True,
                            block_q=32, block_k=32)
    np.testing.assert_array_equal(np.asarray(folded), np.asarray(plain))
    monkeypatch.setenv("AUDAX_ATTN_FOLD", "2")
    assert _pick_fold(causal=False, group=1, bhq=8, block_q=512) == 2
    assert _pick_fold(causal=True, group=1, bhq=8, block_q=512) == 1
    assert _pick_fold(causal=False, group=2, bhq=8, block_q=512) == 1
    assert _pick_fold(causal=False, group=1, bhq=7, block_q=512) == 1
    assert _pick_fold(causal=False, group=1, bhq=8, block_q=2048) == 1
    monkeypatch.delenv("AUDAX_ATTN_FOLD")
    assert _pick_fold(causal=False, group=1, bhq=8, block_q=512) == 1
    # odd head count still computes correctly (fallback path)
    q3, k3, v3 = (_rand(rng, 1, 3, 64, 32) for _ in range(3))
    ref = xla_attention(q3, k3, v3)
    out = flash_attention(q3, k3, v3, interpret=True,
                          block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_ragged_cross_lengths(rng):
    """Tq != Tk (cross-attention) with both lengths off the tile grid —
    exercises q-row padding and the kv_len lane mask."""
    q = _rand(rng, 1, 4, 100, 64)
    k = _rand(rng, 1, 4, 77, 64)
    v = _rand(rng, 1, 4, 77, 64)
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_gqa_causal(rng):
    q = _rand(rng, 2, 8, 96, 32)
    k = _rand(rng, 2, 2, 96, 32)
    v = _rand(rng, 2, 2, 96, 32)
    ref = xla_attention(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, interpret=True,
                          block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_bf16(rng):
    q, k, v = (_rand(rng, 1, 4, 64, 64).astype(jnp.bfloat16)
               for _ in range(3))
    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, interpret=True, block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("causal,gqa,ragged", [
    (False, 1, False), (True, 1, False), (True, 4, False), (False, 2, True)])
def test_flash_grads_match_xla(rng, causal, gqa, ragged):
    tq = 72 if ragged else 64
    tk = tq if causal or not ragged else 50
    q = _rand(rng, 2, 4, tq, 32)
    k = _rand(rng, 2, 4 // gqa, tk, 32)
    v = _rand(rng, 2, 4 // gqa, tk, 32)
    w = _rand(rng, 2, 4, tq, 32)      # cotangent-shaping weights

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) * w)
        return f

    flash = loss(lambda q, k, v: flash_attention(
        q, k, v, causal=causal, interpret=True, block_q=32, block_k=32))
    ref = loss(lambda q, k, v: xla_attention(q, k, v, causal=causal))
    g_flash = jax.grad(flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4,
                                   err_msg=f"d{name} mismatch")


def _quant_kv(rng, b, h, s, d):
    from audax.models.whisper import quantize_kv
    k = _rand(rng, b, h, s, d)
    v = _rand(rng, b, h, s, d)
    qkv = quantize_kv(k, v)
    return qkv, (k, v)


@pytest.mark.parametrize("tq,pos", [(1, 6), (8, 3), (4, None)])
def test_decode_attention_float_matches_xla(rng, tq, pos):
    from audax.ops.attention import decode_attention
    q = _rand(rng, 2, 4, tq, 64)
    k = _rand(rng, 2, 4, 40, 64)
    v = _rand(rng, 2, 4, 40, 64)
    ref = decode_attention(q, (k, v), pos=pos, backend="xla")
    out = decode_attention(q, (k, v), pos=pos, backend="pallas",
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("tq,pos", [(1, 9), (8, None)])
def test_decode_attention_quant_matches_xla(rng, tq, pos):
    from audax.ops.attention import decode_attention
    q = _rand(rng, 1, 2, tq, 32)
    qkv, _ = _quant_kv(rng, 1, 2, 24, 32)
    ref = decode_attention(q, qkv, pos=pos, backend="xla")
    out = decode_attention(q, qkv, pos=pos, backend="pallas",
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_decode_attention_pos_masks_future(rng):
    """With pos=p, key j > p must not influence the Tq=1 output."""
    from audax.ops.attention import decode_attention
    q = _rand(rng, 1, 2, 1, 32)
    k = _rand(rng, 1, 2, 20, 32)
    v = _rand(rng, 1, 2, 20, 32)
    base = decode_attention(q, (k, v), pos=7, backend="pallas",
                            interpret=True)
    k2 = k.at[:, :, 8:].set(99.0)
    v2 = v.at[:, :, 8:].set(-99.0)
    pert = decode_attention(q, (k2, v2), pos=7, backend="pallas",
                            interpret=True)
    np.testing.assert_allclose(np.asarray(pert), np.asarray(base),
                               atol=1e-6)


def test_decode_attention_gqa(rng):
    from audax.ops.attention import decode_attention
    q = _rand(rng, 2, 8, 1, 32)
    k = _rand(rng, 2, 2, 24, 32)
    v = _rand(rng, 2, 2, 24, 32)
    ref = decode_attention(q, (k, v), pos=10, backend="xla")
    out = decode_attention(q, (k, v), pos=10, backend="pallas",
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("quant,gqa,tq", [(False, 1, 1), (False, 2, 8),
                                          (True, 1, 4)])
def test_decode_attention_stacked(rng, quant, gqa, tq):
    """Layer-stacked cache variant: pallas (scalar-prefetch layer index)
    vs the XLA twin, per layer."""
    from audax.models.whisper import quantize_kv
    from audax.ops.attention import decode_attention_stacked
    L, b, h, s, d = 3, 2, 4, 24, 32
    q = _rand(rng, b, h, tq, d)
    k = _rand(rng, L, b, h // gqa, s, d)
    v = _rand(rng, L, b, h // gqa, s, d)
    kv = quantize_kv(k, v) if quant else (k, v)
    for li in range(L):
        ref = decode_attention_stacked(q, kv, jnp.int32(li), pos=10,
                                       backend="xla")
        out = decode_attention_stacked(q, kv, jnp.int32(li), pos=10,
                                       backend="pallas", interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=f"layer {li}")


@pytest.mark.parametrize("quant,gqa", [(False, 2), (True, 1)])
def test_decode_attention_stacked_per_slot_pos(rng, quant, gqa):
    """pos as a [B] vector (continuous batching: slots at different decode
    depths) must equal per-sample scalar-pos calls, on both backends."""
    from audax.models.whisper import quantize_kv
    from audax.ops.attention import decode_attention_stacked
    L, b, h, s, d = 2, 4, 4, 24, 32
    q = _rand(rng, b, h, 1, d)
    k = _rand(rng, L, b, h // gqa, s, d)
    v = _rand(rng, L, b, h // gqa, s, d)
    kv = quantize_kv(k, v) if quant else (k, v)
    pos = jnp.array([3, 17, 0, 11], jnp.int32)
    for backend in ("xla", "pallas"):
        out = decode_attention_stacked(q, kv, jnp.int32(1), pos=pos,
                                       backend=backend, interpret=True)
        for i in range(b):
            sl = lambda x: x[:, i:i + 1]
            kv_i = tuple(sl(x) for x in kv)
            ref = decode_attention_stacked(q[i:i + 1], kv_i, jnp.int32(1),
                                           pos=int(pos[i]),
                                           backend=backend, interpret=True)
            np.testing.assert_allclose(np.asarray(out[i:i + 1]),
                                       np.asarray(ref),
                                       atol=2e-5, rtol=1e-5,
                                       err_msg=f"{backend} slot {i}")
