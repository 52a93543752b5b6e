"""Whisper-family encoder-decoder, TPU-first functional JAX.

Replaces the reference's HF/openai-whisper checkpoints-as-a-service usage
(reference: AB/wavToWhisper.py:10, AB/fineTune.py:131,
.charles/music2midi/model.py:28-40) with an in-framework implementation:

  * explicit parameter pytrees (plain nested dicts) — trivially portable from
    HF torch checkpoints (models/port.py), shardable by path rules
    (parallel/sharding.py), and LoRA-injectable (models/lora.py);
  * transformer layers are STACKED (leading ``n_layers`` axis) and executed
    with ``lax.scan`` — compile time is O(1) in depth, which matters from
    whisper-tiny (4 layers) to large-v3 (32);
  * pre-LN blocks; encoder = 2x conv1d (stride 1, 2) + fixed sinusoidal
    positions; decoder = learned positions + causal self-attn + cross-attn;
    logits tied to the token embedding;
  * decode path split into ``precompute_cross_kv`` (once per utterance) and
    ``decode_step`` over a preallocated fixed-shape KV cache, so the
    autoregressive loop is a single ``lax.while_loop``-able step (the
    reference regenerated the full prefix every token,
    music2midi/model.py:293-344 — this rebuild is O(n), not O(n^2)).

Architecture constants follow the published Whisper family so real
checkpoints port (k_proj has no bias; LayerNorm eps 1e-5; attention scale
head_dim**-0.5; exact GELU).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from audax.core.config import WhisperConfig

Params = Dict[str, Any]

__all__ = [
    "init_whisper_params", "encode", "decode_train", "whisper_forward",
    "init_kv_cache", "precompute_cross_kv", "decode_step", "decode_span",
    "decode_step_ragged",
    "sinusoidal_positions", "KVCache", "QuantKV", "quantize_kv",
]


# ---------------------------------------------------------------------------
# init

def _dense(rng, d_in, d_out, *, bias=True, scale=None):
    scale = scale if scale is not None else 1.0 / math.sqrt(d_in)
    p = {"kernel": jax.random.normal(rng, (d_in, d_out), jnp.float32) * scale}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def _attn_params(rng, d):
    ks = jax.random.split(rng, 4)
    return {
        "q": _dense(ks[0], d, d),
        "k": _dense(ks[1], d, d, bias=False),   # whisper: no k bias
        "v": _dense(ks[2], d, d),
        "out": _dense(ks[3], d, d),
    }


def _block_params(rng, d, *, cross: bool):
    ks = jax.random.split(rng, 5)
    p = {
        "attn_ln": _ln(d),
        "attn": _attn_params(ks[0], d),
        "mlp_ln": _ln(d),
        "mlp_in": _dense(ks[1], d, 4 * d),
        "mlp_out": _dense(ks[2], 4 * d, d),
    }
    if cross:
        p["cross_ln"] = _ln(d)
        p["cross_attn"] = _attn_params(ks[3], d)
    return p


def _stack_layers(layer_list):
    """List of per-layer param dicts -> one dict with leading layer axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layer_list)


def sinusoidal_positions(length: int, channels: int) -> jnp.ndarray:
    """Whisper's fixed encoder positions (log-spaced timescales)."""
    assert channels % 2 == 0
    log_inc = math.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(np.concatenate([np.sin(t), np.cos(t)], axis=1),
                       dtype=jnp.float32)


def init_whisper_params(cfg: WhisperConfig, rng: jax.Array) -> Params:
    ks = jax.random.split(rng, 8)
    enc_layers = _stack_layers([
        _block_params(k, cfg.d_model, cross=False)
        for k in jax.random.split(ks[0], cfg.encoder_layers)])
    dec_layers = _stack_layers([
        _block_params(k, cfg.d_model, cross=True)
        for k in jax.random.split(ks[1], cfg.decoder_layers)])
    return {
        "encoder": {
            "conv1": {"kernel": jax.random.normal(ks[2], (3, cfg.n_mels, cfg.d_model))
                      * (1.0 / math.sqrt(3 * cfg.n_mels)),
                      "bias": jnp.zeros((cfg.d_model,))},
            "conv2": {"kernel": jax.random.normal(ks[3], (3, cfg.d_model, cfg.d_model))
                      * (1.0 / math.sqrt(3 * cfg.d_model)),
                      "bias": jnp.zeros((cfg.d_model,))},
            "pos": sinusoidal_positions(cfg.n_audio_ctx, cfg.d_model),
            "layers": enc_layers,
            "ln": _ln(cfg.d_model),
        },
        "decoder": {
            "embed": jax.random.normal(ks[4], (cfg.vocab_size, cfg.d_model)) * 0.02,
            "pos": jax.random.normal(ks[5], (cfg.n_text_ctx, cfg.d_model)) * 0.01,
            "layers": dec_layers,
            "ln": _ln(cfg.d_model),
        },
    }


# ---------------------------------------------------------------------------
# primitives

def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
    y = (x32 - mean) * lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p or "kernel_q4" in p:  # int8/int4 weight-only serving
        from audax.models.quantize import dequant_dense
        return dequant_dense(p, x)
    y = jnp.einsum("...d,df->...f", x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, d = x.shape
    return x.reshape(b, t, heads, d // heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def attention(p: Params, x: jnp.ndarray, heads: int, *,
              kv: Optional[jnp.ndarray] = None,
              mask: Optional[jnp.ndarray] = None,
              causal: bool = False,
              kv_cached: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None
              ) -> jnp.ndarray:
    """Multi-head attention. ``kv``: cross-attention source; ``kv_cached``:
    precomputed (k, v) head tensors [B, H, S, hd] (decode fast path).
    ``causal``/maskless paths dispatch to the fused flash kernel on TPU
    (ops/attention.py); arbitrary ``mask`` arrays stay on the XLA twin."""
    q = _split_heads(dense(p["q"], x), heads)
    scale = (q.shape[-1]) ** -0.5
    if kv_cached is not None and mask is None:
        # decode fast path: fused cached-KV kernel (int8 scales in-kernel)
        from audax.ops.attention import decode_attention
        out = decode_attention(q, kv_cached, scale=scale)
        return dense(p["out"], _merge_heads(out))
    if isinstance(kv_cached, QuantKV):
        # every int8-KV caller is maskless and took the decode fast path
        # above; a second einsum implementation here could only drift
        # untested from ops/attention.py's quant handling
        raise NotImplementedError("QuantKV attention with an explicit mask "
                                  "has no caller; use the decode fast path")
    if kv_cached is not None:
        k, v = kv_cached
    else:
        src = kv if kv is not None else x
        k = _split_heads(dense(p["k"], src), heads)
        v = _split_heads(dense(p["v"], src), heads)
    from audax.ops.attention import dot_product_attention
    out = dot_product_attention(q, k, v, causal=causal, mask=mask,
                                scale=scale)
    return dense(p["out"], _merge_heads(out))


def _gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU with dtype-matched precision: exact erf in f32 (HF logit
    parity <=5e-5 holds there), the tanh approximation in bf16 — the
    tanh-vs-erf difference (~1e-3 of the activation) is BELOW bf16's own
    rounding step (~4e-3), while the erf evaluation is VPU-bound and
    slope-timed at 1.14 ms per [8,1500,3072] layer activation (~25% of a
    whisper-small encoder layer's forward; tools/train_step_breakdown.py
    micro stages). Precision that the dtype cannot represent is not
    precision, just latency."""
    return jax.nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def _mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return dense(p["mlp_out"], _gelu(dense(p["mlp_in"], x)))


# ---------------------------------------------------------------------------
# encoder

def conv_stem(params: Params, cfg: WhisperConfig, mel: jnp.ndarray,
              dtype=jnp.float32) -> jnp.ndarray:
    """Encoder conv stem: mel [B, T, n_mels] -> [B, T//2, d_model] with
    positions added. Shared by ``encode`` and the sequence-parallel
    encoder (parallel/sp.py) so the stem cannot silently diverge between
    the plain and SP paths."""
    p = params["encoder"]
    x = mel.astype(dtype)
    x = _gelu(lax.conv_general_dilated(
        x, p["conv1"]["kernel"].astype(dtype), window_strides=(1,),
        padding=((1, 1),), dimension_numbers=("NHC", "HIO", "NHC"))
        + p["conv1"]["bias"].astype(dtype))
    x = _gelu(lax.conv_general_dilated(
        x, p["conv2"]["kernel"].astype(dtype), window_strides=(2,),
        padding=((1, 1),), dimension_numbers=("NHC", "HIO", "NHC"))
        + p["conv2"]["bias"].astype(dtype))
    return x + p["pos"].astype(dtype)[None, : x.shape[1]]


def _remat_body(body, remat):
    """Per-LAYER gradient checkpointing for a scanned layer stack.

    Wrapping the whole forward in one ``jax.checkpoint`` is a no-op for
    peak memory — the backward replays the full forward, so every
    activation is live again at once (measured: whisper-small b8 plans
    13.1 GB with remat=True AND remat=False). Checkpointing the scan BODY
    is the real thing: the backward scan recomputes one layer at a time,
    so saved state is just the per-layer boundary activations — including
    the flash-attention custom-VJP residuals, which become transient
    (jax.checkpoint cannot rematerialize THROUGH a custom_vjp, but it can
    recompute its inputs and replay it). remat="dots" keeps each layer's
    matmul outputs (less recompute, a bit more memory)."""
    if not remat:
        return body
    policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
              if remat == "dots" else None)
    return jax.checkpoint(body, policy=policy)


@functools.partial(jax.jit, static_argnums=(1, 3),
                   static_argnames=("dtype", "remat"))
def encode(params: Params, cfg: WhisperConfig, mel: jnp.ndarray,
           dtype=jnp.float32, *, remat=False) -> jnp.ndarray:
    """mel [B, T_frames, n_mels] (time-major) -> encoder states
    [B, T_frames//2, d_model].

    Def-site jitted (cfg/dtype static): serving calls it eagerly per
    request, and an unjitted ``lax.scan`` would re-trace + recompile its
    layer loop on every call (fresh body identity). Inside an outer jit
    it simply inlines. ``remat`` (False | True | "dots") checkpoints each
    scanned layer (training path; see ``_remat_body``)."""
    p = params["encoder"]
    x = conv_stem(params, cfg, mel, dtype)

    def body(x, layer):
        h = layer_norm(layer["attn_ln"], x)
        x = x + attention(layer["attn"], h, cfg.heads)
        h = layer_norm(layer["mlp_ln"], x)
        x = x + _mlp(layer, h)
        return x, None

    x, _ = lax.scan(_remat_body(body, remat), x, p["layers"])
    return layer_norm(p["ln"], x)


# ---------------------------------------------------------------------------
# decoder (training / teacher-forced)

def decode_train(params: Params, cfg: WhisperConfig, tokens: jnp.ndarray,
                 enc: jnp.ndarray, dtype=jnp.float32, *,
                 remat=False) -> jnp.ndarray:
    """tokens [B, L] int32 -> logits [B, L, vocab] with causal masking."""
    from audax.models.quantize import embed_logits, embed_lookup
    p = params["decoder"]
    b, l = tokens.shape
    x = embed_lookup(p, tokens, dtype) + p["pos"][:l].astype(dtype)

    def body(x, layer):
        h = layer_norm(layer["attn_ln"], x)
        x = x + attention(layer["attn"], h, cfg.heads, causal=True)
        h = layer_norm(layer["cross_ln"], x)
        x = x + attention(layer["cross_attn"], h, cfg.heads, kv=enc)
        h = layer_norm(layer["mlp_ln"], x)
        x = x + _mlp(layer, h)
        return x, None

    x, _ = lax.scan(_remat_body(body, remat), x, p["layers"])
    x = layer_norm(p["ln"], x)
    return embed_logits(p, x)


def whisper_forward(params: Params, cfg: WhisperConfig, mel: jnp.ndarray,
                    tokens: jnp.ndarray, dtype=jnp.float32, *,
                    remat=False) -> jnp.ndarray:
    """Full seq2seq forward (fine-tuning path): mel + decoder input tokens
    -> logits. ``remat`` checkpoints per scanned LAYER in both stacks
    (see ``_remat_body`` — an outer whole-forward checkpoint does not
    reduce peak memory)."""
    return decode_train(params, cfg, tokens,
                        encode(params, cfg, mel, dtype, remat=remat),
                        dtype, remat=remat)


# ---------------------------------------------------------------------------
# decoder (incremental, KV-cached)

class KVCache(NamedTuple):
    """Fixed-shape self-attention cache: k/v [layers, B, H, max_len, hd]."""
    k: jnp.ndarray
    v: jnp.ndarray


class QuantKV(NamedTuple):
    """Int8 KV with one scale per key/value vector: ``*_q`` int8
    [..., T, hd], ``*_scale`` f32 [..., T].

    TPU decode reads the whole cache every token, so KV bytes are decode
    bandwidth (at large-v3 the 1500-frame cross KV is ~1 GB/token read in
    bf16); int8 halves that and the per-stream cache memory of batched
    streaming serving. Scales fold into the attention einsums (scores *=
    k_scale over the key axis; probs *= v_scale before the value matmul),
    so nothing is ever dequantized to a full float tensor."""
    k_q: jnp.ndarray
    k_scale: jnp.ndarray
    v_q: jnp.ndarray
    v_scale: jnp.ndarray


def quantize_kv(k: jnp.ndarray, v: jnp.ndarray) -> QuantKV:
    """Per-vector symmetric int8 over the head dim (any leading shape)."""

    def one(x):
        s = jnp.max(jnp.abs(x), axis=-1) / 127.0
        s = jnp.maximum(s, 1e-8)
        q = jnp.clip(jnp.round(x / s[..., None]), -127, 127).astype(jnp.int8)
        return q, s.astype(jnp.float32)

    kq, ks = one(k)
    vq, vs = one(v)
    return QuantKV(kq, ks, vq, vs)


def init_kv_cache(cfg: WhisperConfig, batch: int, max_len: int,
                  dtype=jnp.float32, quant: bool = False):
    hd = cfg.d_model // cfg.heads
    shape = (cfg.decoder_layers, batch, cfg.heads, max_len, hd)
    if quant:
        return QuantKV(jnp.zeros(shape, jnp.int8),
                       jnp.ones(shape[:-1], jnp.float32),
                       jnp.zeros(shape, jnp.int8),
                       jnp.ones(shape[:-1], jnp.float32))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def precompute_cross_kv(params: Params, cfg: WhisperConfig, enc: jnp.ndarray,
                        quant: bool = False):
    """Cross-attention K/V for all layers, computed once per utterance:
    [layers, B, H, S, hd] each (``quant=True``: int8 + per-vector scales)."""
    layers = params["decoder"]["layers"]

    def per_layer(layer):
        k = _split_heads(dense(layer["cross_attn"]["k"], enc), cfg.heads)
        v = _split_heads(dense(layer["cross_attn"]["v"], enc), cfg.heads)
        return k, v

    k, v = jax.vmap(per_layer)(layers)
    return quantize_kv(k, v) if quant else (k, v)


def decode_step(params: Params, cfg: WhisperConfig, token: jnp.ndarray,
                pos: jnp.ndarray, cache,
                cross_kv,
                dtype=jnp.float32):
    """One autoregressive step.

    token [B] int32, pos scalar int32 (current write position), fixed-shape
    cache. Returns (logits [B, vocab], updated cache). jit/while_loop safe:
    static shapes, dynamic_update_slice writes, position-masked attention.

    ``cache``/``cross_kv`` are either the float pair types (KVCache /
    (k, v)) or their int8 ``QuantKV`` forms from ``init_kv_cache(quant=
    True)`` / ``precompute_cross_kv(quant=True)`` — the layer scan slices
    whichever pytree it is given, so both paths share this one step.
    """
    logits, cache = decode_span(params, cfg, token[:, None], pos, cache,
                                cross_kv, dtype)
    return logits[:, 0], cache


def decode_span(params: Params, cfg: WhisperConfig, tokens: jnp.ndarray,
                pos: jnp.ndarray, cache,
                cross_kv,
                dtype=jnp.float32):
    """Teacher-forced span decode WITH cache append: tokens [B, K] occupy
    positions pos..pos+K-1; returns (logits [B, K, vocab], updated cache).

    The K=1 case is ``decode_step``. K>1 is the speculative-decoding
    verifier (infer/speculative.py): the target model scores K draft
    tokens in ONE pass — K-row matmuls instead of K sequential matvecs
    reading the weights K times. Query i attends cached positions
    <= pos+i (in-span causality); span slots are (re)written before
    attention, which is what lets stale rejected-branch cache entries
    self-heal across speculative iterations.
    """
    from audax.models.quantize import embed_logits, embed_lookup
    p = params["decoder"]
    kk = tokens.shape[1]
    x = embed_lookup(p, tokens, dtype) + \
        lax.dynamic_slice_in_dim(p["pos"], pos, kk)[None].astype(dtype)
    quant_self = isinstance(cache, QuantKV)

    # the stacked [L, ...] caches are scan CARRY (not xs): the attention
    # kernel layer-indexes them via scalar prefetch, so the hot loop never
    # materialises a per-layer cache slice (ops/attention.py:
    # decode_attention_stacked). Int4 weights get the same treatment: the
    # scan carries only the layer index and the int4 matmul kernel selects
    # the layer inside its index maps (ops/int4_matmul.py), so neither
    # caches nor weights are ever sliced into per-layer copies.
    from audax.ops.attention import decode_attention_stacked

    def step(x, c, li, layer):
        h = layer_norm(layer["attn_ln"], x)
        q = _split_heads(dense(layer["attn"]["q"], h), cfg.heads)
        k1 = _split_heads(dense(layer["attn"]["k"], h), cfg.heads)
        v1 = _split_heads(dense(layer["attn"]["v"], h), cfg.heads)
        scale = q.shape[-1] ** -0.5
        if quant_self:
            new = quantize_kv(k1, v1)            # [B, H, K, hd] / [B, H, K]
            c = QuantKV(
                lax.dynamic_update_slice(c.k_q, new.k_q[None],
                                         (li, 0, 0, pos, 0)),
                lax.dynamic_update_slice(c.k_scale, new.k_scale[None],
                                         (li, 0, 0, pos)),
                lax.dynamic_update_slice(c.v_q, new.v_q[None],
                                         (li, 0, 0, pos, 0)),
                lax.dynamic_update_slice(c.v_scale, new.v_scale[None],
                                         (li, 0, 0, pos)))
        else:
            c = KVCache(
                lax.dynamic_update_slice(c.k, k1[None], (li, 0, 0, pos, 0)),
                lax.dynamic_update_slice(c.v, v1[None], (li, 0, 0, pos, 0)))
        attn_out = decode_attention_stacked(q, c, li, pos=pos, scale=scale)
        x = x + dense(layer["attn"]["out"], _merge_heads(attn_out))

        h = layer_norm(layer["cross_ln"], x)
        qc = _split_heads(dense(layer["cross_attn"]["q"], h), cfg.heads)
        co = decode_attention_stacked(qc, cross_kv, li,
                                      scale=qc.shape[-1] ** -0.5)
        x = x + dense(layer["cross_attn"]["out"], _merge_heads(co))
        h = layer_norm(layer["mlp_ln"], x)
        x = x + _mlp(layer, h)
        return x, c

    if "kernel_q4" in p["layers"]["attn"]["q"]:
        from audax.models.quantize import stacked_layer_view

        def body(carry, li):
            x, c = carry
            x, c = step(x, c, li, stacked_layer_view(p["layers"], li))
            return (x, c), None

        (x, new_cache), _ = lax.scan(body, (x, cache),
                                     jnp.arange(cfg.decoder_layers))
    else:
        def body(carry, scanned):
            x, c = carry
            layer, li = scanned
            x, c = step(x, c, li, layer)
            return (x, c), None

        (x, new_cache), _ = lax.scan(
            body, (x, cache),
            (p["layers"], jnp.arange(cfg.decoder_layers)))
    x = layer_norm(p["ln"], x)
    return embed_logits(p, x), new_cache


def decode_step_ragged(params: Params, cfg: WhisperConfig,
                       token: jnp.ndarray, pos: jnp.ndarray, cache,
                       cross_kv, dtype=jnp.float32):
    """``decode_step`` with PER-SLOT positions: token [B], pos [B] int32.

    Slot b writes its new K/V at ``pos[b]`` and attends cached keys
    ``<= pos[b]`` — the primitive that makes continuous batching possible
    (infer/continuous.py): serving slots sit at *different* decode depths,
    so a finished slot can be refilled with a new request mid-flight while
    its neighbours keep decoding. The reference's serving story has no
    batching at all (one `model.transcribe` per file,
    AB/wavToWhisper.py:10-13); fixed-batch decode (infer/decode.py:generate)
    convoys every slot behind the slowest.

    Returns (logits [B, vocab], updated cache). The per-slot cache write is
    an advanced-index scatter (rows land at different S offsets); the
    attention mask rides decode_attention_stacked's per-slot ``pos`` vector.
    """
    from audax.models.quantize import embed_logits, embed_lookup
    from audax.ops.attention import decode_attention_stacked
    p = params["decoder"]
    b = token.shape[0]
    bidx = jnp.arange(b)
    x = embed_lookup(p, token[:, None], dtype) + \
        p["pos"][pos][:, None].astype(dtype)            # [B, 1, d]
    quant_self = isinstance(cache, QuantKV)

    def step(x, c, li, layer):
        h = layer_norm(layer["attn_ln"], x)
        q = _split_heads(dense(layer["attn"]["q"], h), cfg.heads)
        k1 = _split_heads(dense(layer["attn"]["k"], h), cfg.heads)
        v1 = _split_heads(dense(layer["attn"]["v"], h), cfg.heads)
        scale = q.shape[-1] ** -0.5
        # per-slot scatter: row b of the new K/V lands at (li, b, :, pos[b])
        if quant_self:
            new = quantize_kv(k1, v1)          # [B, H, 1, hd] / [B, H, 1]
            c = QuantKV(
                c.k_q.at[li, bidx, :, pos].set(new.k_q[:, :, 0]),
                c.k_scale.at[li, bidx, :, pos].set(new.k_scale[:, :, 0]),
                c.v_q.at[li, bidx, :, pos].set(new.v_q[:, :, 0]),
                c.v_scale.at[li, bidx, :, pos].set(new.v_scale[:, :, 0]))
        else:
            c = KVCache(c.k.at[li, bidx, :, pos].set(k1[:, :, 0]),
                        c.v.at[li, bidx, :, pos].set(v1[:, :, 0]))
        attn_out = decode_attention_stacked(q, c, li, pos=pos, scale=scale)
        x = x + dense(layer["attn"]["out"], _merge_heads(attn_out))

        h = layer_norm(layer["cross_ln"], x)
        qc = _split_heads(dense(layer["cross_attn"]["q"], h), cfg.heads)
        co = decode_attention_stacked(qc, cross_kv, li,
                                      scale=qc.shape[-1] ** -0.5)
        x = x + dense(layer["cross_attn"]["out"], _merge_heads(co))
        h = layer_norm(layer["mlp_ln"], x)
        x = x + _mlp(layer, h)
        return x, c

    if "kernel_q4" in p["layers"]["attn"]["q"]:
        from audax.models.quantize import stacked_layer_view

        def body(carry, li):
            x, c = carry
            x, c = step(x, c, li, stacked_layer_view(p["layers"], li))
            return (x, c), None

        (x, new_cache), _ = lax.scan(body, (x, cache),
                                     jnp.arange(cfg.decoder_layers))
    else:
        def body(carry, scanned):
            x, c = carry
            layer, li = scanned
            x, c = step(x, c, li, layer)
            return (x, c), None

        (x, new_cache), _ = lax.scan(
            body, (x, cache),
            (p["layers"], jnp.arange(cfg.decoder_layers)))
    x = layer_norm(p["ln"], x)
    return embed_logits(p, x)[:, 0], new_cache
