"""Two-tower audio->ABC transcription model.

Rebuilds .charles/music2midi/model.py as a TPU-first composition:

  frozen Whisper encoder  ->  cross-attention adapter  ->  causal LM
  (audax whisper encode)      (text queries, audio KV)     (audax causal_lm)

Fixes designed in, not bolted on:
  * the reference ran WhisperProcessor per-sample on CPU inside the train
    loop (model.py:94-110, the major perf sink per SURVEY.md §3.4) — here
    mel extraction is the batched fused frontend and the encoder pass is one
    jitted call;
  * generation recomputed the full prefix per token with no KV cache
    (model.py:293-344) — here the adapter is applied per-token (its
    cross-attention has no intra-text dependencies) and decoding rides the
    LM's fixed-shape KV cache;
  * ``requires_grad`` surgery (model.py:242-261) becomes a gradient mask:
    adapter + top-K LM layers + final norm + embeddings train, everything
    else is zeroed by optax transforms (train/two_tower.py).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from audax.core.config import TwoTowerConfig, WhisperConfig
from audax.models.causal_lm import (CausalLMConfig, LMKVCache, embed_tokens,
                                    forward_with_embeds, init_lm_cache,
                                    lm_decode_step, lm_logits)
from audax.models.whisper import encode as whisper_encode

Params = Dict[str, Any]

__all__ = ["TwoTowerModel", "init_adapter", "adapter_apply",
           "adapter_cross_kv", "adapter_apply_kv", "build_two_tower"]


# ----------------------------------------------------------- adapter ------
def _dense(rng, d_in, d_out):
    return {"kernel": jax.random.normal(rng, (d_in, d_out), jnp.float32)
            / math.sqrt(d_in),
            "bias": jnp.zeros((d_out,), jnp.float32)}


def init_adapter(rng: jax.Array, audio_dim: int, text_dim: int,
                 heads: int = 8, ffn_mult: int = 4) -> Params:
    """Near-identity ("zero-gated") init: the cross-attention ``out`` and
    ``ffn_out`` projections start at ZERO, so at step 0 the adapter is
    just LN(LN(text)) and the LM sees (approximately) its native
    embedding stream; audio enters gradually through the learned output
    gates — the Flamingo/LLaVA-style adapter recipe. Measured on the
    music proof (6 items x 200 epochs, polyphonic grammar): with the
    reference-style full-random init the two-tower stalls at loss
    2.6-3.2 when the decoder is a PRETRAINED LM (the fresh adapter's
    output distribution destroys the frozen pretrained layers' input
    expectations) and reaches only 0.21 from a random decoder; zero-gated,
    both arms reach ~0.02 and pretraining goes from hurting to helping
    (epoch-100 loss 0.20 vs 0.54). Reference adapter init: model.py:157-169
    (default torch Linear init, no gating)."""
    ks = jax.random.split(rng, 8)
    return {
        "audio_proj": _dense(ks[0], audio_dim, text_dim),
        "q": _dense(ks[1], text_dim, text_dim),
        "k": _dense(ks[2], text_dim, text_dim),
        "v": _dense(ks[3], text_dim, text_dim),
        "out": {"kernel": jnp.zeros((text_dim, text_dim), jnp.float32),
                "bias": jnp.zeros((text_dim,), jnp.float32)},
        "ln1": {"scale": jnp.ones((text_dim,)), "bias": jnp.zeros((text_dim,))},
        "ln2": {"scale": jnp.ones((text_dim,)), "bias": jnp.zeros((text_dim,))},
        "ffn_in": _dense(ks[5], text_dim, ffn_mult * text_dim),
        "ffn_out": {"kernel": jnp.zeros((ffn_mult * text_dim, text_dim),
                                        jnp.float32),
                    "bias": jnp.zeros((text_dim,), jnp.float32)},
    }


def _ln(p, x, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def _fwd(p, x):
    if "kernel_q" in p or "kernel_q4" in p:  # int8/int4 weight-only serving
        from audax.models.quantize import dequant_dense
        return dequant_dense(p, x)
    return jnp.einsum("...d,df->...f", x, p["kernel"].astype(x.dtype)) \
        + p["bias"].astype(x.dtype)


def adapter_cross_kv(p: Params, audio: jnp.ndarray, heads: int = 8
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adapter cross-attention K/V from encoder states: [B, S, da] ->
    (k, v) each [B, H, S, hd]. A function of the (frozen) audio tower
    only, so decode loops compute it ONCE per clip — recomputing the
    audio_proj + k/v projections per generated token costs O(S*d^2)
    matmuls per step for values that never change."""
    akv = _fwd(p["audio_proj"], audio)                          # [B, S, d]
    b, _, d = akv.shape
    hd = d // heads
    k = _fwd(p["k"], akv).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    v = _fwd(p["v"], akv).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    return k, v


def adapter_apply_kv(p: Params, text: jnp.ndarray, k: jnp.ndarray,
                     v: jnp.ndarray) -> jnp.ndarray:
    """Adapter forward from precomputed cross-K/V (``adapter_cross_kv``):
    text [B, T, d] + k/v [B, H, S, hd] -> fused [B, T, d]."""
    b, t, d = text.shape
    heads = k.shape[1]
    hd = d // heads
    q = _fwd(p["q"], text).reshape(b, t, heads, hd).transpose(0, 2, 1, 3)
    from audax.ops.attention import dot_product_attention
    attn = dot_product_attention(q, k, v, scale=hd ** -0.5)
    attn = _fwd(p["out"], attn.transpose(0, 2, 1, 3).reshape(b, t, d))
    x = _ln(p["ln1"], text + attn)
    from audax.models.whisper import _gelu
    h = _fwd(p["ffn_out"], _gelu(_fwd(p["ffn_in"], x)))
    return _ln(p["ln2"], x + h)


def adapter_apply(p: Params, text: jnp.ndarray, audio: jnp.ndarray,
                  heads: int = 8) -> jnp.ndarray:
    """Fuse text embeds [B, T, d] with audio states [B, S, da]: text-query
    cross-attention + FFN, post-LN residuals (reference :157-188). Position-
    independent in T, so T=1 decode steps reuse it unchanged."""
    k, v = adapter_cross_kv(p, audio.astype(text.dtype), heads)
    return adapter_apply_kv(p, text, k, v)


def build_two_tower(
    cfg: TwoTowerConfig,
    audio_cfg: WhisperConfig,
    lm_cfg: CausalLMConfig,
    vocab_size: int,
    rng: jax.Array,
    *,
    audio_params: Optional[Params] = None,
    lm_params: Optional[Params] = None,
) -> "TwoTowerModel":
    """Assemble the model: (optionally ported) towers + fresh adapter, with
    the LM embedding resized to the extended ABC vocab (the reference's
    resize_token_embeddings contract, model.py:217-224)."""
    from audax.models.causal_lm import init_causal_lm, resize_embeddings
    from audax.models.whisper import init_whisper_params

    k_audio, k_lm, k_adapter, k_resize = jax.random.split(rng, 4)
    if audio_params is None:
        audio_params = init_whisper_params(audio_cfg, k_audio)
    if lm_params is None:
        lm_params = init_causal_lm(lm_cfg, k_lm)
    if vocab_size != lm_cfg.vocab_size:
        lm_params, lm_cfg = resize_embeddings(lm_params, lm_cfg, vocab_size,
                                              k_resize)
    adapter = init_adapter(k_adapter, audio_cfg.d_model, lm_cfg.d_model,
                           heads=cfg.adapter_heads,
                           ffn_mult=cfg.adapter_ffn_mult)
    return TwoTowerModel(audio_params, audio_cfg,
                         {"adapter": adapter, "lm": lm_params}, lm_cfg, cfg)


# ------------------------------------------------------------- model ------
class TwoTowerModel(NamedTuple):
    """Bundle of the three towers. ``audio_params`` (Whisper) is always
    frozen (stop_gradient in the loss); trainability within ``params`` is
    decided by the optimizer masks (train/two_tower.py)."""

    audio_params: Params
    audio_cfg: WhisperConfig
    params: Params                  # {"adapter": ..., "lm": ...}
    lm_cfg: CausalLMConfig
    cfg: TwoTowerConfig

    # -- audio tower ------------------------------------------------------
    def encode_audio(self, mel: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        """Batched mel [B, T, n_mels] -> frozen encoder states."""
        return lax.stop_gradient(
            whisper_encode(self.audio_params, self.audio_cfg, mel, dtype))

    # -- training forward -------------------------------------------------
    def forward(self, params: Params, enc: jnp.ndarray,
                input_ids: jnp.ndarray,
                attention_mask: Optional[jnp.ndarray] = None,
                dtype=jnp.float32, return_router_logits: bool = False):
        """Teacher-forced logits [B, T, V]; audio enters via the adapter
        fusing every text position with audio context (reference :263-288).
        ``return_router_logits`` (MoE decoders) also returns the stacked
        per-layer router logits for the load-balancing aux loss."""
        text = embed_tokens(params["lm"], input_ids, dtype)
        fused = adapter_apply(params["adapter"], text, enc,
                              self.cfg.adapter_heads)
        out = forward_with_embeds(params["lm"], self.lm_cfg, fused,
                                  attention_mask, dtype,
                                  return_router_logits=return_router_logits)
        if return_router_logits:
            hidden, router_logits = out
            return lm_logits(params["lm"], self.lm_cfg, hidden), router_logits
        return lm_logits(params["lm"], self.lm_cfg, out)

    def loss_sum(self, params: Params, enc: jnp.ndarray,
                 input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                 dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(summed shifted CE over non-pad positions, token count) — the
        un-normalized form gradient accumulation needs to reproduce the
        exact full-batch mean across microbatches.

        MoE decoders with ``cfg.moe_aux_coef > 0`` add the Switch
        load-balancing aux loss (HF router_aux_loss_coef semantics),
        folded in as ``coef * aux * count`` so the normalized loss is
        ``CE_mean + coef * aux``; under gradient accumulation the aux
        statistics are per-microbatch (the standard per-forward form)."""
        import optax
        want_aux = (self.lm_cfg.num_experts > 0
                    and self.cfg.moe_aux_coef > 0)
        if want_aux:
            logits, router_logits = self.forward(
                params, enc, input_ids, attention_mask, dtype,
                return_router_logits=True)
        else:
            logits = self.forward(params, enc, input_ids, attention_mask,
                                  dtype)
        shift_logits = logits[:, :-1].astype(jnp.float32)
        shift_labels = input_ids[:, 1:]
        mask = attention_mask[:, 1:].astype(jnp.float32)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            shift_logits, shift_labels)
        total, count = (losses * mask).sum(), mask.sum()
        if want_aux:
            from audax.models.causal_lm import load_balance_loss
            aux = load_balance_loss(router_logits, self.lm_cfg.num_experts,
                                    self.lm_cfg.experts_per_tok,
                                    attention_mask)
            total = total + self.cfg.moe_aux_coef * aux * count
        return total, count

    def loss(self, params: Params, enc: jnp.ndarray, input_ids: jnp.ndarray,
             attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
        """Shifted CE with padding masked (labels = input_ids; HF labels=
        semantics, reference :281-288)."""
        total, count = self.loss_sum(params, enc, input_ids, attention_mask,
                                     dtype)
        return total / jnp.maximum(count, 1.0)

    # -- generation (KV-cached; the reference had none) -------------------
    def generate(self, params: Params, enc: jnp.ndarray, *,
                 start_id: int, end_id: int, max_len: int = 256,
                 temperature: float = 0.7,
                 rng: Optional[jax.Array] = None,
                 allowed_ids=None,
                 prompt_ids=None,
                 dtype=jnp.float32) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample ABC ids [B, max_len]; returns (tokens, lengths).

        ``allowed_ids``: constrain sampling to this id set (+ ``end_id``) —
        the reference ATTEMPTED exactly this ("mask out non-ABC tokens",
        model.py:346-417) but abandoned it non-working; here the mask is a
        [V] bool folded into the logits inside the jitted decode loop.
        ``prompt_ids``: teacher-forced prefix after ``start_id`` (the
        reference's ABC-header prompt, model.py:363-366) — forced
        positions never terminate generation.

        Dispatches to a def-site-jitted impl: eager per-call use (the
        note-F1 eval, inference CLI) would otherwise re-trace the decode
        while_loop every call — fresh closure identity, CLAUDE.md gotcha."""
        rng = rng if rng is not None else jax.random.key(0)
        vocab = self.lm_cfg.vocab_size
        mask = None
        if allowed_ids is not None:
            ids = jnp.asarray(list(allowed_ids) + [end_id], jnp.int32)
            mask = jnp.zeros((vocab,), bool).at[ids].set(True)
        prompt = (jnp.asarray(list(prompt_ids), jnp.int32)
                  if prompt_ids else None)
        return _generate_jit(params, enc, rng, mask, prompt,
                             lm_cfg=self.lm_cfg,
                             heads=self.cfg.adapter_heads,
                             start_id=start_id, end_id=end_id,
                             max_len=max_len, temperature=temperature,
                             dtype=dtype)


@functools.partial(
    jax.jit,
    static_argnames=("lm_cfg", "heads", "start_id", "end_id", "max_len",
                     "temperature", "dtype"))
def _generate_jit(params: Params, enc: jnp.ndarray, rng: jax.Array,
                  allowed_mask: Optional[jnp.ndarray],
                  prompt: Optional[jnp.ndarray], *,
                  lm_cfg: CausalLMConfig, heads: int, start_id: int,
                  end_id: int, max_len: int, temperature: float,
                  dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b = enc.shape[0]
    p_len = 0 if prompt is None else prompt.shape[0]
    cache = init_lm_cache(lm_cfg, b, max_len, dtype)
    tokens = jnp.full((b, max_len), end_id, jnp.int32)
    tokens = tokens.at[:, 0].set(start_id)
    if p_len:
        tokens = tokens.at[:, 1: 1 + p_len].set(
            jnp.broadcast_to(prompt[None], (b, p_len)))

    adapter = params["adapter"]
    lm = params["lm"]
    # cross-K/V depend only on the clip: compute once, not per token
    ck, cv = adapter_cross_kv(adapter, enc.astype(dtype), heads)

    def step_embed(tok):
        text = embed_tokens(lm, tok[:, None], dtype)           # [B, 1, d]
        return adapter_apply_kv(adapter, text, ck, cv)[:, 0]

    class Carry(NamedTuple):
        pos: jnp.ndarray
        tokens: jnp.ndarray
        cache: LMKVCache
        done: jnp.ndarray
        lengths: jnp.ndarray

    def cond(c):
        return jnp.logical_and(c.pos < max_len - 1, ~jnp.all(c.done))

    def body(c):
        emb = step_embed(c.tokens[:, c.pos])
        logits, cache = lm_decode_step(lm, lm_cfg, emb, c.pos, c.cache,
                                       dtype)
        if allowed_mask is not None:
            logits = jnp.where(allowed_mask[None], logits, -jnp.inf)
        key = jax.random.fold_in(rng, c.pos)
        if temperature == 0.0:
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)
        else:
            nxt = jax.random.categorical(key, logits / temperature,
                                         -1).astype(jnp.int32)
        forced = c.pos < p_len            # positions 1..p_len are prompt
        if p_len:
            pi = jnp.clip(c.pos, 0, p_len - 1)
            nxt = jnp.where(forced, prompt[pi], nxt)
        nxt = jnp.where(c.done, end_id, nxt)
        tokens = c.tokens.at[:, c.pos + 1].set(nxt)
        newly = jnp.logical_and(~c.done,
                                jnp.logical_and(nxt == end_id, ~forced))
        done = jnp.logical_or(c.done, newly)
        lengths = jnp.where(newly, c.pos + 2, c.lengths)
        return Carry(c.pos + 1, tokens, cache, done, lengths)

    init = Carry(jnp.int32(0), tokens, cache, jnp.zeros((b,), bool),
                 jnp.full((b,), max_len, jnp.int32))
    final = lax.while_loop(cond, body, init)
    return final.tokens, final.lengths
