"""Decoder-only causal LM (Qwen2/LLaMA family), TPU-first functional JAX.

The reference's two-tower model wraps HF ``Qwen/Qwen3-0.6B-Base`` via
AutoModelForCausalLM (reference: .charles/music2midi/model.py:209-224). This
module owns the architecture in-framework: RMSNorm, rotary position
embeddings, grouped-query attention, SwiGLU MLP, optional q/k norms
(Qwen3-style) and tied output embeddings — stacked layers + ``lax.scan``
(O(1) compile in depth), fixed-shape KV-cache decode, HF weight porting
(``port_causal_lm_from_hf``), and a ``resize_embeddings`` implementing the
extended-vocab contract (model.py:217-224).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

__all__ = ["CausalLMConfig", "init_causal_lm", "lm_forward", "lm_logits",
           "embed_tokens", "forward_with_embeds", "LMKVCache",
           "init_lm_cache", "lm_decode_step", "resize_embeddings",
           "port_causal_lm_from_hf", "load_balance_loss"]


@dataclass(frozen=True)
class CausalLMConfig:
    vocab_size: int = 2048
    d_model: int = 256
    layers: int = 4
    heads: int = 8
    kv_heads: int = 4            # GQA; == heads -> MHA
    #: per-head width; 0 -> d_model // heads. Qwen3 DECOUPLES it
    #: (hidden 1024, 16 heads, head_dim 128 -> q proj is [1024, 2048])
    head_dim: int = 0
    ffn_dim: int = 0             # 0 -> 8/3 * d rounded to 128
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    qkv_bias: bool = False       # Qwen2: True, Qwen3/llama: False
    qk_norm: bool = False        # Qwen3: True
    tie_embeddings: bool = True
    max_seq: int = 2048
    # ---- mixture-of-experts (Qwen3-MoE family: every layer sparse) ----
    num_experts: int = 0         # 0 -> dense SwiGLU MLP
    experts_per_tok: int = 0     # router top-k
    moe_ffn_dim: int = 0         # per-expert FFN width (0 -> ffn)
    norm_topk_prob: bool = True  # renormalize top-k router probs
    #: "ragged": sort tokens by expert + lax.ragged_dot — exact top-k
    #: FLOPs, no capacity tensor, differentiable; the single-device
    #: default. "dense": every expert computes every token, combined by
    #: router weights — E/k× FLOPs but trivially expert-parallel (shard
    #: the expert axis over 'model'; see parallel/sharding.py) and
    #: bandwidth-bound at decode batch sizes where all hot experts'
    #: weights are read anyway.
    moe_impl: str = "ragged"

    def __post_init__(self):
        if self.head_dim == 0:
            object.__setattr__(self, "head_dim", self.d_model // self.heads)
        if self.num_experts and not self.experts_per_tok:
            raise ValueError("MoE config needs experts_per_tok >= 1")

    @property
    def ffn(self) -> int:
        if self.ffn_dim:
            return self.ffn_dim
        return ((int(self.d_model * 8 / 3) + 127) // 128) * 128

    @property
    def moe_ffn(self) -> int:
        return self.moe_ffn_dim or self.ffn


# ---------------------------------------------------------------- init ----
def _dense(rng, d_in, d_out, *, bias=False):
    p = {"kernel": jax.random.normal(rng, (d_in, d_out), jnp.float32)
         / math.sqrt(d_in)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_causal_lm(cfg: CausalLMConfig, rng: jax.Array) -> Params:
    ks = jax.random.split(rng, cfg.layers + 3)
    hd = cfg.head_dim

    def layer(k):
        sub = jax.random.split(k, 7)
        p = {
            "attn_norm": {"scale": jnp.ones((cfg.d_model,))},
            "q": _dense(sub[0], cfg.d_model, cfg.heads * hd, bias=cfg.qkv_bias),
            "k": _dense(sub[1], cfg.d_model, cfg.kv_heads * hd, bias=cfg.qkv_bias),
            "v": _dense(sub[2], cfg.d_model, cfg.kv_heads * hd, bias=cfg.qkv_bias),
            "o": _dense(sub[3], cfg.heads * hd, cfg.d_model),
            "mlp_norm": {"scale": jnp.ones((cfg.d_model,))},
        }
        if cfg.num_experts:
            ek = jax.random.split(sub[4], 4)
            fe = cfg.moe_ffn
            p["router"] = _dense(ek[0], cfg.d_model, cfg.num_experts)
            p["experts"] = {
                "gate": {"kernel": jax.random.normal(
                    ek[1], (cfg.num_experts, cfg.d_model, fe), jnp.float32)
                    / math.sqrt(cfg.d_model)},
                "up": {"kernel": jax.random.normal(
                    ek[2], (cfg.num_experts, cfg.d_model, fe), jnp.float32)
                    / math.sqrt(cfg.d_model)},
                "down": {"kernel": jax.random.normal(
                    ek[3], (cfg.num_experts, fe, cfg.d_model), jnp.float32)
                    / math.sqrt(fe)},
            }
        else:
            p["gate"] = _dense(sub[4], cfg.d_model, cfg.ffn)
            p["up"] = _dense(sub[5], cfg.d_model, cfg.ffn)
            p["down"] = _dense(sub[6], cfg.ffn, cfg.d_model)
        if cfg.qk_norm:
            p["q_norm"] = {"scale": jnp.ones((hd,))}
            p["k_norm"] = {"scale": jnp.ones((hd,))}
        return p

    layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[layer(k) for k in ks[: cfg.layers]])
    params = {
        "embed": jax.random.normal(ks[-3], (cfg.vocab_size, cfg.d_model)) * 0.02,
        "layers": layers,
        "norm": {"scale": jnp.ones((cfg.d_model,))},
    }
    if not cfg.tie_embeddings:
        params["lm_head"] = _dense(ks[-2], cfg.d_model, cfg.vocab_size)
    return params


# ------------------------------------------------------------ primitives --
def rms_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    scale = lax.rsqrt((x32 * x32).mean(-1, keepdims=True) + eps)
    return (x32 * scale * p["scale"]).astype(dtype)


def _dense_fwd(p, x):
    if "kernel_q" in p or "kernel_q4" in p:  # int8/int4 weight-only serving
        from audax.models.quantize import dequant_dense
        return dequant_dense(p, x)
    y = jnp.einsum("...d,df->...f", x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF half-split convention. x: [B, H, T, hd];
    positions: [T] or [B, T]."""
    hd = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
    if positions.ndim == 1:
        ang = positions.astype(jnp.float32)[:, None] * inv[None, :]   # [T, hd/2]
        ang = ang[None, None]
    else:
        ang = positions.astype(jnp.float32)[:, None, :, None] * inv[None, None, None, :]
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                           axis=-1).astype(x.dtype)


def _attn_block(layer, cfg: CausalLMConfig, x, positions, mask,
                kv_cache=None, cache_pos=None, causal=False,
                layer_idx=None):
    """Returns (out, (k_all, v_all)). ``causal`` + optional key-padding
    ``mask`` [B or 1, 1, 1 or Tq, Tk]; the maskless-causal case dispatches
    to the fused GQA flash kernel on TPU (ops/attention.py).

    Decode: ``kv_cache`` is the full LAYER-STACKED (k, v)
    [L, B, kvH, S, hd] with ``layer_idx`` selecting the layer inside the
    fused kernel (scalar prefetch — no per-layer cache slice copies)."""
    b, t, _ = x.shape
    hd = cfg.head_dim
    h = rms_norm(layer["attn_norm"], x, cfg.rms_eps)
    q = _dense_fwd(layer["q"], h).reshape(b, t, cfg.heads, hd).transpose(0, 2, 1, 3)
    k = _dense_fwd(layer["k"], h).reshape(b, t, cfg.kv_heads, hd).transpose(0, 2, 1, 3)
    v = _dense_fwd(layer["v"], h).reshape(b, t, cfg.kv_heads, hd).transpose(0, 2, 1, 3)
    if cfg.qk_norm:
        q = rms_norm(layer["q_norm"], q, cfg.rms_eps)
        k = rms_norm(layer["k_norm"], k, cfg.rms_eps)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    if kv_cache is not None:
        k_cache, v_cache = kv_cache
        if jnp.ndim(cache_pos) == 0:
            k = lax.dynamic_update_slice(k_cache, k[None],
                                         (layer_idx, 0, 0, cache_pos, 0))
            v = lax.dynamic_update_slice(v_cache, v[None],
                                         (layer_idx, 0, 0, cache_pos, 0))
        else:
            # per-slot decode depths (continuous batching): row b's new
            # K/V lands at (layer_idx, b, :, cache_pos[b])
            bidx = jnp.arange(b)
            k = k_cache.at[layer_idx, bidx, :, cache_pos].set(k[:, :, 0])
            v = v_cache.at[layer_idx, bidx, :, cache_pos].set(v[:, :, 0])
        # decode fast path: fused cached-KV kernel with GQA + position mask
        from audax.ops.attention import decode_attention_stacked
        out = decode_attention_stacked(q, (k, v), layer_idx, pos=cache_pos,
                                       scale=hd ** -0.5)
    else:
        from audax.ops.attention import dot_product_attention
        out = dot_product_attention(q, k, v, causal=causal, mask=mask,
                                    scale=hd ** -0.5)
    out = out.transpose(0, 2, 1, 3).reshape(b, t, cfg.heads * hd)
    return _dense_fwd(layer["o"], out), (k, v)


def _mlp_block(layer, cfg, x):
    if "router" in layer:
        return _moe_block(layer, cfg, x)
    h = rms_norm(layer["mlp_norm"], x, cfg.rms_eps)
    return _dense_fwd(layer["down"],
                      jax.nn.silu(_dense_fwd(layer["gate"], h))
                      * _dense_fwd(layer["up"], h))


def _moe_router(layer, cfg: CausalLMConfig, h: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(top-k weights [N, k], expert indices [N, k], raw router logits
    [N, E]) — HF Qwen3MoeSparseMoeBlock semantics (softmax over ALL
    experts in f32, THEN top-k, then optional renorm, cast back to the
    activation dtype); the logits feed ``load_balance_loss``."""
    logits = _dense_fwd(layer["router"], h)               # [N, E]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    w, idx = lax.top_k(probs, cfg.experts_per_tok)        # [N, k]
    if cfg.norm_topk_prob:
        w = w / w.sum(-1, keepdims=True)
    return w.astype(h.dtype), idx, logits


def load_balance_loss(router_logits: jnp.ndarray, num_experts: int,
                      top_k: int,
                      attention_mask: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
    """Switch-Transformer auxiliary load-balancing loss (eqs. 4-6),
    HF ``load_balancing_loss_func`` parity: fraction-of-tokens-routed ×
    mean-router-prob, summed over experts (and top-k slots), × E.

    router_logits [L, N, E] as returned by ``lm_forward(...,
    return_router_logits=True)`` (N = B*T); attention_mask [B, T] masks
    padding tokens out of both statistics."""
    l, n, e = router_logits.shape
    probs = jax.nn.softmax(router_logits.reshape(l * n, e).astype(
        jnp.float32), axis=-1)
    _, sel = lax.top_k(probs, top_k)
    sel_mask = jax.nn.one_hot(sel, e, dtype=jnp.float32)    # [LN, k, E]
    if attention_mask is None:
        tokens_per_expert = sel_mask.mean(0)                # [k, E]
        router_prob = probs.mean(0)                         # [E]
    else:
        am = jnp.tile(attention_mask.reshape(-1).astype(jnp.float32), l)
        denom = am.sum()
        tokens_per_expert = (sel_mask * am[:, None, None]).sum(0) / denom
        router_prob = (probs * am[:, None]).sum(0) / denom
    return (tokens_per_expert * router_prob[None, :]).sum() * num_experts


def _moe_block(layer, cfg: CausalLMConfig, x: jnp.ndarray,
               return_router_logits: bool = False):
    """Sparse-MoE SwiGLU FFN (Qwen3-MoE family; no shared expert).

    TPU-first shape of the two impls (cfg.moe_impl):

    - ``ragged`` (default): flatten the [N, k] selections, stable-sort by
      expert id, run the three expert matmuls as ``lax.ragged_dot`` over
      per-expert group sizes, invert the sort and weighted-sum the k
      slots. Exact top-k FLOPs, no [N, E, C] capacity tensor, no
      scatter (the combine is a gather by the inverse permutation), and
      differentiable — prefill/training-friendly on one device.
    - ``dense``: every expert computes every token; outputs are combined
      with the [N, E] router-weight matrix. E/k× the FLOPs, but the
      expert axis shards declaratively over 'model'
      (parallel/sharding.py CAUSAL_LM_TP_RULES) — the expert-parallel
      path — and at decode batch sizes it is HBM-bound on reading the
      expert weights, which a sparse path at B*k ≳ E mostly reads anyway.

    Both are exact (parity-tested against each other and HF).
    """
    b, t, d = x.shape
    n = b * t
    h = rms_norm(layer["mlp_norm"], x, cfg.rms_eps).reshape(n, d)
    w, idx, router_logits = _moe_router(layer, cfg, h)
    ex = layer["experts"]

    # decode fast path for QUANTIZED experts: lax.ragged_dot cannot fuse an
    # int8->activation cast (it's a custom TPU op), so the `.astype` below
    # would materialize an all-expert dequantized copy EVERY step — measured
    # 23x slower than bf16 at B=1 (tools/moe_decode_probe4.py). When the
    # selected slots don't exceed the expert count (n*k <= E, i.e. decode
    # batch sizes), scan the slots and dynamic_slice + dequantize one
    # expert at a time: traffic is exactly the selected experts' int8
    # bytes — the fastest decode variant measured (0.118 ms vs 0.132
    # bf16-ragged at n=1, E=128, k=8, d=2048, fe=768 on v5e).
    if (("kernel_q" in ex["gate"] or "kernel_q4" in ex["gate"])
            and cfg.moe_impl == "ragged"
            and n * cfg.experts_per_tok <= cfg.num_experts):
        y = _moe_selected_scan(ex, cfg, h, idx, w)
        out = y.reshape(b, t, d)
        return (out, router_logits) if return_router_logits else out

    def ek(name):
        """Expert weights [E, K, N] in the activation dtype + optional
        int8 per-(expert, out-channel) scale [E, N]. The int8 cast fuses
        into the dense branch's einsums (like _dense_fwd's int8 path); in
        the ragged branch it materializes once — fine at prefill/training
        sizes where all experts' weights are read regardless. int4
        experts dequantize whole here too (prefill); their decode path is
        the selected scan above."""
        p = ex[name]
        if "kernel_q4" in p:
            from audax.ops.int4_matmul import dequantize_int4
            q4, s4 = p["kernel_q4"], p["kernel_scale4"]
            if q4.ndim == 4:          # whole-stack decode view ([L, E, ...])
                li = p["_layer_idx"]
                q4 = lax.dynamic_index_in_dim(q4, li, 0, keepdims=False)
                s4 = lax.dynamic_index_in_dim(s4, li, 0, keepdims=False)
            return dequantize_int4(q4, s4, h.dtype), None
        if "kernel_q" in p:
            return p["kernel_q"].astype(h.dtype), p["kernel_scale"]
        return p["kernel"].astype(h.dtype), None

    gk, gsc = ek("gate")                                  # [E, d, fe]
    uk, usc = ek("up")
    dk, dsc = ek("down")                                  # [E, fe, d]
    if cfg.moe_impl == "dense":
        comb = jnp.zeros((n, cfg.num_experts), w.dtype)
        comb = comb.at[jnp.arange(n)[:, None], idx].add(w)  # [N, E]

        def scale(t, s):                                  # t [E, N?, out]
            return t if s is None else t * s[:, None, :].astype(t.dtype)

        g = scale(jnp.einsum("nd,edf->enf", h, gk), gsc)
        u = scale(jnp.einsum("nd,edf->enf", h, uk), usc)
        o = scale(jnp.einsum("enf,efd->end", jax.nn.silu(g) * u, dk), dsc)
        y = jnp.einsum("end,ne->nd", o, comb)
    elif cfg.moe_impl == "ragged":
        k = cfg.experts_per_tok
        fidx = idx.reshape(-1)                            # [N*k]
        order = jnp.argsort(fidx)                         # stable
        tok = order // k
        xr = h[tok]                                       # [N*k, d]
        gs = jnp.bincount(fidx, length=cfg.num_experts)
        row_e = fidx[order]                               # row -> expert

        def scale(t, s):                                  # t [N*k, out]
            return t if s is None else t * s[row_e].astype(t.dtype)

        g = scale(lax.ragged_dot(xr, gk, gs), gsc)
        u = scale(lax.ragged_dot(xr, uk, gs), usc)
        o = scale(lax.ragged_dot(jax.nn.silu(g) * u, dk, gs), dsc)
        o = o[jnp.argsort(order)].reshape(n, k, d)        # back to slot order
        y = jnp.einsum("nkd,nk->nd", o, w)
    else:
        raise ValueError(f"unknown moe_impl {cfg.moe_impl!r}")
    out = y.reshape(b, t, d)
    return (out, router_logits) if return_router_logits else out


def _moe_selected_scan(ex, cfg: CausalLMConfig, h: jnp.ndarray,
                       idx: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Selected-experts MoE FFN: scan the n*k (token, expert) slots,
    ``dynamic_slice`` ONE expert's tensors from HBM per step, dequantize
    in-register, matmul, and accumulate router-weighted outputs.

    Exists for the int8-expert decode path (see _moe_block); works for
    float experts too but ragged_dot is slightly faster there. HBM
    traffic = the selected experts' stored bytes, nothing else.
    """
    n, d = h.shape
    k = cfg.experts_per_tok
    fe = cfg.moe_ffn
    fidx = idx.reshape(-1)                                # [n*k]
    tok = jnp.arange(n * k) // k
    ww = w.reshape(-1)

    def mat(name, e, x, kd, nd):
        p = ex[name]
        if "kernel_q4" in p:
            # nibble-packed experts: the pallas kernel's stacked-axis
            # scalar prefetch selects the expert (and layer, through a
            # flat [L*E, K/2, N] view at decode) in its index maps — HBM
            # traffic is the selected expert's PACKED bytes
            from audax.ops.int4_matmul import int4_matmul
            pk, sc = p["kernel_q4"], p["kernel_scale4"]
            sel = e
            if pk.ndim == 4:           # [L, E, K/2, N] whole-stack view
                sel = p["_layer_idx"] * pk.shape[1] + e
                pk = pk.reshape((-1,) + pk.shape[2:])
                sc = sc.reshape((-1,) + sc.shape[2:])
            return int4_matmul(x[None], pk, sc, layer=sel)[0]
        if "kernel_q" in p:
            m = lax.dynamic_slice(p["kernel_q"], (e, 0, 0), (1, kd, nd))[0]
            s = lax.dynamic_slice(p["kernel_scale"], (e, 0), (1, nd))[0]
            return (x @ m.astype(x.dtype)) * s.astype(x.dtype)
        m = lax.dynamic_slice(p["kernel"], (e, 0, 0), (1, kd, nd))[0]
        return x @ m.astype(x.dtype)

    def body(acc, sl):
        e, t, wi = sl
        x = h[t]
        g = jax.nn.silu(mat("gate", e, x, d, fe)) * mat("up", e, x, d, fe)
        acc = acc.at[t].add(mat("down", e, g, fe, d) * wi.astype(acc.dtype))
        return acc, None

    acc, _ = lax.scan(body, jnp.zeros((n, d), h.dtype), (fidx, tok, ww))
    return acc


# ------------------------------------------------------------- forward ----
def embed_tokens(params: Params, tokens: jnp.ndarray,
                 dtype=jnp.float32) -> jnp.ndarray:
    from audax.models.quantize import embed_lookup
    return embed_lookup(params, tokens, dtype)


def forward_with_embeds(params: Params, cfg: CausalLMConfig,
                        embeds: jnp.ndarray,
                        attention_mask: Optional[jnp.ndarray] = None,
                        dtype=jnp.float32,
                        return_router_logits: bool = False,
                        remat=False):
    """Hidden-states forward from input embeddings (the two-tower fusion
    entry point; reference feeds fused embeds at model.py:281-288).

    attention_mask: [B, T] 1=real — padding is masked from keys.
    Returns final hidden states [B, T, d] (pre-logits); with
    ``return_router_logits`` (MoE training) also the per-layer router
    logits [L, B*T, E] for ``load_balance_loss``."""
    b, t, _ = embeds.shape
    x = embeds.astype(dtype)
    positions = jnp.arange(t)
    # key-padding mask only; the causal part is a flag so the maskless
    # case rides the flash kernel (the XLA twin folds causal AND mask)
    mask = (attention_mask[:, None, None, :].astype(bool)
            if attention_mask is not None else None)
    if return_router_logits and cfg.num_experts == 0:
        raise ValueError("return_router_logits requires an MoE config "
                         "(num_experts > 0)")
    with_router = return_router_logits and cfg.num_experts > 0

    def body(x, layer):
        attn, _ = _attn_block(layer, cfg, x, positions, mask, causal=True)
        x = x + attn
        if with_router:
            y, rl = _moe_block(layer, cfg, x, return_router_logits=True)
            return x + y, rl
        x = x + _mlp_block(layer, cfg, x)
        return x, None

    # per-LAYER checkpointing (training): see whisper._remat_body — an
    # outer whole-forward jax.checkpoint does not reduce peak memory
    from audax.models.whisper import _remat_body
    x, router_logits = lax.scan(_remat_body(body, remat), x,
                                params["layers"])
    hidden = rms_norm(params["norm"], x, cfg.rms_eps)
    return (hidden, router_logits) if with_router else hidden


def lm_logits(params: Params, cfg: CausalLMConfig, hidden: jnp.ndarray
              ) -> jnp.ndarray:
    if cfg.tie_embeddings or not any(k.startswith("lm_head")
                                     for k in params):
        from audax.models.quantize import embed_logits
        return embed_logits(params, hidden)
    return _dense_fwd(params["lm_head"], hidden)


def lm_forward(params: Params, cfg: CausalLMConfig, tokens: jnp.ndarray,
               attention_mask: Optional[jnp.ndarray] = None,
               dtype=jnp.float32, return_router_logits: bool = False,
               remat=False):
    """tokens [B, T] -> logits [B, T, V]. For MoE configs,
    ``return_router_logits=True`` additionally returns the stacked
    per-layer router logits [L, B*T, E] (feed to ``load_balance_loss``
    with the same attention_mask for the training aux loss).
    ``remat`` checkpoints per scanned layer (training path)."""
    out = forward_with_embeds(params, cfg, embed_tokens(params, tokens, dtype),
                              attention_mask, dtype,
                              return_router_logits=return_router_logits,
                              remat=remat)
    if return_router_logits and cfg.num_experts > 0:
        hidden, router_logits = out
        return lm_logits(params, cfg, hidden), router_logits
    return lm_logits(params, cfg, out)


# ---------------------------------------------------------------- decode --
class LMKVCache(NamedTuple):
    k: jnp.ndarray               # [L, B, kvH, max_len, hd]
    v: jnp.ndarray


def init_lm_cache(cfg: CausalLMConfig, batch: int, max_len: int,
                  dtype=jnp.float32) -> LMKVCache:
    shape = (cfg.layers, batch, cfg.kv_heads, max_len, cfg.head_dim)
    return LMKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def lm_decode_step(params: Params, cfg: CausalLMConfig,
                   embed: jnp.ndarray,          # [B, d] current-token embed
                   pos: jnp.ndarray,            # scalar int32, or [B] int32
                   cache: LMKVCache,
                   dtype=jnp.float32) -> Tuple[jnp.ndarray, LMKVCache]:
    """One autoregressive step from an input *embedding* (so the two-tower
    prefix fusion reuses it). Returns (logits [B, V], cache).

    ``pos`` may be a per-slot [B] vector: each row writes its K/V at its
    own cache depth and attends keys ``<= pos[b]`` — the ragged-batch
    primitive continuous batching needs (infer/continuous.py), mirroring
    whisper's decode_step_ragged."""
    x = embed.astype(dtype)[:, None, :]
    positions = pos[None] if pos.ndim == 0 else pos[:, None]

    # stacked caches ride the scan CARRY; the kernel layer-indexes them
    # via scalar prefetch (no per-layer slice materialisation). Int4
    # weights get the same treatment via stacked_layer_view: the packed
    # [L, K/2, N] tensors pass through whole and the int4 kernel selects
    # the layer in its index maps (models/quantize.py).
    def step(x, kc, vc, li, layer):
        # mask=None: the decode path masks via ``pos`` inside the fused
        # cached-KV kernel (decode_attention_stacked), not via this arg
        attn, (kc, vc) = _attn_block(
            layer, cfg, x, positions, None,
            kv_cache=(kc, vc), cache_pos=pos, layer_idx=li)
        x = x + attn
        x = x + _mlp_block(layer, cfg, x)
        return x, kc, vc

    if "kernel_q4" in params["layers"]["q"]:
        from audax.models.quantize import stacked_layer_view

        def body(carry, li):
            x, kc, vc = carry
            x, kc, vc = step(x, kc, vc, li,
                             stacked_layer_view(params["layers"], li))
            return (x, kc, vc), None

        (x, new_k, new_v), _ = lax.scan(body, (x, cache.k, cache.v),
                                        jnp.arange(cfg.layers))
    else:
        def body(carry, scanned):
            x, kc, vc = carry
            layer, li = scanned
            x, kc, vc = step(x, kc, vc, li, layer)
            return (x, kc, vc), None

        (x, new_k, new_v), _ = lax.scan(
            body, (x, cache.k, cache.v),
            (params["layers"], jnp.arange(cfg.layers)))
    hidden = rms_norm(params["norm"], x, cfg.rms_eps)
    logits = lm_logits(params, cfg, hidden)[:, 0]
    return logits, LMKVCache(new_k, new_v)


# ----------------------------------------------------------------- vocab --
def resize_embeddings(params: Params, cfg: CausalLMConfig, new_vocab: int,
                      rng: jax.Array) -> Tuple[Params, CausalLMConfig]:
    """Extend (or shrink) the token embedding to ``new_vocab`` rows; new rows
    init from the mean of existing rows plus small noise (HF
    resize_token_embeddings semantics; the reference's matched-pair contract,
    music2midi/README.md:16-26)."""
    import dataclasses
    embed = params["embed"]
    old_vocab = embed.shape[0]
    if new_vocab <= old_vocab:
        new_embed = embed[:new_vocab]
    else:
        mean = embed.mean(axis=0, keepdims=True)
        extra = mean + 0.02 * jax.random.normal(
            rng, (new_vocab - old_vocab, embed.shape[1]), embed.dtype)
        new_embed = jnp.concatenate([embed, extra], axis=0)
    out = dict(params)
    out["embed"] = new_embed
    if "lm_head" in params:
        head = params["lm_head"]["kernel"]
        if new_vocab <= old_vocab:
            new_head = head[:, :new_vocab]
        else:
            mean = head.mean(axis=1, keepdims=True)
            extra = mean + 0.02 * jax.random.normal(
                rng, (head.shape[0], new_vocab - old_vocab), head.dtype)
            new_head = jnp.concatenate([head, extra], axis=1)
        out["lm_head"] = {**params["lm_head"], "kernel": new_head}
        if "bias" in params["lm_head"]:
            bias = params["lm_head"]["bias"]
            nb = jnp.zeros((new_vocab,), bias.dtype).at[: min(old_vocab, new_vocab)
                                                        ].set(bias[:new_vocab])
            out["lm_head"]["bias"] = nb
    return out, dataclasses.replace(cfg, vocab_size=new_vocab)


# ------------------------------------------------------------------ port --
def port_causal_lm_from_hf(hf_model) -> Tuple[Params, CausalLMConfig]:
    """Port a HF Qwen2/Qwen3/Qwen3-MoE/LLaMA-style ForCausalLM (in-memory,
    no network). MoE support covers the homogeneous every-layer-sparse
    layout the released Qwen3-MoE checkpoints use (layers are scan-stacked,
    so mixed dense/sparse stacks are rejected)."""
    hc = hf_model.config
    sd = {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}
    # note: a tied lm_head still appears in state_dict — trust the config flag
    tie = bool(getattr(hc, "tie_word_embeddings", "lm_head.weight" not in sd))
    moe = any(k.endswith("mlp.experts.0.gate_proj.weight") for k in sd)
    if moe:
        if (list(getattr(hc, "mlp_only_layers", []) or [])
                or int(getattr(hc, "decoder_sparse_step", 1)) != 1):
            raise NotImplementedError(
                "mixed dense/sparse layer stacks are not supported "
                "(scan-stacked homogeneous layers only)")
    cfg = CausalLMConfig(
        vocab_size=hc.vocab_size, d_model=hc.hidden_size,
        layers=hc.num_hidden_layers, heads=hc.num_attention_heads,
        kv_heads=getattr(hc, "num_key_value_heads", hc.num_attention_heads),
        # Qwen3 decouples head_dim from hidden_size//heads (0.6B: hidden
        # 1024, 16 heads, head_dim 128) — deriving it breaks every q/k/v
        # reshape for real checkpoints
        head_dim=int(getattr(hc, "head_dim", 0) or 0),
        ffn_dim=hc.intermediate_size,
        rope_theta=float(getattr(hc, "rope_theta", 1e6)),
        rms_eps=float(getattr(hc, "rms_norm_eps", 1e-6)),
        qkv_bias=any(k.endswith("self_attn.q_proj.bias") for k in sd),
        qk_norm=any(k.endswith("self_attn.q_norm.weight") for k in sd),
        tie_embeddings=tie,
        max_seq=getattr(hc, "max_position_embeddings", 2048),
        num_experts=int(getattr(hc, "num_experts", 0)) if moe else 0,
        experts_per_tok=(int(getattr(hc, "num_experts_per_tok", 0))
                         if moe else 0),
        moe_ffn_dim=int(getattr(hc, "moe_intermediate_size", 0)) if moe else 0,
        norm_topk_prob=bool(getattr(hc, "norm_topk_prob", True)),
    )

    def lin(prefix, bias=None):
        p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    layers = []
    for i in range(cfg.layers):
        pr = f"model.layers.{i}"
        layer = {
            "attn_norm": {"scale": jnp.asarray(sd[f"{pr}.input_layernorm.weight"])},
            "q": lin(f"{pr}.self_attn.q_proj"),
            "k": lin(f"{pr}.self_attn.k_proj"),
            "v": lin(f"{pr}.self_attn.v_proj"),
            "o": lin(f"{pr}.self_attn.o_proj"),
            "mlp_norm": {"scale": jnp.asarray(sd[f"{pr}.post_attention_layernorm.weight"])},
        }
        if moe:
            ne = cfg.num_experts
            layer["router"] = {"kernel": jnp.asarray(sd[f"{pr}.mlp.gate.weight"].T)}
            layer["experts"] = {
                name: {"kernel": jnp.stack([
                    jnp.asarray(sd[f"{pr}.mlp.experts.{e}.{proj}.weight"].T)
                    for e in range(ne)])}
                for name, proj in (("gate", "gate_proj"), ("up", "up_proj"),
                                   ("down", "down_proj"))
            }
        else:
            layer["gate"] = lin(f"{pr}.mlp.gate_proj")
            layer["up"] = lin(f"{pr}.mlp.up_proj")
            layer["down"] = lin(f"{pr}.mlp.down_proj")
        if cfg.qk_norm:
            layer["q_norm"] = {"scale": jnp.asarray(sd[f"{pr}.self_attn.q_norm.weight"])}
            layer["k_norm"] = {"scale": jnp.asarray(sd[f"{pr}.self_attn.k_norm.weight"])}
        layers.append(layer)
    params: Params = {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"]),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": {"scale": jnp.asarray(sd["model.norm.weight"])},
    }
    if not tie:
        params["lm_head"] = {"kernel": jnp.asarray(sd["lm_head.weight"].T)}
    return params, cfg
