"""Int8/int4 weight-only quantization for serving.

TPU decode is HBM-bandwidth bound: every generated token re-reads the full
weight set, so halving (vs bf16) or quartering (vs f32) the bytes per weight
directly raises tokens/s and lets larger checkpoints fit one chip. This
module quantizes matmul weights to symmetric per-output-channel int8 at
load time; matmuls still run in the activation dtype (weight-only — the
int8 tensor is cast back per-tile inside the fused XLA matmul, so the MXU
sees bf16/f32 operands and accuracy loss stays ~0.4% per channel).

``bits=4`` selects the nibble-packed group-wise tier (2 weights/byte,
one scale per 128 contraction rows per output channel) whose hot-path
matmul is the pallas kernel in ops/int4_matmul.py — ``jnp.int4`` is not
bit-packed on this runtime, so packing is manual there.

This is a new serving capability with no reference equivalent (the
reference serves f32 torch checkpoints, .charles/music2midi/inference.py);
it exists because the rebuild targets production TPU serving.

Contract: a quantized tree is a drop-in replacement for the float tree —
``dense``-style primitives in models/whisper.py, models/causal_lm.py and
models/two_tower.py dispatch on the presence of ``kernel_q``/``embed_q``
leaves. Tensor-parallel rules apply unchanged (`kernel_q` matches the same
path rules as `kernel`; the tiny per-channel scales stay replicated).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

__all__ = ["quantize_matrix", "quantize_tree", "dequant_dense",
           "embed_lookup", "embed_logits", "tree_bytes"]

#: dicts under these keys stay float: the two encoder convs ([W, I, O])
#: run once per utterance, and the MoE router's output feeds a DISCRETE
#: top-k — quantization error there flips expert selection (whole-expert
#: output differences), not a ~0.4% matmul perturbation. Router weights
#: are O(d*E), negligible next to the experts.
_SKIP_KEYS = {"conv1", "conv2", "router"}


def quantize_matrix(k: jnp.ndarray, axis: int = -2
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric int8 with one scale per output channel: ``axis`` is the
    contraction axis that gets reduced away in the matmul."""
    k = jnp.asarray(k)
    s = jnp.max(jnp.abs(k), axis=axis) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(jnp.round(k / jnp.expand_dims(s, axis)),
                 -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def _quantize_dense(p: Params, bits: int, group: int) -> Params:
    # kernel [..., d_in, d_out] (leading layer axis when scan-stacked)
    if bits == 4:
        from audax.ops.int4_matmul import quantize_int4
        q, s = quantize_int4(p["kernel"], group=group)
        out = {"kernel_q4": q, "kernel_scale4": s}
    else:
        q, s = quantize_matrix(p["kernel"], axis=-2)
        out = {"kernel_q": q, "kernel_scale": s}
    for k, v in p.items():
        if k != "kernel":
            out[k] = v
    return out


def quantize_tree(params: Params, *, embed_keys=("embed",), bits: int = 8,
                  group: int = 128) -> Params:
    """Walk a model pytree, replacing every dense ``{kernel[, bias]}`` with
    ``{kernel_q, kernel_scale[, bias]}`` and every ``embed`` matrix (token
    embedding, [V, d], also used transposed as the logit projection) with
    ``embed_q``/``embed_scale`` (one scale per vocab row). Everything else
    (LayerNorm/RMSNorm, positions, convs, biases) stays float.

    ``bits=4``: nibble-packed group-wise int4 instead (``kernel_q4`` /
    ``kernel_scale4`` / ``embed_q4`` / ``embed_scale4``; ops/int4_matmul.py
    layouts — embed is stored [d//2, V] + [G, V], i.e. already in the
    kernel's contraction-major orientation for the tied logit
    projection)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def rec(node, name):
        if isinstance(node, dict):
            # MoE expert kernels ([L, E, d, f], 4D — in MoE models the
            # experts ARE the parameter memory) quantize too. int8: one
            # scale per (expert, output channel); the expert einsums in
            # models/causal_lm.py fuse the cast like _dense_fwd, and the
            # decode path dequantizes per SELECTED expert
            # (_moe_selected_scan — lax.ragged_dot cannot fuse the cast).
            # int4 (the capacity tier — a 30B-A3B-class MoE fits one v5e
            # at 4 bits): nibble-packed per expert; the pallas kernel's
            # stacked-axis scalar prefetch selects the (layer, expert)
            # pair through a flat [L*E, K/2, N] view at decode.
            if "kernel" in node and name not in _SKIP_KEYS:
                nd = getattr(node["kernel"], "ndim", 0)
                if 2 <= nd <= 3:
                    return _quantize_dense(node, bits, group)
                if nd == 4:
                    if bits == 4:
                        from audax.ops.int4_matmul import quantize_int4
                        q, s = quantize_int4(node["kernel"], group=group)
                        return {"kernel_q4": q, "kernel_scale4": s,
                                **{k: v for k, v in node.items()
                                   if k != "kernel"}}
                    q, s = quantize_matrix(node["kernel"], axis=-2)
                    return {"kernel_q": q, "kernel_scale": s,
                            **{k: v for k, v in node.items()
                               if k != "kernel"}}
            out = {}
            for k, v in node.items():
                if k in embed_keys and getattr(v, "ndim", 0) == 2:
                    if bits == 4:
                        from audax.ops.int4_matmul import quantize_int4
                        # embed [V, d]: contract d for logits -> pass as
                        # [K=d, N=V] by transposing, landing packed [V, d/2]
                        q, s = quantize_int4(v.T, group=group)
                        out[k + "_q4"] = q
                        out[k + "_scale4"] = s
                    else:
                        q, s = quantize_matrix(v, axis=-1)
                        out[k + "_q"] = q
                        out[k + "_scale"] = s
                else:
                    out[k] = rec(v, k)
            return out
        return node

    return rec(params, "")


def stacked_layer_view(layers: Params, li) -> Params:
    """Per-layer view of scan-stacked decoder params for int4 decode
    bodies: int4 dense dicts pass through WHOLE, tagged with
    ``_layer_idx`` so ``dequant_dense`` selects the layer inside the
    pallas kernel's index maps (scalar prefetch, ops/int4_matmul.py) —
    the hot loop never materialises a per-layer copy of the packed
    weights. Small float leaves (norm scales/biases) are dynamically
    indexed, which copies only O(d) bytes."""

    def rec(node):
        if isinstance(node, dict):
            if "kernel_q4" in node:
                return {**node, "_layer_idx": li}
            return {k: rec(v) for k, v in node.items()}
        return node[li]

    return rec(layers)


# ------------------------------------------------------- dequant compute --
def dequant_dense(p: Params, x: jnp.ndarray, layer=None) -> jnp.ndarray:
    """x @ dequant(kernel_q*) + bias in the activation dtype.

    int8: (x @ q) * scale — the cast fuses into the XLA matmul read.
    int4: ops/int4_matmul.py pallas kernel (nibble unpack in VMEM);
    ``layer`` selects a scan-stacked weight in-kernel (scalar prefetch),
    so the decode loop never materialises a per-layer weight slice."""
    if "kernel_q4" in p:
        from audax.ops.int4_matmul import int4_matmul
        if layer is None:
            layer = p.get("_layer_idx")
        y = int4_matmul(x, p["kernel_q4"], p["kernel_scale4"], layer=layer)
    else:
        y = jnp.einsum("...d,df->...f", x, p["kernel_q"].astype(x.dtype))
        y = y * p["kernel_scale"].astype(x.dtype)
    if "bias" in p:
        b = p["bias"]
        if layer is not None and b.ndim > 1:
            b = jax.lax.dynamic_index_in_dim(b, layer, 0, keepdims=False)
        y = y + b.astype(x.dtype)
    return y


def embed_lookup(p: Params, idx: jnp.ndarray, dtype,
                 key: str = "embed") -> jnp.ndarray:
    """Token-embedding gather, float or quantized."""
    if key + "_q4" in p:
        pi = p[key + "_q4"][:, idx].astype(jnp.int32)   # [d//2, ...]
        q = jnp.concatenate([(pi & 0xF) - 8, (pi >> 4) - 8],
                            axis=0).astype(dtype)        # [d, ...]
        s = p[key + "_scale4"][:, idx]                   # [G, ...]
        g = q.shape[0] // s.shape[0]
        emb = q * jnp.repeat(s, g, axis=0).astype(dtype)
        return jnp.moveaxis(emb, 0, -1)                  # [..., d]
    if key + "_q" in p:
        rows = p[key + "_q"][idx].astype(dtype)
        return rows * p[key + "_scale"][idx][..., None].astype(dtype)
    return p[key][idx].astype(dtype)


def embed_logits(p: Params, x: jnp.ndarray, key: str = "embed"
                 ) -> jnp.ndarray:
    """Tied-embedding logit projection x [..., d] -> [..., V], float or
    quantized (per-row scale multiplies the output column)."""
    if key + "_q4" in p:
        from audax.ops.int4_matmul import int4_matmul
        return int4_matmul(x, p[key + "_q4"], p[key + "_scale4"])
    if key + "_q" in p:
        y = jnp.einsum("...d,vd->...v", x, p[key + "_q"].astype(x.dtype))
        return y * p[key + "_scale"].astype(x.dtype)
    return jnp.einsum("...d,vd->...v", x, p[key].astype(x.dtype))


def tree_bytes(params: Params) -> int:
    """Total parameter bytes (for before/after memory reports). Reads
    ``.nbytes`` from array metadata — ``np.asarray`` would pull the whole
    checkpoint over the ~35 MB/s tunnel just to count bytes."""
    import jax
    return sum(int(x.nbytes) for x in jax.tree.leaves(params))
