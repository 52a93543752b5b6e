"""LoRA adapters for functional param-tree models.

The BASELINE north star calls for LoRA fine-tuning of Whisper-class models
running pjit data-parallel. Because audax models are pure functions of a
param pytree, LoRA is a tree transformation, not a module rewrite:

    lora = init_lora(params, rank, targets=("attn/q", "attn/v"), rng=...)
    def loss(lora):
        p = apply_lora(stop_gradient(params), lora, alpha)
        ...  # grads flow only through the adapters

``apply_lora`` adds B @ A into each targeted kernel before the forward pass —
O(d*d*r) per kernel, negligible next to the seq x d^2 matmuls it rides with,
and it keeps the model code completely LoRA-unaware. ``merge_lora`` bakes
adapters in permanently for serving (adapter merge per BASELINE.json).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

__all__ = ["init_lora", "apply_lora", "merge_lora", "lora_param_count",
           "match_path"]


def _iter_kernels(params: Params):
    """Yield (path_str, leaf) for every 2-D kernel in the tree."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        keys = []
        for p in path:
            if hasattr(p, "key"):
                keys.append(str(p.key))
            elif hasattr(p, "idx"):
                keys.append(str(p.idx))
        yield "/".join(keys), leaf


def match_path(path: str, targets: Sequence[str]) -> bool:
    """Segment-aligned containment: target 'attn/q' matches
    'decoder/layers/attn/q/kernel' but NOT 'cross_attn/q/kernel' — raw
    substring matching made it impossible to adapt self-attention without
    silently adapting cross-attention too. Target 'cross_attn/q' selects
    the cross path explicitly."""
    hay = f"/{path}/"
    return any(f"/{t.strip('/')}/" in hay for t in targets)


def init_lora(params: Params, rank: int, *, targets: Sequence[str],
              rng: jax.Array) -> Params:
    """A ~ N(0, 1/rank) [r, d_in]; B = 0 [d_out, r] — standard LoRA init so
    the adapted model starts exactly at the base model."""
    flat = {}
    for path, leaf in _iter_kernels(params):
        if leaf.ndim >= 2 and path.endswith("kernel") and match_path(path, targets):
            *lead, d_in, d_out = leaf.shape
            rng, k = jax.random.split(rng)
            flat[path] = {
                "a": jax.random.normal(k, (*lead, rank, d_in), jnp.float32)
                / math.sqrt(rank),
                "b": jnp.zeros((*lead, d_out, rank), jnp.float32),
            }
    return flat


def apply_lora(params: Params, lora: Params, alpha: float = 16.0) -> Params:
    """Return params with ``kernel += (B @ A).T * (alpha / rank)`` per target.

    Stacked-layer kernels ([L, d_in, d_out]) get per-layer adapters via the
    leading batch dims of a/b.
    """
    if not lora:
        return params
    updates = {}
    for path, ab in lora.items():
        rank = ab["a"].shape[-2]
        delta = jnp.einsum("...or,...ri->...io", ab["b"], ab["a"]) * (alpha / rank)
        updates[path] = delta

    # rebuild with updates applied at matching paths
    def apply_at(tree, path_parts, delta):
        key = path_parts[0]
        if len(path_parts) == 1:
            return {**tree, key: tree[key] + delta.astype(tree[key].dtype)}
        return {**tree, key: apply_at(tree[key], path_parts[1:], delta)}

    out = params
    for path, delta in updates.items():
        out = apply_at(out, path.split("/"), delta)
    return out


def merge_lora(params: Params, lora: Params, alpha: float = 16.0) -> Params:
    """Permanently fold adapters into the base weights (serving path)."""
    return apply_lora(params, lora, alpha)


def lora_param_count(lora: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(lora))
