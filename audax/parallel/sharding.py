"""Parameter sharding rules: path-pattern -> PartitionSpec.

The reference has no model parallelism (SURVEY.md §2.3); here tensor
parallelism is declarative. Rules map parameter paths to PartitionSpecs over
the (data, model) mesh; XLA inserts the all-gathers/reduce-scatters over ICI.
Whisper rules follow the Megatron pattern: attention/MLP input projections
split the *output* feature dim across `model` (head-parallel), output
projections split the *input* dim, so each block needs exactly one
all-reduce on its residual add.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["WHISPER_TP_RULES", "CAUSAL_LM_TP_RULES", "spec_for_path",
           "shard_params", "param_specs", "constrain_kv"]


def constrain_kv(mesh: Mesh, heads: int, batch: int, tree,
                 put: bool = False):
    """Shard decode-state tensors [L, B, H, ...] over the mesh: heads on
    'model' (matching the Megatron column/row split of the attention
    projections below), batch on 'data' — each only when divisible. The
    ONE definition of the decode-state sharding policy, shared by
    fixed-batch decode (infer/decode.py:tp_shard_kv) and continuous
    serving (infer/continuous.py). ``put=True`` places eagerly (engine
    init); otherwise emits in-jit sharding constraints."""
    model_ok = heads % mesh.shape.get("model", 1) == 0
    data_ok = batch % mesh.shape.get("data", 1) == 0
    axes = ("data" if data_ok else None, "model" if model_ok else None)

    def one(x):
        ns = NamedSharding(mesh, P(None, *axes, *([None] * (x.ndim - 3))))
        return (jax.device_put(x, ns) if put
                else jax.lax.with_sharding_constraint(x, ns))

    return jax.tree.map(one, tree)

# (path regex, spec). First match wins. Stacked-layer params carry a leading
# layer axis -> specs start with None for it.
WHISPER_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # int4 leaves ([L, K/2, N] packed + [L, G, N] scales) feed an opaque
    # pallas call that GSPMD cannot partition — keep them replicated
    # (first match wins; int4 is the single-chip capacity tier). int8
    # kernel_q shares the float kernel's layout and einsum path and
    # inherits its TP rules by suffix match.
    (r"_q4$|_scale4$", P()),
    # attention / mlp column-parallel (split output features)
    (r"layers/(attn|cross_attn)/(q|k|v)/kernel", P(None, None, "model")),
    (r"layers/(attn|cross_attn)/(q|k|v)/bias", P(None, "model")),
    (r"layers/mlp_in/kernel", P(None, None, "model")),
    (r"layers/mlp_in/bias", P(None, "model")),
    # row-parallel (split input features; output all-reduced)
    (r"layers/(attn|cross_attn)/out/kernel", P(None, "model", None)),
    (r"layers/mlp_out/kernel", P(None, "model", None)),
    # token embedding: shard vocab rows (memory win, gather on lookup)
    (r"decoder/embed$", P("model", None)),
    # everything else replicated
)

# Megatron split for the Qwen/LLaMA-family causal LM (models/causal_lm.py):
# q/k/v and SwiGLU gate/up are column-parallel, o/down row-parallel —
# one all-reduce per block. GQA note: k/v shard over kv_heads; shard_params
# falls back to replication when kv_heads doesn't divide the model axis.
CAUSAL_LM_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"_q4$|_scale4$", P()),             # transposed int4 layout: replicate
    # expert parallelism: shard the expert axis of stacked MoE weights
    # ([L, E, d, f]) over 'model'; with moe_impl="dense" the expert
    # einsums compute each device's expert slice locally and the combine
    # contraction all-reduces — attention stays head-sharded on the same
    # axis (hybrid TP-attention + EP-FFN). Router stays replicated.
    (r"layers/experts/(gate|up|down)/kernel_scale", P(None, "model", None)),
    (r"layers/experts/(gate|up|down)/kernel", P(None, "model", None, None)),
    (r"layers/router/kernel", P()),
    (r"layers/(q|k|v|gate|up)/kernel", P(None, None, "model")),
    (r"layers/(q|k|v|gate|up)/bias", P(None, "model")),
    (r"layers/(o|down)/kernel", P(None, "model", None)),
    (r"^embed$|/embed$", P("model", None)),
    (r"lm_head/kernel", P(None, "model")),
)


def _path_str(path) -> str:
    keys = []
    for p in path:
        if hasattr(p, "key"):
            keys.append(str(p.key))
        elif hasattr(p, "idx"):
            keys.append(str(p.idx))
    return "/".join(keys)


def spec_for_path(path: str, rules: Sequence[Tuple[str, P]], ndim: int) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path):
            if len(spec) <= ndim:
                return spec
    return P()


def _int4_dense_prefixes(params: Any) -> Tuple[str, ...]:
    """Paths of dense dicts holding int4 weights: the WHOLE dict (packed,
    scales, bias) must stay replicated together — a model-sharded bias
    next to a replicated pallas matmul output would force a reshard on
    every decode-step add."""
    flat = jax.tree_util.tree_leaves_with_path(params)
    out = []
    for path, _ in flat:
        s = _path_str(path)
        if s.endswith("/kernel_q4"):
            out.append(s[: -len("/kernel_q4")])
    return tuple(out)


def param_specs(params: Any, rules: Sequence[Tuple[str, P]] = WHISPER_TP_RULES
                ) -> Any:
    """Pytree of PartitionSpecs matching ``params``."""
    int4 = _int4_dense_prefixes(params)
    flat = jax.tree_util.tree_leaves_with_path(params)
    specs = {}
    for path, leaf in flat:
        s = _path_str(path)
        if any(s == pre or s.startswith(pre + "/") for pre in int4):
            specs[s] = P()
        else:
            specs[s] = spec_for_path(s, rules, leaf.ndim)
    # rebuild tree
    return jax.tree_util.tree_map_with_path(
        lambda p, leaf: specs[_path_str(p)], params)


def shard_params(params: Any, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = WHISPER_TP_RULES) -> Any:
    """device_put every param with its rule-derived NamedSharding. Dims not
    divisible by the mesh axis fall back to replication for that param."""
    int4 = _int4_dense_prefixes(params)

    def put(path, leaf):
        s = _path_str(path)
        if any(s == pre or s.startswith(pre + "/") for pre in int4):
            spec = P()
        else:
            spec = spec_for_path(s, rules, leaf.ndim)
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)
