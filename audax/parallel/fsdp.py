"""FSDP / ZeRO-3: parameters + optimizer state sharded over the data axis.

The reference trains replicated on one device (SURVEY.md §2.3 — no model or
optimizer-state parallelism anywhere; AB/fineTune.py holds full params + Adam
moments per GPU). On TPU, fully-sharded data parallelism is a *sharding
choice*, not a wrapper class: each parameter tensor is sharded over the
``data`` mesh axis on one extra dimension (on top of any tensor-parallel
sharding from the rule tables), and the optimizer moments inherit the same
layout. XLA then compiles the canonical ZeRO-3 schedule automatically:

  - forward/backward: per-layer all-gather of the sharded weights over ICI
    (overlapped with compute by the XLA latency-hiding scheduler),
  - gradients: reduce-scatter instead of all-reduce (each device keeps only
    its shard),
  - optimizer update: purely local on the shard — params, grads, and both
    Adam moments never materialize unsharded.

Per-device memory for (params + m + v) drops by ~the data-axis size, which is
what makes whisper-large-class full fine-tunes fit small chips.

Usage::

    mesh = make_mesh(MeshConfig(model=1))            # pure-DP or DPxTP mesh
    state = init_finetune(params, ft_cfg)
    state = fsdp_shard_state(state, mesh)            # ZeRO-3 layout
    step = make_finetune_step(cfg)                   # unchanged step
    batch = shard_batch(batch, mesh)                 # batch over 'data'
    state, metrics = step(state, batch)              # XLA inserts collectives

No step-function changes: jit follows the input shardings.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audax.parallel.sharding import (WHISPER_TP_RULES, _int4_dense_prefixes,
                                     _path_str, spec_for_path)

__all__ = ["fsdp_specs", "shard_params_fsdp", "fsdp_shard_state"]


def _valid(spec: P, shape, mesh: Mesh) -> P:
    """Replicate params whose sharded dims don't divide the mesh axis
    (same fallback rule as sharding.shard_params); drop trivial (size-1)
    or ABSENT mesh axes so they don't block the FSDP dim — on a pure-DP
    ("data",) mesh a TP rule's 'model' placement is replication anyway."""
    out = []
    for dim, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        size = 1
        for a in (axis if isinstance(axis, tuple) else (axis,)):
            size *= mesh.shape.get(a, 1)
        if size == 1:
            out.append(None)
            continue
        if shape[dim] % size != 0:
            return P()
        out.append(axis)
    return P(*out)


def _add_fsdp_dim(spec: P, shape, mesh: Mesh, axis: str,
                  min_size: int) -> P:
    """Extend a (possibly TP-) spec with the FSDP axis on the largest
    still-unsharded, divisible dimension. Small tensors stay replicated —
    gathering a bias costs more in collective latency than its bytes."""
    n = mesh.shape.get(axis, 1)
    if n <= 1:
        return spec
    size = 1
    for d in shape:
        size *= d
    if size < min_size:
        return spec
    ext = tuple(spec) + (None,) * (len(shape) - len(spec))
    cands = [d for d in range(len(shape))
             if ext[d] is None and shape[d] % n == 0 and shape[d] >= n]
    if not cands:
        return spec
    best = max(cands, key=lambda d: shape[d])
    return P(*(axis if d == best else ext[d] for d in range(len(shape))))


def fsdp_specs(params: Any, mesh: Mesh, *,
               rules: Sequence[Tuple[str, P]] = WHISPER_TP_RULES,
               axis: str = "data", min_size: int = 1 << 12) -> Any:
    """Pytree of PartitionSpecs: TP rules first (with the divisibility
    fallback), then the FSDP ``axis`` on each tensor's largest free dim.
    int4-packed dense dicts stay replicated as a unit — their matmul is an
    opaque pallas call GSPMD cannot partition (sharding.py rationale)."""
    int4 = _int4_dense_prefixes(params)

    def one(path, leaf):
        s = _path_str(path)
        if any(s == pre or s.startswith(pre + "/") for pre in int4):
            return P()
        spec = _valid(spec_for_path(s, rules, leaf.ndim), leaf.shape, mesh)
        return _add_fsdp_dim(spec, leaf.shape, mesh, axis, min_size)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params_fsdp(params: Any, mesh: Mesh, *,
                      rules: Sequence[Tuple[str, P]] = WHISPER_TP_RULES,
                      axis: str = "data", min_size: int = 1 << 12) -> Any:
    """device_put params into the ZeRO-3 layout (TP rules + FSDP axis)."""
    specs = fsdp_specs(params, mesh, rules=rules, axis=axis,
                       min_size=min_size)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)


def fsdp_shard_state(state, mesh: Mesh, *,
                     rules: Sequence[Tuple[str, P]] = WHISPER_TP_RULES,
                     axis: str = "data", min_size: int = 1 << 12):
    """Shard a train state (FTState / TrainState / any pytree holding the
    params plus optimizer moments) into the ZeRO-3 layout.

    Optimizer-state leaves inherit their parameter's spec by shape match:
    Adam's mu/nu mirror the param tree leaf-for-leaf, so a shape→spec map
    built from the params covers them; scalars and schedule counters fall
    back to replicated. Works on any optax chain without knowing its state
    structure.
    """
    trainable = getattr(state, "trainable", None)
    if trainable is None:
        trainable = state.params                      # TrainState
    specs = fsdp_specs(trainable, mesh, rules=rules, axis=axis,
                       min_size=min_size)
    by_shape = {}
    for leaf, spec in zip(jax.tree.leaves(trainable),
                          jax.tree.leaves(specs, is_leaf=lambda x:
                                          isinstance(x, P))):
        by_shape.setdefault(getattr(leaf, "shape", ()), spec)

    def put(leaf):
        spec = by_shape.get(getattr(leaf, "shape", ()), P())
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, state)
