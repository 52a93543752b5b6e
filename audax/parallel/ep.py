"""Expert parallelism: GShard-style all_to_all dispatch under shard_map.

The reference has no parallelism of any kind (SURVEY.md §2.3); MoE itself
is a new capability (models/causal_lm.py:_moe_block, Qwen3-MoE family).
This module is the production-shape EP schedule for it, complementing the
declarative dense-combine path (CAUSAL_LM_TP_RULES shards the expert axis,
but every device still computes every token x every LOCAL expert — E/k×
the FLOPs):

  1. tokens are sharded over the ``ep`` mesh axis (M devices, N/M each);
  2. each device routes its own tokens and builds token-granular
     dispatch/combine one-hots [N/M, E, C] via the rank-in-expert cumsum
     (GShard eq. dispatch mask; capacity C = N/M is exact — a device can
     send an expert at most all of its tokens — or ``capacity_factor``
     bounds it, dropping overflow like Switch/GShard do at scale);
  3. ``all_to_all`` exchanges the dispatched [E, C, d] blocks so each
     device holds [E/M, M*C, d] — all tokens bound for ITS experts;
  4. the local SwiGLU expert FFN runs as [E/M]-batched MXU matmuls;
  5. the reverse ``all_to_all`` returns expert outputs to the tokens'
     home devices, where the combine einsum applies router weights.

Per-device FFN compute is the top-k load /M (plus capacity padding), and
the only collectives are the two all_to_alls riding ICI. Exact vs the
single-device MoE block at C = N/M (tested on the 8-CPU mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:                                   # jax >= 0.4.35
    from jax import shard_map
except ImportError:                    # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from audax.models.causal_lm import CausalLMConfig, _moe_router, rms_norm

__all__ = ["moe_expert_parallel"]


def _dispatch_masks(w, idx, num_experts: int, capacity: int):
    """Token-granular dispatch/combine one-hots [Nl, E, C].

    ``pos`` ranks each (token, slot) selection within its expert in
    token-major order (the GShard position-in-expert cumsum); selections
    ranked past ``capacity`` are dropped (never happens at C = Nl).
    """
    nl, k = idx.shape
    sel = jax.nn.one_hot(idx.reshape(-1), num_experts,
                         dtype=jnp.float32)                  # [Nl*k, E]
    pos = (jnp.cumsum(sel, axis=0) * sel).sum(-1) - 1.0      # [Nl*k]
    keep = (pos < capacity).astype(jnp.float32)
    cap = jax.nn.one_hot(pos.astype(jnp.int32), capacity,
                         dtype=jnp.float32)                  # [Nl*k, C]
    both = (sel * keep[:, None])[:, :, None] * cap[:, None, :]
    both = both.reshape(nl, k, num_experts, capacity)
    dispatch = both.sum(1)                                   # [Nl, E, C]
    combine = jnp.einsum("nkec,nk->nec", both,
                         w.astype(jnp.float32))              # [Nl, E, C]
    return dispatch, combine


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "ep_axis", "capacity_factor", "dtype"))
def moe_expert_parallel(layer, cfg: CausalLMConfig, x: jnp.ndarray,
                        mesh: Mesh, *, ep_axis: str = "model",
                        capacity_factor: float = 0.0,
                        dtype=jnp.float32) -> jnp.ndarray:
    """Sparse-MoE FFN block (pre-norm + routed SwiGLU experts, the same
    math as models/causal_lm.py:_moe_block) with tokens sharded over
    ``ep_axis`` and experts dispatched via all_to_all.

    x [B, T, d]; ``layer`` is one decoder layer's param dict (mlp_norm /
    router / experts). B*T must divide by the axis size, num_experts too.
    ``capacity_factor`` 0 -> exact (C = local tokens); > 0 -> GShard-style
    C = ceil(cf * Nl * k / E) with overflow dropped.

    Def-site jitted (cfg/mesh static): eager use would re-trace the
    shard_map body every call (fresh closure identity, CLAUDE.md gotcha).
    """
    b, t, d = x.shape
    n = b * t
    m = mesh.shape[ep_axis]
    if n % m:
        raise ValueError(f"tokens {n} not divisible by EP axis {m}")
    if cfg.num_experts % m:
        raise ValueError(f"experts {cfg.num_experts} not divisible by {m}")
    nl = n // m
    if capacity_factor > 0:
        cap = -(-int(capacity_factor * nl * cfg.experts_per_tok)
                // cfg.num_experts)
        cap = max(1, min(cap, nl))
    else:
        cap = nl

    def local(x_local, layer):
        """x_local [Nl, d] (this device's tokens), experts sharded on E."""
        h = rms_norm(layer["mlp_norm"], x_local, cfg.rms_eps)
        w, idx, _ = _moe_router(layer, cfg, h)
        dispatch, combine = _dispatch_masks(w, idx, cfg.num_experts, cap)
        xd = jnp.einsum("nd,nec->ecd", h.astype(jnp.float32),
                        dispatch).astype(h.dtype)            # [E, C, d]
        # exchange: each device keeps its E/M experts' rows from everyone
        xe = lax.all_to_all(xd, ep_axis, split_axis=0, concat_axis=1,
                            tiled=True)                      # [E/M, M*C, d]
        ex = layer["experts"]

        def ek(name):
            """Local expert weights in the activation dtype + optional
            int8 per-(expert, out-channel) scale (models/quantize.py)."""
            p = ex[name]
            if "kernel_q4" in p:
                raise ValueError(
                    "int4 experts are the single-chip capacity tier "
                    "(opaque pallas layout; GSPMD cannot partition it) — "
                    "use float or int8 experts for expert parallelism")
            if "kernel_q" in p:
                return p["kernel_q"].astype(h.dtype), p["kernel_scale"]
            return p["kernel"].astype(h.dtype), None

        def scale(t, s):                                     # t [E/M, C', out]
            return t if s is None else t * s[:, None, :].astype(t.dtype)

        gk, gsc = ek("gate")
        uk, usc = ek("up")
        dk, dsc = ek("down")
        g = scale(jnp.einsum("ecd,edf->ecf", xe, gk), gsc)
        u = scale(jnp.einsum("ecd,edf->ecf", xe, uk), usc)
        o = scale(jnp.einsum("ecf,efd->ecd", jax.nn.silu(g) * u, dk), dsc)
        # return expert outputs to the tokens' home devices
        od = lax.all_to_all(o, ep_axis, split_axis=1, concat_axis=0,
                            tiled=True)                      # [E, C, d]
        y = jnp.einsum("ecd,nec->nd", od.astype(jnp.float32), combine)
        return y.astype(x_local.dtype)

    sub = {"mlp_norm": layer["mlp_norm"], "router": layer["router"],
           "experts": layer["experts"]}
    specs = {"mlp_norm": jax.tree.map(lambda _: P(), sub["mlp_norm"]),
             "router": jax.tree.map(lambda _: P(), sub["router"]),
             # expert leaves are sharded on their leading (expert) axis:
             # kernels [E, K, N] and int8 scales [E, N] alike
             "experts": jax.tree.map(
                 lambda a: P(ep_axis, *([None] * (a.ndim - 1))),
                 sub["experts"])}
    sharded = shard_map(
        local, mesh=mesh,
        in_specs=(P(ep_axis, None), specs),
        out_specs=P(ep_axis, None),
    )
    xf = lax.with_sharding_constraint(
        x.astype(dtype).reshape(n, d), NamedSharding(mesh, P(ep_axis, None)))
    return sharded(xf, sub).reshape(b, t, d)
