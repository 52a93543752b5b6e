"""Device mesh and sharding helpers — the framework's "communication backend".

The reference is single-device with no distributed backend (SURVEY.md §2.3).
On TPU the backend is *declarative*: we build a `jax.sharding.Mesh` over the
slice, annotate arrays with `NamedSharding`s, and XLA inserts the ICI/DCN
collectives (all-reduce for DP grads, all-gather/reduce-scatter for TP) —
there is no socket layer to write, but the mesh/axis layout here is the
design that decides whether collectives ride ICI or DCN.

Axes:
  data   — batch dim of inputs; gradients all-reduced across it
  model  — TP axis: attention heads / FFN hidden sharded across it
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audax.core.config import MeshConfig

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "P",
           "local_mesh", "pad_to_multiple"]


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=-1`` absorbs all devices not claimed by the model axis, so the same
    config scales from 1 chip to a full slice. The model axis is laid out on
    the fastest-varying device dimension so TP collectives ride nearest-
    neighbor ICI links.
    """
    cfg = cfg or MeshConfig()
    devs = list(devices if devices is not None else jax.devices())
    model = max(1, cfg.model)
    if len(devs) % model != 0:
        raise ValueError(f"{len(devs)} devices not divisible by model={model}")
    data = cfg.data if cfg.data > 0 else len(devs) // model
    if data * model != len(devs):
        devs = devs[: data * model]
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, cfg.axis_names)


def local_mesh() -> Mesh:
    """Single-axis mesh over all local devices (the common 1-chip case)."""
    return make_mesh(MeshConfig())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; replicate the rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of [B, ...] arrays batch-sharded over 'data'.

    Pads B up to a multiple of the data-axis size if needed (padding rows are
    the caller's responsibility to mask; we only guarantee divisibility).
    """
    n_data = mesh.shape["data"]

    def put(x):
        b = x.shape[0]
        if b % n_data:
            pad = pad_to_multiple(b, n_data) - b
            x = np.concatenate([np.asarray(x)] + [np.asarray(x[:1])] * pad, axis=0)
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree.map(put, batch)


@contextmanager
def use_mesh(mesh: Mesh):
    with jax.sharding.use_mesh(mesh):
        yield mesh
