"""Device mesh and sharding helpers — the framework's "communication backend".

The reference is single-device with no distributed backend (SURVEY.md §2.3).
On TPU the backend is *declarative*: we build a `jax.sharding.Mesh` over the
slice, annotate arrays with `NamedSharding`s, and XLA inserts the ICI/DCN
collectives (all-reduce for DP grads, all-gather/reduce-scatter for TP) —
there is no socket layer to write, but the mesh/axis layout here is the
design that decides whether collectives ride ICI or DCN.

Axes:
  data      — batch dim of inputs; gradients all-reduced across it
  model     — TP axis: attention heads / FFN hidden sharded across it
  dcn_data  — (multi-host/multi-slice) outer DP axis laid out across hosts,
              so its all-reduces ride DCN while data/model stay on ICI

Multi-host: ``init_distributed()`` wires ``jax.distributed.initialize`` (one
process per host, all devices visible globally), and ``make_multihost_mesh``
builds a (dcn_data, data, model) mesh that keeps each host's local devices
contiguous on the inner axes — the collective layout SURVEY.md §2.3 calls
"ICI within slice, DCN across slices".
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audax.core.config import MeshConfig

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch", "P",
           "local_mesh", "pad_to_multiple", "init_distributed",
           "make_multihost_mesh", "multihost_device_grid"]


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
    if data * model > len(devs):
        raise ValueError(f"mesh ({data} data x {model} model) needs "
                         f"{data * model} devices, only {len(devs)} present")
    if data * model != len(devs):
        devs = devs[: data * model]
    arr = np.array(devs).reshape(data, model)
    return Mesh(arr, cfg.axis_names)


def local_mesh() -> Mesh:
    """Single-axis mesh over all local devices (the common 1-chip case)."""
    return make_mesh(MeshConfig())


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host entry: call once per host process before any backend touch.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, as set by most TPU launchers); on a
    single process (no coordinator configured) this is a no-op so the same
    entry points run unmodified on one host. Returns the process count.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return 1
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return jax.process_count()


def multihost_device_grid(devices: Sequence, num_hosts: int,
                          model: int = 1) -> np.ndarray:
    """Arrange a flat global device list into a (dcn_data, data, model) grid.

    Pure layout logic (unit-testable with fake device lists): devices arrive
    host-major from ``jax.devices()``, so axis 0 (one entry per host) crosses
    DCN while axes 1-2 stay within each host's ICI domain. ``model`` must
    divide the per-host device count — TP collectives never cross DCN.
    """
    devs = list(devices)
    if len(devs) % num_hosts:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"{num_hosts} hosts")
    per_host = len(devs) // num_hosts
    if per_host % model:
        raise ValueError(f"model={model} does not divide per-host device "
                         f"count {per_host}; TP must stay inside one host's "
                         f"ICI domain")
    return np.array(devs).reshape(num_hosts, per_host // model, model)


def make_multihost_mesh(cfg: Optional[MeshConfig] = None,
                        devices: Optional[Sequence] = None,
                        num_hosts: Optional[int] = None) -> Mesh:
    """(dcn_data, data, model) mesh over all global devices.

    Shard batches over BOTH data axes (``P(("dcn_data", "data"), ...)``) and
    params over 'model': gradient all-reduce then decomposes into an ICI
    all-reduce within each host plus a DCN all-reduce of one partial per
    host, which XLA schedules hierarchically. On one host this degenerates
    to (1, data, model) and is equivalent to make_mesh.
    """
    cfg = cfg or MeshConfig()
    devs = list(devices if devices is not None else jax.devices())
    n_hosts = num_hosts if num_hosts is not None else jax.process_count()
    grid = multihost_device_grid(devs, n_hosts, max(1, cfg.model))
    return Mesh(grid, ("dcn_data",) + cfg.axis_names)


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
