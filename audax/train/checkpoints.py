"""Orbax checkpointing: full train-state and trainable-only variants.

Mirrors the reference's three schemes (SURVEY.md §5 checkpoint/resume):
hyperparameter-stamped full saves (.charles/spectrogram.py:110-118,592-594),
space-saving trainable-only checkpoints plus config dict with best-model
tracking (.charles/music2midi/train.py:281-334), and step-based retention
(AB/fineTune.py:175-181).

Async contract: ``CheckpointManager.save`` is asynchronous — it snapshots the
state and returns, and the write overlaps the next epoch's compute (the
classifier loop saves every epoch and calls ``wait()`` once at the end,
train/loops.py:fit_classifier). ``save_pytree`` is the synchronous one-shot
for standalone artifacts; pass ``block=False`` to get the async variant and
call ``.wait_until_finished()`` yourself.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from audax.core.logging import get_logger

__all__ = ["CheckpointManager", "save_pytree", "load_pytree"]

log = get_logger("audax.ckpt")


def save_pytree(path: str, tree: Any, *, block: bool = True
                ) -> Optional[ocp.StandardCheckpointer]:
    """One-shot pytree save (standalone artifacts).

    ``block=True`` (default) waits for the write to finish. ``block=False``
    returns the checkpointer immediately — the caller overlaps the write
    with compute and calls ``wait_until_finished()`` before relying on it.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    if block:
        ckptr.wait_until_finished()
        return None
    return ckptr


def load_pytree(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; with ``target`` the result matches its structure,
    dtypes, and shardings.

    Without ``target``, restores are backend-portable: orbax's recorded
    shardings name the devices that SAVED the tree (e.g. TFRT_CPU_0 from a
    CPU-pinned trainer), and replaying them verbatim fails in a process
    whose backend differs (the axon-TPU CLI exporting a CPU-trained
    checkpoint). Fall back to plain numpy restoration in that case —
    callers re-place on whatever mesh they need."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target)
    try:
        return ckptr.restore(path)
    except ValueError:
        import numpy as np
        with ocp.PyTreeCheckpointer() as ptc:
            meta = ptc.metadata(path).item_metadata
            tree = meta.tree if hasattr(meta, "tree") else meta
            args = jax.tree.map(
                lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
            return ptc.restore(
                path, args=ocp.args.PyTreeRestore(restore_args=args))


class CheckpointManager:
    """Step-indexed checkpoints with best-metric tracking and resume.

    Retention keeps the LATEST ``max_to_keep`` steps — resume always has the
    newest state. Best-by-metric is tracked SEPARATELY: an improving save
    also writes a standalone ``best/`` checkpoint + ``best.json`` record.
    (An orbax ``best_fn`` in the manager options would make retention keep
    the best-N and DELETE the latest steps — measured: saving epochs 0-4
    with worsening val_loss left only the two best on disk, so a resumed
    run silently retrained from the best epoch and a completed run had no
    final checkpoint at all.)
    """

    def __init__(self, directory: str, *, max_to_keep: int = 3,
                 best_metric: str = "val_loss", minimize: bool = True,
                 config: Optional[Dict] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.best_metric = best_metric
        self.minimize = minimize
        self._best_path = os.path.join(self.directory, "best.json")
        self._best_ckptr: Optional[ocp.StandardCheckpointer] = None
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                # explicit: save() returns after snapshotting and the write
                # overlaps subsequent compute; wait()/close() finalize
                enable_async_checkpointing=True,
            ),
        )
        if config is not None:
            with open(os.path.join(self.directory, "config.json"), "w") as fh:
                json.dump(config, fh, indent=2, default=str)

    def _best_record(self) -> Optional[Dict]:
        if os.path.exists(self._best_path):
            with open(self._best_path) as fh:
                return json.load(fh)
        return None

    def save(self, step: int, state: Any,
             metrics: Optional[Dict[str, float]] = None) -> None:
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)
        val = metrics.get(self.best_metric)
        if val is None:
            return
        rec = self._best_record()
        improved = rec is None or (val < rec["value"] if self.minimize
                                   else val > rec["value"])
        if improved:
            if self._best_ckptr is not None:       # previous write finishes
                self._best_ckptr.wait_until_finished()
            self._best_ckptr = save_pytree(
                os.path.join(self.directory, "best"), state, block=False)
            with open(self._best_path, "w") as fh:
                json.dump({"step": step, "value": val,
                           "metric": self.best_metric}, fh)

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
        try:
            return self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(abstract))
        except Exception:
            # template is a top-level subset of the saved tree (e.g. the
            # test CLI restores params/batch_stats from a checkpoint that
            # also carries opt_state): restore raw and project
            raw = self._mgr.restore(step)
            if isinstance(state_like, dict) and isinstance(raw, dict) \
                    and set(state_like) <= set(raw):
                return {k: raw[k] for k in state_like}
            raise

    def restore_best(self, state_like: Any) -> Any:
        """Restore the best-by-metric checkpoint (independent of step
        retention)."""
        if self._best_record() is None:
            raise FileNotFoundError(f"no best checkpoint in {self.directory}")
        self.wait()
        return load_pytree(os.path.join(self.directory, "best"), state_like)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        rec = self._best_record()
        return None if rec is None else int(rec["step"])

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        if self._best_ckptr is not None:
            self._best_ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()
