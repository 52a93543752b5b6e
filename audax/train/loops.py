"""Training loops: the UrbanSound8K fold protocol, generalized.

Reference protocol (SURVEY.md §4.2): train on folds 1-8, evaluate fold 9
each epoch with full metrics, test fold 10 from the final/best checkpoint
(.charles/spectrogram.py:517-594,1059-1164). The loop here is model-agnostic:
it takes dict-of-array splits, a Flax classifier, and runs jitted SPMD steps
over the mesh.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audax.core.config import ClassifierTrainConfig
from audax.core.logging import get_logger
from audax.data.batching import eval_batches, train_batches
from audax.eval.metrics import detailed_metrics
from audax.parallel.mesh import local_mesh, shard_batch
from audax.train.metrics_sink import MetricsSink
from audax.train.optim import adamw
from audax.train.steps import TrainState, make_classifier_steps

__all__ = ["fit_classifier", "evaluate_classifier"]

log = get_logger("audax.train")


def _init_state(model, sample_x: np.ndarray, cfg: ClassifierTrainConfig) -> TrainState:
    rng = jax.random.key(cfg.seed)
    # init under jit: one compiled program instead of per-op dispatch (the
    # latter is pathologically slow on tunneled TPU backends)
    init = jax.jit(lambda r, x: model.init({"params": r, "dropout": r},
                                           x, train=True))
    variables = init(rng, jnp.asarray(sample_x))
    tx = adamw(cfg.learning_rate, cfg.weight_decay)
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", {}),
    )


def evaluate_classifier(eval_step, state: TrainState,
                        data: Dict[str, np.ndarray], batch_size: int,
                        num_classes: int, mesh=None) -> Tuple[Dict, np.ndarray]:
    """Run eval over a split; returns (metrics dict incl. loss, predictions)."""
    mesh = mesh or local_mesh()
    preds, losses, keeps = [], [], []
    numeric = {k: data[k] for k in ("x", "y")}
    for batch in eval_batches(numeric, batch_size):
        out = eval_step(state, shard_batch(mesh, batch))
        keeps.append(int(batch["w"].sum()))
        preds.append(out["predictions"])
        losses.append(out["loss"])
    if preds:
        # single device->host fetch for the whole split
        all_preds = np.asarray(jnp.concatenate(preds).reshape(-1))
        all_losses = np.asarray(jnp.stack(losses))
        predictions = np.concatenate(
            [p[:k] for p, k in zip(all_preds.reshape(len(keeps), -1), keeps)])
        loss = float(np.average(all_losses, weights=keeps))
    else:
        predictions = np.zeros(0, np.int64)
        loss = 0.0
    m = detailed_metrics(data["y"], predictions, num_classes)
    m["loss"] = loss
    return m, predictions


def fit_classifier(
    model,
    train_data: Dict[str, np.ndarray],
    eval_data: Optional[Dict[str, np.ndarray]],
    cfg: ClassifierTrainConfig,
    *,
    num_classes: int = 10,
    mesh=None,
    sink: Optional[MetricsSink] = None,
    ckpt_manager=None,
) -> Tuple[TrainState, Dict]:
    """Train a Flax classifier; per-epoch eval with the full metric suite.

    train_data/eval_data: {"x": [N, T, n_mels] float32, "y": [N] int}.
    """
    mesh = mesh or local_mesh()
    # keep only the numeric tensors the step consumes (splits may carry
    # filenames and other host-side metadata)
    train_data = {k: train_data[k] for k in ("x", "y")}
    if eval_data is not None:
        eval_data = {k: eval_data[k] for k in ("x", "y")}
    train_step, eval_step = make_classifier_steps(model)
    state = _init_state(model, train_data["x"][: cfg.batch_size], cfg)
    rng = jax.random.key(cfg.seed + 1)
    history: Dict[str, list] = {"train_loss": [], "eval": []}

    # mid-run resume: continue from the last persisted epoch (the reference
    # had save/load but never wired resume — SURVEY.md §5 checkpoint/resume).
    # opt_state and step travel too: restoring params alone would reset the
    # Adam moments (loss spike) and replay the early steps' dropout keys
    # (train_step folds state.step into the rng)
    start_epoch = 0
    if ckpt_manager is not None and ckpt_manager.latest_step() is not None:
        template = {"params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state, "step": state.step}
        try:
            restored = ckpt_manager.restore(template)
        except Exception:  # older checkpoints persisted params only
            restored = ckpt_manager.restore(
                {"params": state.params, "batch_stats": state.batch_stats})
            restored = {**restored, "opt_state": state.opt_state,
                        "step": state.step}
            log.warning("checkpoint has no optimizer state (old format); "
                        "Adam moments reset")
        # orbax restores to one device; re-replicate over the mesh
        from audax.parallel.mesh import replicated
        restored = jax.device_put(restored, replicated(mesh))
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"],
                              step=restored["step"])
        start_epoch = int(ckpt_manager.latest_step()) + 1
        log.info("resumed from epoch %d", start_epoch - 1)

    n_train = len(train_data["y"])
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        losses, accs = [], []
        for batch in train_batches(train_data, cfg.batch_size, cfg.seed, epoch):
            state, m = train_step(state, shard_batch(mesh, batch), rng)
            losses.append(m["loss"])
            accs.append(m["accuracy"])
        # one device->host fetch per epoch (per-batch fetches serialize on
        # dispatch latency)
        if losses:
            stacked = np.asarray(jnp.stack(losses + accs))
            train_loss = float(stacked[: len(losses)].mean())
            train_acc = float(stacked[len(losses):].mean())
        else:
            train_loss = train_acc = 0.0
        record = {"epoch": epoch, "train_loss": train_loss,
                  "train_accuracy": train_acc,
                  "examples_per_s": n_train / max(time.time() - t0, 1e-9)}
        history["train_loss"].append(train_loss)

        if eval_data is not None:
            em, _ = evaluate_classifier(eval_step, state, eval_data,
                                        cfg.batch_size, num_classes, mesh)
            record.update({
                "eval_loss": em["loss"], "eval_accuracy": em["accuracy"],
                "eval_f1_macro": em["f1_macro"],
                "eval_precision_macro": em["precision_macro"],
                "eval_recall_macro": em["recall_macro"],
            })
            history["eval"].append(em)
        if sink:
            sink.log(record, step=epoch)
        else:
            log.info("epoch %d: %s", epoch,
                     {k: round(v, 4) for k, v in record.items()
                      if isinstance(v, float)})
        if ckpt_manager is not None:
            ckpt_manager.save(epoch, {"params": state.params,
                                      "batch_stats": state.batch_stats,
                                      "opt_state": state.opt_state,
                                      "step": state.step},
                              metrics={"val_loss": record.get("eval_loss", train_loss)})
    if ckpt_manager is not None:
        ckpt_manager.wait()
    return state, history
