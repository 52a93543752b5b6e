"""Classifier slice: model shapes, SPMD train step, convergence on a
synthetic separable problem, metric parity vs sklearn."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audax.core.config import (ClassifierTrainConfig, CNNClassifierConfig,
                               TransformerClassifierConfig)
from audax.models.classifiers import (CNNClassifier, TransformerClassifier,
                                      WaveformCNNClassifier)
from audax.train.loops import evaluate_classifier, fit_classifier
from audax.train.steps import make_classifier_steps


def synthetic_mel(n, t=64, mels=32, classes=4, seed=0):
    """Separable toy data: class k gets energy in mel band k."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, classes, n)
    x = rng.standard_normal((n, t, mels)).astype(np.float32) * 0.3
    for i in range(n):
        band = slice(y[i] * (mels // classes), (y[i] + 1) * (mels // classes))
        x[i, :, band] += 2.0
    return {"x": x, "y": y.astype(np.int64)}


@pytest.mark.parametrize("model", [
    CNNClassifier(CNNClassifierConfig(channels=(16, 32), head_dims=(32,),
                                      num_classes=4)),
    TransformerClassifier(TransformerClassifierConfig(
        dim=32, heads=2, layers=1, mlp_dim=64, num_classes=4), max_len=128),
    TransformerClassifier(TransformerClassifierConfig(
        dim=32, heads=2, layers=1, mlp_dim=64, num_classes=4, pool="mean"),
        max_len=128),
])
def test_classifier_shapes(model):
    x = jnp.zeros((2, 64, 32))
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 4)
    # pos_embed is a real init-time parameter (reference bug fixed)
    if isinstance(model, TransformerClassifier):
        flat = jax.tree.leaves_with_path(variables["params"])
        names = {"/".join(str(p) for p in path) for path, _ in flat}
        assert any("pos_embed" in n for n in names)


def test_waveform_cnn_shape():
    model = WaveformCNNClassifier(num_classes=10)
    x = jnp.zeros((2, 16000))
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 10)


def test_transformer_trains_to_separable():
    data = synthetic_mel(256)
    eval_data = synthetic_mel(64, seed=1)
    model = TransformerClassifier(TransformerClassifierConfig(
        dim=32, heads=2, layers=1, mlp_dim=64, dropout=0.0, num_classes=4),
        max_len=128)
    cfg = ClassifierTrainConfig(batch_size=32, epochs=5, learning_rate=1e-3,
                                weight_decay=0.0, seed=0)
    state, history = fit_classifier(model, data, eval_data, cfg, num_classes=4)
    assert history["eval"][-1]["accuracy"] > 0.9
    assert history["train_loss"][-1] < history["train_loss"][0]


def test_cnn_trains_to_separable():
    data = synthetic_mel(256)
    model = CNNClassifier(CNNClassifierConfig(channels=(16, 32),
                                              head_dims=(32,), dropout=0.0,
                                              num_classes=4))
    cfg = ClassifierTrainConfig(batch_size=32, epochs=4, learning_rate=1e-3,
                                weight_decay=0.0)
    state, history = fit_classifier(model, data, synthetic_mel(64, seed=1),
                                    cfg, num_classes=4)
    assert history["eval"][-1]["accuracy"] > 0.8


def test_eval_padding_mask_exact():
    """Eval over n not divisible by batch must score exactly n rows."""
    data = synthetic_mel(37, seed=3)
    model = CNNClassifier(CNNClassifierConfig(channels=(8,), head_dims=(16,),
                                              num_classes=4))
    rng = jax.random.key(0)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, 64, 32)), train=True)
    from audax.train.steps import TrainState
    from audax.train.optim import adamw
    state = TrainState.create(apply_fn=model.apply, params=variables["params"],
                              tx=adamw(1e-3),
                              batch_stats=variables["batch_stats"])
    _, eval_step = make_classifier_steps(model)
    m, preds = evaluate_classifier(eval_step, state, data, batch_size=16,
                                   num_classes=4)
    assert len(preds) == 37
    assert int(m["support"].sum()) == 37


def test_metrics_match_sklearn():
    from sklearn.metrics import (accuracy_score, confusion_matrix as sk_cm,
                                 precision_recall_fscore_support)
    from audax.eval.metrics import detailed_metrics, confusion_matrix
    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 10, 500)
    y_pred = np.where(rng.random(500) < 0.6, y_true, rng.integers(0, 10, 500))
    m = detailed_metrics(y_true, y_pred, 10)
    assert m["accuracy"] == pytest.approx(accuracy_score(y_true, y_pred))
    for avg in ("macro", "weighted"):
        p, r, f, _ = precision_recall_fscore_support(
            y_true, y_pred, average=avg, zero_division=0)
        assert m[f"precision_{avg}"] == pytest.approx(p)
        assert m[f"recall_{avg}"] == pytest.approx(r)
        assert m[f"f1_{avg}"] == pytest.approx(f)
    np.testing.assert_array_equal(m["confusion_matrix"], sk_cm(y_true, y_pred))


def test_classification_report_and_plot(tmp_path):
    from audax.eval.metrics import classification_report, plot_confusion_matrix
    y = np.array([0, 1, 2, 2, 1, 0, 2])
    p = np.array([0, 1, 1, 2, 1, 0, 2])
    report = classification_report(y, p, ["a", "b", "c"])
    assert "macro avg" in report and "accuracy" in report
    out = tmp_path / "cm.png"
    plot_confusion_matrix(y, p, ["a", "b", "c"], str(out))
    assert out.stat().st_size > 0


def test_dp_sharding_across_8_devices():
    """The jitted step must accept a batch sharded over all 8 CPU devices and
    return replicated params (grad all-reduce inserted by XLA)."""
    from audax.parallel.mesh import local_mesh, shard_batch
    mesh = local_mesh()
    assert mesh.shape["data"] == 8
    data = synthetic_mel(32)
    model = CNNClassifier(CNNClassifierConfig(channels=(8,), head_dims=(16,),
                                              num_classes=4))
    cfg = ClassifierTrainConfig(batch_size=16, epochs=1, learning_rate=1e-3)
    state, _ = fit_classifier(model, data, None, cfg, num_classes=4, mesh=mesh)
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) in (1, 8)  # replicated or single
