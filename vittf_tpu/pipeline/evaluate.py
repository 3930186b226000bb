"""Segmentation metrics (sklearn-parity, computable on device) + evaluators.

The reference computes accuracy / per-class precision / recall / F1 / IoU /
confusion matrix with sklearn on flattened label volumes
(predict_ntf.py:228-246, evaluate_similarities.py:65-78,
predict_svm_rf.py:202-289). Here the confusion matrix is a one-hot matmul
(MXU-friendly, jit-safe) and every metric derives from it; results match
sklearn's ``average=None`` + zero-division→0 semantics over the label set
``0..num_classes-1``.
"""
from __future__ import annotations

import json
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.resize import resize_nearest

# CT-ORG label map (evaluate_similarities.py:27-35)
LABEL2IDX = {
    "background": 0,
    "liver": 1,
    "bladder": 2,
    "lung": 3,
    "kidney": 4,
    "bone": 5,
}
IDX2LABEL = ["liver", "bladder", "lung", "kidney", "bone"]


@partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """(C, C) counts, rows = true class, cols = predicted (sklearn layout).

    Lowered as a scan over the C² cells with a fused compare+popcount —
    a TPU scatter-add with volume-many indices serializes (measured
    15.5 s WARM for a 512³ pair at C=6 vs 0.05 s for the scan). Exact
    int32 counts at any size. The scatter form is only competitive when
    C² outgrows the volume, which segmentation never hits.
    """
    idx = y_true.astype(jnp.int32).reshape(-1) * num_classes + y_pred.astype(
        jnp.int32
    ).reshape(-1)
    idx = jax.lax.optimization_barrier(idx)  # materialize once, not per cell

    def cell(_, k):
        return _, (idx == k).sum(dtype=jnp.int32)

    _, counts = jax.lax.scan(cell, None, jnp.arange(num_classes**2))
    return counts.reshape(num_classes, num_classes)


def metrics_from_confusion(cm: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """accuracy + per-class precision/recall/F1/IoU from a confusion matrix.

    Zero denominators yield 0 (sklearn's zero_division=0 warning case).
    """
    cm = cm.astype(jnp.float64) if cm.dtype == jnp.int64 else cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    pred_tot = cm.sum(axis=0)
    true_tot = cm.sum(axis=1)

    def safe_div(a, b):
        return jnp.where(b > 0, a / jnp.where(b > 0, b, 1), 0.0)

    precision = safe_div(tp, pred_tot)
    recall = safe_div(tp, true_tot)
    f1 = safe_div(2 * precision * recall, precision + recall)
    union = pred_tot + true_tot - tp
    iou = safe_div(tp, union)
    accuracy = safe_div(tp.sum(), cm.sum())
    return {
        "accuracy": accuracy,
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "iou": iou,
    }


def segmentation_metrics(
    y_true, y_pred, label_names: list[str], extra: dict | None = None
) -> dict:
    """Metrics JSON in the reference's layout (predict_ntf.py:233-246).

    Device arrays stay on device (the confusion scan runs there anyway);
    forcing ``np.asarray`` on a 1024³ prediction would add a 1 GB
    device→host fetch per scored cell."""

    def flat(x):
        if isinstance(x, jax.Array):
            return x.reshape(-1)
        return jnp.asarray(np.asarray(x).reshape(-1))

    y_true = flat(y_true)
    y_pred = flat(y_pred)
    C = len(label_names)
    cm = confusion_matrix(y_true, y_pred, C)
    m = jax.tree.map(np.asarray, metrics_from_confusion(cm))
    out = {
        "mAcc": float(m["accuracy"]),
        "precision": dict(zip(label_names, m["precision"].tolist())),
        "mPrec": float(m["precision"].mean()),
        "recall": dict(zip(label_names, m["recall"].tolist())),
        "mRec": float(m["recall"].mean()),
        "f1": dict(zip(label_names, m["f1"].tolist())),
        "mF1": float(m["f1"].mean()),
        "iou": dict(zip(label_names, m["iou"].tolist())),
        "mIoU": float(m["iou"].mean()),
        "confusion_matrix": dict(
            zip(label_names, np.asarray(cm).tolist())
        ),
    }
    if extra:
        out.update(extra)
    return out


def evaluate_user_study(
    data_dir: str | Path,
    label_path: str | Path,
    label_names: list[str] = ("lung", "liver", "kidney"),
) -> dict:
    """GUI-session evaluator (evaluate_similarities.py:37-83).

    Loads exported ``predictions.npy`` (binary per-class volumes keyed by
    class) + ``metadata.json`` (annotation time/count), nearest-resizes the
    GT label volume to each prediction's resolution, and writes per-class
    binary metrics to ``metrics.json``.
    """
    data_dir = Path(data_dir)
    with open(data_dir / "metadata.json", encoding="UTF-8") as f:
        metadata = json.load(f)
    labels_data = np.load(label_path, allow_pickle=True)
    labels_orig = labels_data[()] if labels_data.dtype == "O" else labels_data
    preds = np.load(data_dir / "predictions.npy", allow_pickle=True)[()]

    results = {}
    for ln, k in zip(label_names, sorted(preds.keys())):
        p = np.asarray(preds[k])
        meta = metadata[k]
        gt = (np.asarray(labels_orig) == LABEL2IDX[ln]).astype(np.uint8)
        gt = np.asarray(resize_nearest(jnp.asarray(gt), tuple(p.shape[-3:])))
        cm = confusion_matrix(
            jnp.asarray(gt.reshape(-1)), jnp.asarray(p.reshape(-1)), 2
        )
        m = jax.tree.map(np.asarray, metrics_from_confusion(cm))
        results[ln] = {
            "accuracy": float(m["accuracy"]),
            "precision": m["precision"].tolist(),
            "recall": m["recall"].tolist(),
            "f1": m["f1"].tolist(),
            "iou": m["iou"].tolist(),
            "confusion_matrix": np.asarray(cm).tolist(),
            "annotation_time": meta["time"],
            "num_annotations": meta["num_annotations"],
        }
    with open(data_dir / "metrics.json", "w") as f:
        json.dump(results, f)
    return results
