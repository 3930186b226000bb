"""SVM / Random-Forest per-voxel baselines (reference predict_svm_rf.py).

Feature composition runs in JAX (device); the classifiers stay sklearn on
CPU exactly like the reference (libsvm/RF have no TPU analog and serve only
as evaluation baselines). Semantics preserved:

- 11-dim hand-crafted features: intensity/max, central-difference gradient
  magnitude, 6 replicate-padded neighbors, normalized coords − 0.5, all
  standardized per channel (predict_svm_rf.py:25-65)
- training labels are the *index in sorted class-name order* (the
  reference's labels branch is dead code behind ``if False``,
  predict_svm_rf.py:176-179 → sample_train_data labels = class index)
- background class sampled with as many samples as the largest class, from
  labels==0 or from a 4-voxel border shell (predict_svm_rf.py:151-158)
- SVC(kernel='rbf') and RandomForestClassifier(n_estimators=1024,
  max_features=None), dense prediction over every voxel, metrics JSON in
  the reference layout with fit/predict timings
"""
from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.morphology import filter_sobel_separated
from vittf_tpu.ops.sampling import sample_features3d
from vittf_tpu.pipeline.evaluate import segmentation_metrics
from vittf_tpu.utils.tensor import make_4d, make_5d


def get_neighbors6(volume4: jnp.ndarray) -> jnp.ndarray:
    """(1, W, H, D) → (6, W, H, D) intensities of the 6 face neighbors,
    replicate-padded (predict_svm_rf.py:39-48; order +w, +h, +d, −w, −h, −d)."""
    p = jnp.pad(volume4, ((0, 0), (1, 1), (1, 1), (1, 1)), mode="edge")
    return jnp.concatenate(
        [
            p[:, 2:, 1:-1, 1:-1],
            p[:, 1:-1, 2:, 1:-1],
            p[:, 1:-1, 1:-1, 2:],
            p[:, :-2, 1:-1, 1:-1],
            p[:, 1:-1, :-2, 1:-1],
            p[:, 1:-1, 1:-1, :-2],
        ],
        axis=0,
    )


def compose_features(volume: jnp.ndarray) -> jnp.ndarray:
    """11-dim per-voxel features, standardized (predict_svm_rf.py:53-65)."""
    volume = jnp.asarray(volume, jnp.float32)
    vmax = volume.max()
    intensity = make_4d(volume) / vmax
    grad_mag = filter_sobel_separated(make_5d(volume) / vmax).reshape(
        (1,) + volume.shape
    )
    neighbors = get_neighbors6(intensity)
    grids = jnp.meshgrid(
        jnp.arange(volume.shape[0]),
        jnp.arange(volume.shape[1]),
        jnp.arange(volume.shape[2]),
        indexing="ij",
    )
    coords = jnp.stack(grids).astype(jnp.float32)
    coords = (
        coords / jnp.asarray(volume.shape, jnp.float32)[:, None, None, None] - 0.5
    )
    feats = jnp.concatenate([intensity, grad_mag, neighbors, coords], axis=0)
    mean = feats.mean(axis=(-1, -2, -3), keepdims=True)
    std = feats.std(axis=(-1, -2, -3), keepdims=True, ddof=1)
    return (feats - mean) / std


def sample_train_data(
    features: jnp.ndarray, annotations: dict[str, np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """(N, F) features + (N,) class-index labels at annotation voxels.

    Classes are iterated in sorted name order; nearest-sampled from the
    feature grid (predict_svm_rf.py:67-92).
    """
    xs, ys = [], []
    feat_shape = jnp.asarray(features.shape[-3:], jnp.float32)
    for i, name in enumerate(sorted(annotations.keys())):
        ann = jnp.asarray(np.asarray(annotations[name]), jnp.float32)
        rel = (ann + 0.5) / feat_shape * 2.0 - 1.0
        sampled = sample_features3d(features, rel, mode="nearest")[0, 0]
        xs.append(np.asarray(sampled))
        ys.append(np.full(ann.shape[0], i, np.uint8))
    return np.concatenate(xs), np.concatenate(ys)


def sample_background_border(vol_shape, border: int = 4) -> np.ndarray:
    """Border-shell mask for background sampling when no labels exist
    (predict_svm_rf.py:155-158)."""
    m = np.ones(vol_shape, bool)
    m[border:-border, border:-border, border:-border] = False
    return m


def fit_predict_classifier(
    clf, train_X: np.ndarray, train_y: np.ndarray, features_flat: np.ndarray
):
    """Fit + dense predict with the reference's timing capture."""
    t0 = time.time()
    clf.fit(train_X, train_y)
    t1 = time.time()
    pred = clf.predict(features_flat)
    t2 = time.time()
    return pred, {"fit_time": t1 - t0, "predict_time": t2 - t1}


def run_svm_rf(
    volume: np.ndarray,
    annotations: dict[str, np.ndarray],
    labels: np.ndarray | None = None,
    features: np.ndarray | None = None,
    svm_kernel: str = "rbf",
    run_svm: bool = True,
    run_rf: bool = True,
    rf_estimators: int = 1024,
    exclude_bg: bool = False,
) -> dict[str, dict]:
    """Train + densely evaluate the SVM/RF baselines.

    ``features`` defaults to the 11-dim composed features of ``volume``;
    pass DINO features (F, W', H', D') for the --use-dino-features mode
    (labels are then nearest-resized to the feature grid by the caller).

    ``exclude_bg``: the reference's --exclude-bg mode
    (predict_svm_rf.py:192-229): only non-background voxels are predicted
    and scored, GT labels shift down by 1, background voxels in the dense
    prediction volume stay 0.
    """
    from sklearn.ensemble import RandomForestClassifier
    from sklearn.svm import SVC

    if features is None:
        features = compose_features(jnp.asarray(volume))
    features = jnp.asarray(features)
    train_X, train_y = sample_train_data(features, annotations)
    feat_size = features.shape[-3:]
    features_flat = np.asarray(
        jnp.moveaxis(features, 0, -1).reshape(-1, features.shape[0])
    )
    keys = sorted(annotations.keys())

    eval_labels = None if labels is None else np.asarray(labels).reshape(-1)
    non_bg = None
    if exclude_bg:
        if eval_labels is None:
            raise ValueError("exclude_bg requires labels")
        non_bg = eval_labels != 0
        features_flat = features_flat[non_bg]
        eval_labels = eval_labels[non_bg] - 1

    results = {}
    jobs = []
    if run_svm:
        jobs.append(("svm", SVC(kernel=svm_kernel)))
    if run_rf:
        jobs.append(
            ("rf", RandomForestClassifier(n_estimators=rf_estimators, max_features=None))
        )
    for name, clf in jobs:
        pred, times = fit_predict_classifier(clf, train_X, train_y, features_flat)
        if exclude_bg:
            predv = np.zeros(int(np.prod(feat_size)), np.uint8)
            predv[non_bg] = pred
            predv = predv.reshape(feat_size)
        else:
            predv = pred.reshape(feat_size).astype(np.uint8)
        entry = {"pred": predv, **times}
        if eval_labels is not None:
            entry["metrics"] = segmentation_metrics(
                eval_labels, pred, keys, extra=times
            )
        results[name] = entry
    return results
