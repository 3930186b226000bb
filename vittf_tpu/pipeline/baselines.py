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
from functools import partial

import jax
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
    clf,
    train_X: np.ndarray,
    train_y: np.ndarray,
    features_flat: np.ndarray,
    device_predict: bool = False,
):
    """Fit + dense predict with the reference's timing capture.

    ``device_predict`` routes the dense SVC prediction through the TPU
    decision-function evaluation (``svm_predict_device``); fit stays
    sklearn/libsvm (seconds — the reference's pathology is the dense
    predict, 14393 s/volume in metrics/svm_8096both.json, not the fit).
    """
    t0 = time.time()
    clf.fit(train_X, train_y)
    t1 = time.time()
    if device_predict:
        pred = svm_predict_device(clf, features_flat)
        pred = np.asarray(jax.block_until_ready(pred))
    else:
        pred = clf.predict(features_flat)
    t2 = time.time()
    return pred, {"fit_time": t1 - t0, "predict_time": t2 - t1}


def _build_ovo_weights(clf) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """libsvm one-vs-one decision as a single (S, n_pairs) matrix.

    For the pair (i, j), i<j, the decision is a linear functional of the
    kernel row K(x, ·): support vectors of class i contribute their
    ``dual_coef_[j-1]`` entries, those of class j their ``dual_coef_[i]``
    entries (sklearn's compressed OvO layout), plus ``intercept_``.
    Returns (W, b, pair_i, pair_j) with pairs in libsvm/intercept_ order
    (0,1), (0,2), …, (1,2), …
    """
    k = len(clf.classes_)
    n_sv = clf.support_vectors_.shape[0]
    starts = np.concatenate([[0], np.cumsum(clf.n_support_)])
    n_pairs = k * (k - 1) // 2
    W = np.zeros((n_sv, n_pairs), np.float32)
    pair_i = np.empty(n_pairs, np.int32)
    pair_j = np.empty(n_pairs, np.int32)
    p = 0
    for i in range(k):
        for j in range(i + 1, k):
            W[starts[i] : starts[i + 1], p] = clf.dual_coef_[
                j - 1, starts[i] : starts[i + 1]
            ]
            W[starts[j] : starts[j + 1], p] = clf.dual_coef_[
                i, starts[j] : starts[j + 1]
            ]
            pair_i[p], pair_j[p] = i, j
            p += 1
    return W, clf.intercept_.astype(np.float32), pair_i, pair_j


def _resolve_gamma(clf) -> float:
    """RBF gamma from the fitted classifier, failing loudly.

    libsvm's effective gamma lives in the private ``_gamma``; if sklearn
    ever renames it, fall back to the public ``gamma`` semantics
    ('auto' = 1/n_features, numeric = itself). 'scale' depends on the
    training data's variance, which sklearn does not retain — raise
    instead of silently predicting with exp(0)=1 kernels (a constant
    single-class collapse)."""
    g = getattr(clf, "_gamma", None)
    if g is not None:
        return float(g)
    if isinstance(clf.gamma, (int, float)):
        return float(clf.gamma)
    if clf.gamma == "auto":
        return 1.0 / clf.n_features_in_
    raise AttributeError(
        "cannot resolve the fitted RBF gamma: clf._gamma is missing and "
        f"gamma={clf.gamma!r} depends on training-data statistics"
    )


@partial(jax.jit, static_argnames=("kernel", "n_classes", "chunk"))
def _svm_votes_device(x, sv, W, b, pair_i, pair_j, gamma, *, kernel, n_classes, chunk):
    """One dispatch: kernel tile → OvO decisions → votes → argmax.

    ``x`` is pre-padded to a multiple of ``chunk``; ``lax.map`` keeps the
    working set at one (chunk, S) kernel tile so arbitrary volumes fit HBM.
    Both matmuls run at HIGHEST precision — RBF distances lose catastrophic
    relative precision in bf16 and this op is MXU-saturated regardless.
    """
    sv_sq = (sv * sv).sum(-1)

    def chunk_fn(xc):
        xs = jnp.dot(xc, sv.T, precision=jax.lax.Precision.HIGHEST)
        if kernel == "rbf":
            d2 = (xc * xc).sum(-1)[:, None] - 2.0 * xs + sv_sq[None, :]
            K = jnp.exp(-gamma * jnp.maximum(d2, 0.0))
        else:  # linear
            K = xs
        D = jnp.dot(K, W, precision=jax.lax.Precision.HIGHEST) + b[None, :]
        winners = jnp.where(D > 0, pair_i[None, :], pair_j[None, :])
        votes = (winners[:, :, None] == jnp.arange(n_classes)[None, None, :]).sum(1)
        # libsvm breaks vote ties toward the lowest class index; argmax matches
        return jnp.argmax(votes, axis=-1).astype(jnp.uint8)

    return jax.lax.map(chunk_fn, x.reshape(-1, chunk, x.shape[-1]))


def svm_predict_device(
    clf, features_flat: np.ndarray, chunk: int = 1 << 16
) -> np.ndarray:
    """Dense SVC prediction on device — the reference's 14393 s CPU predict
    (predict_svm_rf.py:209-212, metrics/svm_8096both.json /predict_time) as
    one jitted TPU dispatch over (chunk, n_SV) kernel tiles.

    Reproduces libsvm's one-vs-one vote exactly (up to fp32 vs float64 in
    decision values; vote flips require a decision within ~1e-5 of zero).
    Supports kernel='rbf' (reference default) and 'linear'.
    """
    kernel = clf.kernel
    if kernel not in ("rbf", "linear"):
        raise ValueError(f"device predict supports rbf/linear, got {kernel}")
    W, b, pair_i, pair_j = _build_ovo_weights(clf)
    n = features_flat.shape[0]
    # keep the (chunk, n_SV) fp32 kernel tile under ~1 GB of HBM, and
    # round DOWN to a power of two so distinct volume sizes reuse ONE
    # compiled kernel (padding absorbs the remainder) instead of
    # recompiling per input size
    tile_cap = (1 << 30) // max(1, 4 * clf.support_vectors_.shape[0])
    chunk = max(1024, min(chunk, tile_cap))
    chunk = 1 << (chunk.bit_length() - 1)
    common = (
        jnp.asarray(clf.support_vectors_, jnp.float32),
        jnp.asarray(W),
        jnp.asarray(b),
        jnp.asarray(pair_i),
        jnp.asarray(pair_j),
        jnp.float32(_resolve_gamma(clf) if kernel == "rbf" else 0.0),
    )
    kw = dict(kernel=kernel, n_classes=len(clf.classes_), chunk=chunk)

    if isinstance(features_flat, jnp.ndarray):
        x = features_flat.astype(jnp.float32)  # stays device-resident
        n_pad = (-n) % chunk
        if n_pad:
            x = jnp.pad(x, ((0, n_pad), (0, 0)))
        idx = _svm_votes_device(x, *common, **kw)
        return np.asarray(clf.classes_)[np.asarray(idx).reshape(-1)[:n]]

    # host input: stream chunk-sized slices to device instead of
    # materializing the full padded (N, F) fp32 matrix in HBM (≈6 GB at
    # 512³ — the docstring's "fits HBM" claim then holds for the INPUT,
    # not just the kernel tile)
    x_host = np.ascontiguousarray(features_flat, np.float32)
    out = np.empty(n, np.uint8)
    for i in range(0, n, chunk):
        xc = x_host[i : i + chunk]
        if xc.shape[0] < chunk:
            xc = np.concatenate(
                [xc, np.zeros((chunk - xc.shape[0], xc.shape[1]), np.float32)]
            )
        idx = _svm_votes_device(jnp.asarray(xc), *common, **kw)
        out[i : i + chunk] = np.asarray(idx).reshape(-1)[: min(chunk, n - i)]
    return np.asarray(clf.classes_)[out]


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
    device_predict: bool = False,
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
        on_device = (
            device_predict and name == "svm" and svm_kernel in ("rbf", "linear")
        )
        pred, times = fit_predict_classifier(
            clf, train_X, train_y, features_flat, device_predict=on_device
        )
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
