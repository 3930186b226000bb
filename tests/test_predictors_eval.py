"""Tests: annotation samplers, metrics vs sklearn, SVM/RF baselines, query ops."""
import json

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from sklearn.metrics import (
    accuracy_score,
    confusion_matrix as sk_confusion,
    jaccard_score,
    precision_recall_fscore_support,
)

from vittf_tpu.ops.query import resample_topk, take_most_dissimilar
from vittf_tpu.pipeline.annotations import (
    annotations_from_labels,
    sample_both,
    sample_surface,
    sample_uniform,
)
from vittf_tpu.pipeline.baselines import (
    compose_features,
    run_svm_rf,
    sample_background_border,
    sample_train_data,
)
from vittf_tpu.pipeline.evaluate import (
    confusion_matrix,
    evaluate_user_study,
    metrics_from_confusion,
    segmentation_metrics,
)


# ---------- samplers ----------

def _ball_labels(size=24, r2=30):
    z, y, x = np.mgrid[:size, :size, :size]
    lab = np.zeros((size,) * 3, np.uint8)
    lab[(z - 12) ** 2 + (y - 12) ** 2 + (x - 12) ** 2 < r2] = 1
    lab[2:6, 2:6, 2:6] = 2
    return lab


def test_sample_uniform_properties(rng):
    lab = _ball_labels()
    mask = lab == 1
    pts = sample_uniform(mask, 50, rng=rng)
    assert pts.shape == (50, 3)
    assert mask[pts[:, 0], pts[:, 1], pts[:, 2]].all()
    assert len({tuple(p) for p in pts}) == 50  # without replacement


def test_sample_surface_on_shell(rng):
    mask = _ball_labels() == 1
    pts = sample_surface(mask, 40, rng=rng)
    assert pts.shape[0] <= 40 and pts.shape[0] > 0
    assert mask[pts[:, 0], pts[:, 1], pts[:, 2]].all()
    # surface points are near the boundary: all within the eroded band
    center_dist2 = ((pts - 12) ** 2).sum(axis=1)
    assert center_dist2.min() > 4  # not deep inside


def test_samplers_device_equals_host(rng):
    """The device rank-select path must reproduce the host argwhere path
    bit-for-bit: argwhere lists voxels in C order, the device path selects
    the same C-order ranks with the same rng draws."""
    lab = _ball_labels()
    for mask in (lab == 1, lab == 2):
        for fn, kw in (
            (sample_uniform, {}),
            (sample_surface, {"dist_from_surface": 2}),
            (sample_both, {}),
        ):
            host = fn(mask, 30, rng=np.random.default_rng(7), impl="host", **kw)
            dev = fn(mask, 30, rng=np.random.default_rng(7), impl="device", **kw)
            np.testing.assert_array_equal(host, dev)
            assert dev.dtype == host.dtype


def test_annotations_from_labels_device_equals_host():
    lab = _ball_labels()
    for mode in ("uniform", "surface", "both"):
        host = annotations_from_labels(
            lab, 20, mode=mode, rng=np.random.default_rng(3), impl="host"
        )
        dev = annotations_from_labels(
            lab, 20, mode=mode, rng=np.random.default_rng(3), impl="device"
        )
        assert set(host) == set(dev)
        for k in host:
            np.testing.assert_array_equal(host[k], dev[k])


def test_sample_uniform_thinning_device_equals_host(monkeypatch):
    """The >THIN_LIMIT stride-2 thinning rule maps thinned rank r to
    original rank r·2^t — exercised on a small mask by lowering the limit."""
    import vittf_tpu.pipeline.annotations as ann_mod

    monkeypatch.setattr(ann_mod, "THIN_LIMIT", 500)
    lab = _ball_labels(size=32, r2=120)  # ball with >2000 voxels: 3 thinnings
    mask = lab == 1
    assert int(mask.sum()) > 2000
    host = ann_mod.sample_uniform(
        mask, 25, thin_to_reasonable=True,
        rng=np.random.default_rng(11), impl="host",
    )
    dev = ann_mod.sample_uniform(
        mask, 25, thin_to_reasonable=True,
        rng=np.random.default_rng(11), impl="device",
    )
    np.testing.assert_array_equal(host, dev)


def test_sample_both_and_from_labels(rng):
    lab = _ball_labels()
    pts = sample_both(lab == 1, 30, rng=rng)
    assert pts.shape[0] == 30
    ann = annotations_from_labels(lab, 20, mode="uniform", rng=rng)
    assert set(ann) == {"ntf1", "ntf2"}
    assert ann["ntf1"].shape == (20, 3)
    frac = annotations_from_labels(lab, 0.1, mode="uniform", rng=rng)
    assert frac["ntf2"].shape[0] == int(0.1 * (lab == 2).sum())


# ---------- metrics ----------

def test_metrics_match_sklearn(rng):
    y_true = rng.integers(0, 4, 5000)
    y_pred = rng.integers(0, 4, 5000)
    cm = np.asarray(confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 4))
    np.testing.assert_array_equal(cm, sk_confusion(y_true, y_pred))
    m = metrics_from_confusion(jnp.asarray(cm))
    prec, rec, f1, _ = precision_recall_fscore_support(y_true, y_pred, average=None)
    np.testing.assert_allclose(np.asarray(m["precision"]), prec, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m["recall"]), rec, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m["f1"]), f1, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m["iou"]), jaccard_score(y_true, y_pred, average=None), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m["accuracy"]), accuracy_score(y_true, y_pred), rtol=1e-6
    )


def test_metrics_zero_division_matches_sklearn():
    # class 3 never predicted nor true → sklearn precision/recall = 0
    y_true = np.array([0, 0, 1, 1, 2, 2])
    y_pred = np.array([0, 1, 1, 1, 2, 0])
    m = metrics_from_confusion(confusion_matrix(jnp.asarray(y_true), jnp.asarray(y_pred), 4))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        prec, rec, f1, _ = precision_recall_fscore_support(
            y_true, y_pred, average=None, labels=[0, 1, 2, 3]
        )
    np.testing.assert_allclose(np.asarray(m["precision"]), prec, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m["recall"]), rec, rtol=1e-6)


def test_segmentation_metrics_layout():
    y = np.array([0, 1, 1, 0])
    p = np.array([0, 1, 0, 0])
    out = segmentation_metrics(y, p, ["background", "liver"], extra={"fit_time": 1.0})
    assert set(out) >= {
        "mAcc", "precision", "mPrec", "recall", "mRec", "f1", "mF1",
        "iou", "mIoU", "confusion_matrix", "fit_time",
    }
    assert out["precision"].keys() == {"background", "liver"}
    json.dumps(out)  # must be JSON-serializable


def test_evaluate_user_study(tmp_path, rng):
    lab = _ball_labels()
    np.save(tmp_path / "labels.npy", lab)
    preds = {"cls0": (lab == 3).astype(np.uint8)[::2, ::2, ::2]}
    np.save(tmp_path / "predictions.npy", preds)
    meta = {"cls0": {"time": 42.0, "num_annotations": 7}}
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump(meta, f)
    res = evaluate_user_study(tmp_path, tmp_path / "labels.npy", ["lung"])
    assert "lung" in res and res["lung"]["annotation_time"] == 42.0
    assert (tmp_path / "metrics.json").exists()


# ---------- baselines ----------

def test_compose_features_matches_torch(rng):
    vol = rng.random((8, 9, 10)).astype(np.float32) + 0.1
    got = np.asarray(compose_features(jnp.asarray(vol)))
    # torch replica (predict_svm_rf.py:25-65)
    t = torch.from_numpy(vol)
    intensity = t[None] / t.max()
    win = torch.tensor([-0.5, 0, 0.5])[None, None, None, None]
    v5 = t[None, None] / t.max()
    gm = F.conv3d(v5, win, padding=(0, 0, 1)) ** 2
    gm += F.conv3d(v5, win.transpose(3, 4), padding=(0, 1, 0)) ** 2
    gm += F.conv3d(v5, win.transpose(2, 4), padding=(1, 0, 0)) ** 2
    gm = gm.sqrt().squeeze(0)
    pad = F.pad(intensity, (1, 1, 1, 1, 1, 1), mode="replicate")
    nb = torch.cat(
        [
            pad[..., 2:, 1:-1, 1:-1], pad[..., 1:-1, 2:, 1:-1],
            pad[..., 1:-1, 1:-1, 2:], pad[..., :-2, 1:-1, 1:-1],
            pad[..., 1:-1, :-2, 1:-1], pad[..., 1:-1, 1:-1, :-2],
        ],
        dim=0,
    )
    coords = torch.stack(
        torch.meshgrid(*(torch.arange(s) for s in vol.shape), indexing="ij")
    ).float()
    coords = coords / torch.tensor(vol.shape)[..., None, None, None].float() - 0.5
    feats = torch.cat([intensity, gm, nb, coords], dim=0)
    want = (
        (feats - feats.mean(dim=(-1, -2, -3), keepdim=True))
        / feats.std(dim=(-1, -2, -3), keepdim=True)
    ).numpy()
    assert got.shape == (11,) + vol.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_run_svm_rf_on_synthetic(rng):
    lab = _ball_labels(16, r2=20)
    vol = (lab == 1) * 0.8 + (lab == 2) * 0.3 + rng.random(lab.shape) * 0.05
    vol = vol.astype(np.float32)
    ann = {
        "ntf1": sample_uniform(lab == 1, 40, rng=rng),
        "ntf2": sample_uniform(lab == 2, 30, rng=rng),
        "background": sample_uniform(lab == 0, 40, rng=rng),
    }
    res = run_svm_rf(vol, ann, labels=lab_remap(lab), rf_estimators=16)
    for name in ("svm", "rf"):
        assert res[name]["pred"].shape == lab.shape
        assert res[name]["metrics"]["mAcc"] > 0.8  # easy separable problem
        assert "fit_time" in res[name]["metrics"]


def lab_remap(lab):
    """Labels in sorted-key order: background→0, ntf1→1, ntf2→2."""
    return lab  # sorted(['ntf1','ntf2','background']) = [background, ntf1, ntf2]


def test_sample_background_border():
    m = sample_background_border((12, 12, 12), border=4)
    assert m[0, 0, 0] and not m[6, 6, 6]


@pytest.mark.parametrize("kernel", ["rbf", "linear"])
def test_svm_device_predict_matches_sklearn(rng, kernel):
    """Device OvO decision + vote == libsvm's predict (predict_svm_rf.py:209).

    Decision values are validated in float64 against sklearn's ovo
    decision_function (proves the (S, n_pairs) weight construction), then
    the device path must agree with clf.predict except where the smallest
    |decision| is within fp32 noise of a vote flip.
    """
    from sklearn.svm import SVC

    from vittf_tpu.pipeline.baselines import (
        _build_ovo_weights,
        svm_predict_device,
    )

    k, F = 4, 11
    centers = rng.normal(size=(k, F)) * 2.0
    train_X = np.concatenate(
        [centers[i] + rng.normal(size=(60, F)) for i in range(k)]
    ).astype(np.float32)
    train_y = np.repeat(np.arange(k, dtype=np.uint8), 60)
    clf = SVC(kernel=kernel, decision_function_shape="ovo").fit(train_X, train_y)

    X = np.concatenate(
        [centers[rng.integers(0, k, 3000)] + rng.normal(size=(3000, F)) * 1.5]
    ).astype(np.float32)

    # weight-construction exactness (float64, no device in the loop)
    W, b, pair_i, pair_j = _build_ovo_weights(clf)
    if kernel == "rbf":
        d2 = ((X[:, None, :] - clf.support_vectors_[None]) ** 2).sum(-1)
        K = np.exp(-clf._gamma * d2)
    else:
        K = X @ clf.support_vectors_.T
    D = K.astype(np.float64) @ W.astype(np.float64) + b
    np.testing.assert_allclose(
        D, clf.decision_function(X), rtol=1e-4, atol=1e-5
    )

    got = svm_predict_device(clf, X, chunk=1024)
    want = clf.predict(X)
    disagree = got != want
    # fp32 vs float64 may flip votes only on near-zero decisions
    assert disagree.mean() < 5e-3
    if disagree.any():
        assert np.abs(D[disagree]).min(axis=-1).max() < 1e-3


def test_run_svm_rf_device_predict(rng):
    lab = _ball_labels(16, r2=20)
    vol = (lab == 1) * 0.8 + (lab == 2) * 0.3 + rng.random(lab.shape) * 0.05
    ann = {
        "ntf1": sample_uniform(lab == 1, 40, rng=rng),
        "ntf2": sample_uniform(lab == 2, 30, rng=rng),
        "background": sample_uniform(lab == 0, 40, rng=rng),
    }
    res = run_svm_rf(
        vol.astype(np.float32), ann, labels=lab_remap(lab),
        run_rf=False, device_predict=True,
    )
    assert res["svm"]["pred"].shape == lab.shape
    assert res["svm"]["metrics"]["mAcc"] > 0.8


# ---------- query ops ----------

def test_take_most_dissimilar_matches_torch(rng):
    feats = rng.standard_normal((20, 8)).astype(np.float32)
    got = np.asarray(take_most_dissimilar(jnp.asarray(feats), 5, "cosine"))
    t = torch.from_numpy(feats)
    dist = 1 - F.cosine_similarity(t.unsqueeze(0), t.unsqueeze(1), dim=-1).squeeze(0).mean(0)
    _, sel = torch.topk(dist, 5, largest=True, sorted=False)
    want = feats[np.sort(sel.numpy())]
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(want, axis=0), rtol=1e-5)
    # euclidean variant
    got_e = np.asarray(take_most_dissimilar(jnp.asarray(feats), 5, "euclidean"))
    d = torch.cdist(t.unsqueeze(0), t.unsqueeze(0)).squeeze(0).mean(0)
    _, sel_e = torch.topk(d, 5, largest=True, sorted=False)
    np.testing.assert_allclose(
        np.sort(got_e, axis=0), np.sort(feats[sel_e.numpy()], axis=0), rtol=1e-5
    )
    # pass-through when N <= num_prototypes
    assert take_most_dissimilar(jnp.asarray(feats), 50).shape == (20, 8)


def test_resample_topk_matches_torch(rng):
    M, C, A = 1, 2, 3
    F_dim, W, H, D = 6, 5, 6, 7
    feat = (rng.standard_normal((F_dim, W, H, D)) * 0.4).astype(np.float32)
    sims = rng.random((C, A, W, H, D)).astype(np.float32)
    K = 2
    got = np.asarray(
        resample_topk(jnp.asarray(feat), jnp.asarray(sims), K=K,
                      feature_sampling_mode="nearest")
    )
    # torch replica (infer.py:75-106), K<=4 path (same device/dtype)
    tf = torch.from_numpy(feat)[None]
    ts = torch.from_numpy(sims)[None]
    top_ks = []
    for s in ts.reshape(-1, W, H, D):
        kth = torch.topk(s.flatten(), K, largest=True, sorted=True).values[-1]
        top_ks.append((s >= kth).nonzero()[:K])
    top_ks = torch.stack(top_ks).reshape(M, C, A, K, 3)
    rel = (top_ks.float() + 0.5) / torch.tensor([W, H, D]).float() * 2 - 1
    grid = rel.view(M, C, A * K, 3).flip(-1)[:, :, :, None, :]
    qf2 = (
        F.grid_sample(tf, grid, mode="nearest", align_corners=False)
        .squeeze(-1).permute(0, 2, 3, 1)
    ).reshape(M, C, A, K, F_dim)
    want = (
        torch.einsum("mfwhd,mcakf->mcakwhd", tf, qf2).clamp(0, 1) ** 2.0
    ).mean(dim=3).numpy()
    np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-5)
