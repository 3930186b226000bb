"""Bench: dense SVM prediction on device vs the reference's CPU number.

The reference's committed metrics (metrics/svm_8096both.json) record a
dense per-voxel SVC(rbf) predict of 14393 s per CT-ORG volume on CPU
(predict_svm_rf.py:209-212). `svm_predict_device` evaluates the identical
libsvm one-vs-one decision function as one jitted TPU dispatch; this
script measures it at a given volume size on the matching setup (11-dim
composed features, 8096 'both'-sampled annotations + background, 6
classes) and reports voxels/s plus a local-CPU sklearn rate on a
subsample for an apples-to-apples machine-local comparison.

Usage: python scripts/bench_svm_device.py [--size 256] [--num-samples 8096]
       [--cpu-sample 200000]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--num-samples", type=int, default=8096)
    ap.add_argument("--sampling-mode", default="both")
    ap.add_argument("--cpu-sample", type=int, default=200_000,
                    help="voxels for the local sklearn CPU rate estimate"
                         " (0 disables)")
    ap.add_argument("--chunk", type=int, default=1 << 16)
    ap.add_argument("--noise", type=float, default=0.05,
                    help="phantom noise; higher -> overlapping classes ->"
                         " realistically large support-vector sets")
    args = ap.parse_args()

    from sklearn.svm import SVC

    from vittf_tpu.core.runtime import enable_compilation_cache
    from vittf_tpu.core.synthetic import make_multiclass_volume
    from vittf_tpu.pipeline.annotations import (
        SAMPLING_MODES,
        annotations_from_labels,
    )
    from vittf_tpu.pipeline.baselines import (
        compose_features,
        sample_train_data,
        svm_predict_device,
    )

    enable_compilation_cache()
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    s = args.size
    vol, labels = make_multiclass_volume(s, noise=args.noise, seed=0)
    n_vox = vol.size
    print(f"phantom {vol.shape}, {labels.max()} fg classes, {n_vox/1e6:.1f} Mvoxel")

    annotations = annotations_from_labels(
        labels, args.num_samples, args.sampling_mode, rng=rng
    )
    bg_n = max(v.shape[0] for v in annotations.values())
    annotations["background"] = SAMPLING_MODES[args.sampling_mode](
        labels == 0, bg_n, rng=rng
    )

    feats = compose_features(jnp.asarray(vol))
    train_X, train_y = sample_train_data(feats, annotations)
    print(f"train set: {train_X.shape}, classes {np.unique(train_y)}")

    clf = SVC(kernel="rbf")
    t0 = time.time()
    clf.fit(train_X, train_y)
    fit_time = time.time() - t0
    n_sv = clf.support_vectors_.shape[0]
    print(f"fit: {fit_time:.2f}s on CPU (reference: 4.27s); {n_sv} SVs")

    flat_dev = jnp.moveaxis(feats, 0, -1).reshape(-1, feats.shape[0])
    features_flat = np.asarray(flat_dev)

    # local CPU rate on a subsample (full-volume sklearn would take hours)
    cpu_rate = None
    if args.cpu_sample:
        sub = features_flat[
            rng.choice(n_vox, min(args.cpu_sample, n_vox), replace=False)
        ]
        t0 = time.time()
        cpu_pred_sub = clf.predict(sub)
        cpu_dt = time.time() - t0
        cpu_rate = sub.shape[0] / cpu_dt
        est_full = n_vox / cpu_rate
        print(f"CPU sklearn: {sub.shape[0]} voxels in {cpu_dt:.1f}s = "
              f"{cpu_rate:,.0f} voxel/s -> est. {est_full:,.0f}s for the "
              f"full {s}^3 volume")

    # device: cold (compile) then warm; features stay device-resident, so
    # warm time = kernel tiles + the uint8 prediction D2H (the reference's
    # 14393 s likewise starts from in-memory features)
    t0 = time.time()
    pred = svm_predict_device(clf, flat_dev, chunk=args.chunk)
    cold = time.time() - t0
    t0 = time.time()
    pred = svm_predict_device(clf, flat_dev, chunk=args.chunk)
    warm = time.time() - t0
    dev_rate = n_vox / warm
    print(f"device: cold {cold:.2f}s, warm {warm:.2f}s = {dev_rate/1e6:.1f} "
          f"Mvoxel/s ({n_sv} SVs, {len(clf.classes_)} classes)")

    # sanity: device prediction agrees with sklearn on the CPU subsample
    agree = None
    if args.cpu_sample:
        dev_sub = svm_predict_device(clf, sub, chunk=args.chunk)
        agree = float((dev_sub == cpu_pred_sub).mean())
        print(f"device vs sklearn agreement on subsample: {agree:.6f}")

    out = {
        "size": s,
        "n_voxels": int(n_vox),
        "n_sv": int(n_sv),
        "fit_time_s": fit_time,
        "device_warm_s": warm,
        "device_voxel_per_s": dev_rate,
        "cpu_voxel_per_s": cpu_rate,
        "speedup_vs_local_cpu": (dev_rate / cpu_rate) if cpu_rate else None,
        "agreement": agree,
        "reference_predict_time_s": 14393.0,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
