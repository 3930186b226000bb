"""NTF predictor CLI — the reference ``predict_ntf.py`` command surface.

    python -m vittf_tpu.cli.predict_ntf --data DIR [--bilateral-solver]
        [--num-samples N] [--sampling-mode both]

Reproduces the reference's artifact flow (predict_ntf.py:104-256): volume +
labels z-flips, largest-features selection, synthetic annotation sampling
from GT, per-class similarity (auto-splitting when ΣA > 10000), per-class
threshold + max-sim fusion, ``ntf_pred{...}.npy`` + ``ntf_metrics{...}.json``.
"""
from __future__ import annotations

import json
import sys
import time
from argparse import ArgumentParser
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def build_parser() -> ArgumentParser:
    p = ArgumentParser("Predict segmentation from NTF similarity maps")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--bilateral-solver", action="store_true")
    p.add_argument("--load-sims", action="store_true")
    p.add_argument("--num-samples", type=float, default=0.0)
    p.add_argument("--sampling-mode", type=str,
                   choices=["uniform", "surface", "both"], default="both")
    p.add_argument("--impl", type=str, default="auto",
                   choices=["auto", "pallas", "xla"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--largest-island", action="store_true",
        help="keep only each class's largest connected similarity island "
             "before fusion (reference cc_torch post-filter, "
             "tests/test_connected_components.py:26-61)",
    )
    p.add_argument("--island-threshold", type=int, default=69,
                   help="uint8 threshold defining islands (default 69)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from vittf_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from vittf_tpu.core.io import ArtifactDir, load_features
    from vittf_tpu.pipeline.annotations import annotations_from_labels
    from vittf_tpu.pipeline.evaluate import segmentation_metrics
    from vittf_tpu.pipeline.ntf import (
        CT_ORG_THRESHOLDS,
        compute_similarities,
        fuse_predictions,
        upscale_prediction,
    )

    d = Path(args.data)
    ad = ArtifactDir(d)
    if args.num_samples == 0.0:
        args.sampling_mode = "annotated"
    bls_str = "bls" if args.bilateral_solver else ""
    isl_str = "isl" if args.largest_island else ""
    suffix = f"{args.num_samples}{args.sampling_mode}{bls_str}{isl_str}"
    out_pred = d / f"ntf_pred{suffix}.npy"
    if out_pred.exists():
        print(f"Already inferred NTF preds for {d} ({suffix})")
        return 0

    volume = np.flip(ad.volume(), axis=-3).copy()
    labels = ad.labels()
    if labels is not None:
        labels = np.flip(labels, axis=-3).copy()
    features = load_features(ad.features_path())

    if args.num_samples == 0.0:
        annotations = ad.annotations()
    else:
        if labels is None:
            raise ValueError("Cannot sample annotations without labels.npy")
        annotations = annotations_from_labels(
            labels, args.num_samples, args.sampling_mode,
            rng=np.random.default_rng(args.seed),
        )

    t0 = time.time()
    vol_j = jnp.asarray(volume)
    feat_j = jnp.asarray(features)
    t1 = time.time()
    if args.load_sims:
        similarities = {
            k: jnp.asarray(v) for k, v in ad.similarities().items()
        }
        t2 = t1
    else:
        total = sum(int(v.shape[0]) for v in annotations.values())
        t1 = time.time()
        if total > 10000:
            # per-class computation (predict_ntf.py:185-188)
            similarities = {
                k: compute_similarities(
                    vol_j, feat_j, {k: v},
                    bilateral_solver=args.bilateral_solver, impl=args.impl,
                )[k]
                for k, v in annotations.items()
            }
        else:
            similarities = compute_similarities(
                vol_j, feat_j, annotations,
                bilateral_solver=args.bilateral_solver, impl=args.impl,
            )
        t2 = time.time()

    if args.largest_island:
        from vittf_tpu.ops.connected import filter_similarity_largest_island

        similarities = {
            k: filter_similarity_largest_island(v, args.island_threshold)
            for k, v in similarities.items()
        }
    pred = fuse_predictions(similarities, CT_ORG_THRESHOLDS)
    pred_np = np.asarray(pred).astype(np.uint8)
    np.save(out_pred, pred_np)
    pred_full = np.asarray(upscale_prediction(pred, volume.shape))
    print("Pred:", pred_full.shape, pred_full.min(), pred_full.max())
    print("NTF fit time:", t1 - t0)
    print("NTF predict time:", t2 - t1)

    if labels is None:
        return 0
    label_names = ["background"] + list(annotations.keys())
    metrics = segmentation_metrics(
        labels.reshape(-1), pred_full.reshape(-1), label_names,
        extra={"fit_time": t1 - t0, "predict_time": t2 - t1},
    )
    print(json.dumps(metrics, indent=2))
    with open(d / f"ntf_metrics{suffix}.json", "w") as f:
        json.dump(metrics, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
