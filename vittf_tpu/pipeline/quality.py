"""Fast-mode quality experiment: full sweep vs slice-subsample IoU.

The reference's headline is segmentation quality (IoU 0.981,
plot_performance.py:64); its sketched-but-unfinished fast idea is running
the ViT only on the slices nearest the pooled output grid
(infer.py:160-166, commented out). This module measures what that fast
mode costs in quality: the full NTF pipeline (features → similarity →
fuse → IoU) is run on a labeled synthetic phantom with identical
annotations under both extraction modes and the per-class IoUs are
compared. See docs/FASTMODE.md for committed results.
"""
from __future__ import annotations

import time
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.pipeline.annotations import annotations_from_labels
from vittf_tpu.pipeline.evaluate import segmentation_metrics
from vittf_tpu.pipeline.features import ExtractConfig, extract_features
from vittf_tpu.pipeline.ntf import (
    compute_similarities,
    fuse_predictions,
    upscale_prediction,
)


def ntf_predict(
    vol: np.ndarray,
    params: dict,
    model_cfg,
    ex_cfg: ExtractConfig,
    annotations: dict[str, np.ndarray],
    fuse_thresholds: list[float] | None = None,
) -> tuple[np.ndarray, dict[str, float]]:
    """Features → similarities → fused label volume, with stage timings.

    Returns (pred labels at full volume resolution, {stage: seconds}).
    Timings are for the steady state: each stage runs once for compile
    warmup, then once timed, fenced by a device→host fetch.
    """
    vol_j = jnp.asarray(vol, jnp.float32)

    def timed(fn, fence):
        """compile+warmup, then timed run fenced by a SCALAR device→host
        fetch — fetching full volumes would time the tunnel transport, not
        the computation."""
        fn()
        t0 = time.perf_counter()
        out = fn()
        fence(out)
        return out, time.perf_counter() - t0

    feats, t_extract = timed(
        lambda: extract_features(vol_j, params, model_cfg, ex_cfg)["k"],
        lambda f: float(np.asarray(jax.device_get(f[0, 0, 0, 0]))),
    )
    sims, t_sim = timed(
        lambda: compute_similarities(vol_j, feats, annotations),
        lambda s: int(np.asarray(next(iter(s.values()))[0, 0, 0])),
    )
    thresholds = (
        fuse_thresholds
        if fuse_thresholds is not None
        else [0.25] * len(sims)
    )
    pred = fuse_predictions(sims, thresholds)
    pred = np.asarray(upscale_prediction(pred, vol.shape))
    return pred, {"extract_s": t_extract, "similarity_s": t_sim}


def _sample_background(
    labels: np.ndarray, n: int, rng: np.random.Generator
) -> np.ndarray:
    """Uniform background voxels by rejection sampling.

    ``sample_uniform(labels == 0, ...)`` materializes argwhere over the
    whole background (~21 GB of int64 coords at 1024³); background covers
    most of the phantom, so drawing random voxels and keeping the
    label-0 ones converges in one or two rounds at any size.
    """
    out: list[np.ndarray] = []
    got = 0
    while got < n:
        cand = np.stack(
            [rng.integers(0, s, 4 * n) for s in labels.shape], axis=1
        )
        keep = cand[labels[cand[:, 0], cand[:, 1], cand[:, 2]] == 0]
        out.append(keep[: n - got])
        got += len(out[-1])
    return np.concatenate(out)


def fastmode_quality_experiment(
    size: int,
    params: dict,
    model_cfg,
    base_cfg: ExtractConfig,
    n_annotations: int = 256,
    seed: int = 0,
) -> dict:
    """Run full-sweep vs fast-mode NTF on the multi-class phantom.

    Returns {mode: {"mIoU", "iou", "extract_s", "similarity_s",
    "mvoxel_s"}} plus the shared experiment metadata. Identical
    annotations are used for both modes, so the IoU delta isolates the
    extraction-mode effect.
    """
    from vittf_tpu.core.synthetic import make_multiclass_volume

    vol, labels = make_multiclass_volume(size, seed=seed)
    rng = np.random.default_rng(seed)
    annotations = annotations_from_labels(labels, n_annotations, "both", rng=rng)
    # explicit background class LAST (the reference's user-study sessions
    # annotate background too — evaluate_similarities.py label2idx): voxels
    # fused to it are relabeled 0 so the background has a competitor
    n_fg = len(annotations)
    annotations["bg"] = _sample_background(
        np.asarray(labels), n_annotations, rng
    )
    names = ["background"] + [k for k in annotations if k != "bg"]

    out: dict = {
        "size": size,
        "n_annotations": n_annotations,
        "classes": [k for k in annotations if k != "bg"],
    }
    for mode, cfg in [
        ("full", replace(base_cfg, slice_subsample=False)),
        ("fast", replace(base_cfg, slice_subsample=True)),
    ]:
        pred, times = ntf_predict(vol, params, model_cfg, cfg, annotations)
        pred = np.where(pred == n_fg + 1, 0, pred)  # bg class → label 0
        m = segmentation_metrics(labels, pred, names)
        fg_iou = {k: v for k, v in m["iou"].items() if k != "background"}
        total_s = times["extract_s"] + times["similarity_s"]
        out[mode] = {
            "mIoU_fg": float(np.mean(list(fg_iou.values()))),
            "iou": fg_iou,
            "accuracy": m["mAcc"],
            **times,
            "mvoxel_s": size**3 / total_s / 1e6,
        }
    out["iou_delta"] = out["full"]["mIoU_fg"] - out["fast"]["mIoU_fg"]
    out["speedup"] = (
        out["full"]["extract_s"] / out["fast"]["extract_s"]
    )
    return out
