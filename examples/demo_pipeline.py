"""End-to-end demo: the reference's old/cluster_dino.py flow, TPU-native.

Synthetic volume → (cached) ViT features → annotation sampling → similarity
maps → top-K resampling → bilateral refinement → IoU — with per-stage
timings. Run:

    python examples/demo_pipeline.py [--size 64] [--out /tmp/vittf_demo]
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--out", type=Path, default=Path("/tmp/vittf_demo"))
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vittf_tpu.core.io import load_features, save_features
    from vittf_tpu.core.synthetic import make_synthetic_volumes
    from vittf_tpu.models.dino import resolve_model
    from vittf_tpu.models.vit import init_vit_params
    from vittf_tpu.ops.query import resample_topk
    from vittf_tpu.pipeline.annotations import sample_both
    from vittf_tpu.pipeline.evaluate import confusion_matrix, metrics_from_confusion
    from vittf_tpu.pipeline.features import ExtractConfig, extract_features
    from vittf_tpu.pipeline.ntf import compute_similarities
    from vittf_tpu.utils.timer import StageTimings

    args.out.mkdir(parents=True, exist_ok=True)
    timings = StageTimings()
    rng = np.random.default_rng(0)

    vol, label = make_synthetic_volumes(size=args.size, noise=0.1)["sphere_filled"]
    vol = vol.astype(np.float32)

    cfg = resolve_model("vits8")
    cache = args.out / "demo_features.npy"
    if cache.exists():
        feats = jnp.asarray(load_features(cache))
        print(f"Loaded cached features {feats.shape}")
    else:
        params = init_vit_params(cfg, jax.random.PRNGKey(0))
        with timings.stage("extract"):
            feats = extract_features(
                jnp.asarray(vol), params, cfg,
                ExtractConfig(feature_output_size=16, batch_size=8,
                              compute_dtype="bfloat16"),
            )["k"]
            feats.block_until_ready()
        save_features(cache, {"k": feats})
        print(f"Extracted features {feats.shape} in {timings['extract']:.2f}s")

    annotations = {"sphere": sample_both(label > 0, 64, rng=rng)}
    with timings.stage("similarity"):
        sims = compute_similarities(jnp.asarray(vol), feats, annotations)
        jax.block_until_ready(sims)
    print(f"Similarity in {timings['similarity']*1e3:.1f}ms")

    with timings.stage("refined"):
        sims_bls = compute_similarities(
            jnp.asarray(vol), feats, annotations, bilateral_solver=True
        )
        jax.block_until_ready(sims_bls)
    print(f"Refined similarity in {timings['refined']*1e3:.1f}ms")

    # top-K bootstrap on the raw similarity map
    sim_f = (jnp.asarray(sims["sphere"], jnp.float32) / 255.0)[None, None]
    sim_boot = resample_topk(feats, jnp.broadcast_to(sim_f, (1, 1) + sim_f.shape[-3:]))

    # IoU of thresholded refined map vs ground truth (on the half-res grid)
    from vittf_tpu.ops.resize import resize_nearest

    gt = np.asarray(resize_nearest(jnp.asarray(label), sims_bls["sphere"].shape)) > 0
    pred = np.asarray(sims_bls["sphere"]) > 128
    cm = confusion_matrix(
        jnp.asarray(gt.reshape(-1).astype(np.int32)),
        jnp.asarray(pred.reshape(-1).astype(np.int32)), 2,
    )
    iou = float(np.asarray(metrics_from_confusion(cm)["iou"])[1])
    print(f"Sphere IoU (refined, random weights): {iou:.3f}")
    print("Timings:", timings.to_json())
    return 0


if __name__ == "__main__":
    sys.exit(main())
