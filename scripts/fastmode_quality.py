"""Measure fast-mode (slice-subsample) quality vs the full sweep on TPU.

Runs the complete NTF pipeline (extract → similarity → fuse → IoU) on the
multi-class synthetic phantom at one or more volume sizes, with identical
annotations per size, and prints a JSON table. The slice-subsample factor
is size/feature_output_size (e.g. 4× at 256³/fos64, 8× at 512³).

Usage:  python scripts/fastmode_quality.py [--sizes 128 256] [--fos 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--fos", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--annotations", type=int, default=256)
    ap.add_argument("--block-impl", default="fused")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    from vittf_tpu.models.dino import DINO_ARCHS
    from vittf_tpu.models.vit import init_vit_params
    from vittf_tpu.pipeline.features import ExtractConfig
    from vittf_tpu.pipeline.quality import fastmode_quality_experiment

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = DINO_ARCHS["vits8"]
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    ex_cfg = ExtractConfig(
        feature_output_size=args.fos,
        slice_along="all",
        batch_size=args.batch,
        attn_impl="auto",
        compute_dtype="bfloat16",
        block_impl=args.block_impl,
    )

    results = []
    for size in args.sizes:
        r = fastmode_quality_experiment(
            size, params, cfg, ex_cfg, n_annotations=args.annotations
        )
        r["subsample_factor"] = size / args.fos
        results.append(r)
        print(
            f"{size}^3 (subsample {r['subsample_factor']:.0f}x): "
            f"full mIoU {r['full']['mIoU_fg']:.4f} @ "
            f"{r['full']['mvoxel_s']:.1f} Mvox/s | "
            f"fast mIoU {r['fast']['mIoU_fg']:.4f} @ "
            f"{r['fast']['mvoxel_s']:.1f} Mvox/s | "
            f"delta {r['iou_delta']:+.4f}, extract speedup "
            f"{r['speedup']:.1f}x",
            file=sys.stderr,
        )

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
