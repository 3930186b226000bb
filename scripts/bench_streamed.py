"""Time host-streamed extraction at past-HBM scale (VERDICT r2 item 8).

Builds a host uint8 volume (2048³ = 8 GB by default — past what a 16 GB
chip can hold next to its slice stacks), streams it through
`extract_features_streamed` in fast mode, and reports wall time +
Mvoxel/s. The reference's only route at this scale is offline
downsampling (conversion/halfZ.py); this is the direct route.

Usage: python scripts/bench_streamed.py [--size 2048] [--fos 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--fos", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--chunk-batches", type=int, default=4)
    ap.add_argument("--full", action="store_true",
                    help="full sweep instead of fast mode (every slice "
                         "streams through — far more H2D traffic)")
    args = ap.parse_args()

    from vittf_tpu.models.dino import DINO_ARCHS
    from vittf_tpu.models.vit import init_vit_params
    from vittf_tpu.pipeline.features import ExtractConfig
    from vittf_tpu.pipeline.streamed import extract_features_streamed

    print(f"devices: {jax.devices()}", file=sys.stderr)
    cfg = DINO_ARCHS["vits8"]
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    ex_cfg = ExtractConfig(
        feature_output_size=args.fos,
        slice_along="all",
        batch_size=args.batch,
        attn_impl="auto",
        compute_dtype="bfloat16",
        block_impl="fused",
        slice_subsample=not args.full,
    )

    t0 = time.time()
    # deterministic stripes instead of rng.integers: filling 8 GB from a
    # PRNG takes minutes on the host and adds nothing to the measurement
    vol = np.empty((args.size,) * 3, np.uint8)
    plane = (
        np.add.outer(np.arange(args.size), np.arange(args.size)) % 251
    ).astype(np.uint8)
    vol[:] = plane[None]
    print(
        f"host volume built: {vol.nbytes / 2**30:.1f} GiB "
        f"in {time.time() - t0:.1f}s",
        file=sys.stderr,
    )

    t0 = time.time()
    feats = extract_features_streamed(
        vol, params, cfg, ex_cfg, chunk_batches=args.chunk_batches
    )["k"]
    np.asarray(jax.device_get(feats.ravel()[0]))  # fence
    dt = time.time() - t0
    mode = "full" if args.full else "fast"
    print(
        f"{args.size}^3 uint8 streamed {mode} (cold, incl. compile): "
        f"{dt:.1f}s = {args.size**3 / dt / 1e6:.1f} Mvoxel/s; "
        f"feats {feats.shape}"
    )

    t0 = time.time()
    feats = extract_features_streamed(
        vol, params, cfg, ex_cfg, chunk_batches=args.chunk_batches
    )["k"]
    np.asarray(jax.device_get(feats.ravel()[0]))
    dt = time.time() - t0
    print(
        f"{args.size}^3 uint8 streamed {mode} (warm): "
        f"{dt:.1f}s = {args.size**3 / dt / 1e6:.1f} Mvoxel/s"
    )


if __name__ == "__main__":
    main()
