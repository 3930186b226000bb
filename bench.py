"""Benchmark: end-to-end feature extraction + similarity on real TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (mirrors BASELINE.json config 5 / sub scripts): a synthetic
BENCH_SIZE³ volume (default 256³), DINO ViT-S/8 (random weights — FLOPs
identical to pretrained), 3-axis sweep at feature-output-size 64, then
fused similarity for 5 classes × 256 annotations each on the feature grid.

value = input voxels / (t_extract + t_similarity) in Mvoxel/s.

vs_baseline: the reference never committed wall-times (BASELINE.md — the
per-run prints were not persisted), so the driver's north star is used as
the denominator: ≥1 Gvoxel/s on v5e-8 ⇒ a single-chip share of 125
Mvoxel/s. vs_baseline = value / 125.

Details (stage times, interactive re-similarity p50) go to stderr.
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    size = int(os.environ.get("BENCH_SIZE", "256"))
    fos = int(os.environ.get("BENCH_FOS", "64"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))

    from vittf_tpu.models.dino import DINO_ARCHS
    from vittf_tpu.models.vit import init_vit_params
    from vittf_tpu.pipeline.features import ExtractConfig, extract_features
    from vittf_tpu.pipeline.ntf import compute_similarities

    log(f"devices: {jax.devices()}")
    cfg = DINO_ARCHS["vits8"]
    params = init_vit_params(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size, size, size)).astype(np.float32))
    ex_cfg = ExtractConfig(
        feature_output_size=fos,
        slice_along="all",
        batch_size=batch,
        precision="default",
        attn_impl="auto",
        compute_dtype="bfloat16",
        # fused Pallas block kernel: same speed-mode numerics contract
        # (bf16 matmuls, fp32 LN/softmax), ~25% faster e2e than the XLA
        # block path (see docs/STATUS.md)
        block_impl="fused",
    )

    # ---- feature extraction (compile warmup, then timed) ----
    t0 = time.perf_counter()
    feats = extract_features(vol, params, cfg, ex_cfg)["k"]
    feats.block_until_ready()
    log(f"extract compile+run: {time.perf_counter() - t0:.2f}s; feats {feats.shape}")

    t0 = time.perf_counter()
    feats = extract_features(vol, params, cfg, ex_cfg)["k"]
    feats.block_until_ready()
    _ = float(feats[0, 0, 0, 0])  # scalar D2H fence
    t_extract = time.perf_counter() - t0
    log(f"extract (full sweep, reference-parity semantics): {t_extract:.3f}s")

    # fast mode: the reference's sketched slice subsampling (opt-in)
    import dataclasses

    fast_cfg = dataclasses.replace(ex_cfg, slice_subsample=True)
    f2 = extract_features(vol, params, cfg, fast_cfg)["k"]
    f2.block_until_ready()
    t0 = time.perf_counter()
    f2 = extract_features(vol, params, cfg, fast_cfg)["k"]
    f2.block_until_ready()
    _ = float(f2[0, 0, 0, 0])  # scalar D2H fence
    t_fast = time.perf_counter() - t0
    log(f"extract (slice-subsample fast mode): {t_fast:.3f}s")

    # ---- similarity: 5 classes × 256 annotations ----
    # NOTE: block_until_ready under-reports on the tunnel transport; fence
    # every timing with a scalar device→host fetch (includes one RTT).
    def fence(sims):
        return int(np.asarray(next(iter(sims.values()))[0, 0, 0]))

    annotations = {
        f"cls{i}": rng.integers(0, size, (256, 3)).astype(np.int64)
        for i in range(5)
    }
    t0 = time.perf_counter()
    sims = compute_similarities(vol, feats, annotations)
    fence(sims)
    log(f"similarity compile+run: {time.perf_counter() - t0:.3f}s")

    t0 = time.perf_counter()
    sims = compute_similarities(vol, feats, annotations)
    fence(sims)
    t_sim = time.perf_counter() - t0
    log(f"similarity: {t_sim:.3f}s; maps: { {k: v.shape for k, v in sims.items()} }")

    # ---- interactive re-similarity p50 (features cached, annotations move) ----
    lat = []
    for _ in range(10):
        ann = {
            f"cls{i}": rng.integers(0, size, (256, 3)).astype(np.int64)
            for i in range(5)
        }
        t0 = time.perf_counter()
        s = compute_similarities(vol, feats, ann)
        fence(s)
        lat.append(time.perf_counter() - t0)
    p50 = float(np.median(lat))
    log(f"interactive re-similarity p50: {p50*1e3:.1f}ms (n=10)")

    voxels = size**3
    mvps = voxels / (t_extract + t_sim) / 1e6
    mvps_fast = voxels / (t_fast + t_sim) / 1e6
    log(
        f"e2e: {voxels/1e6:.1f} Mvoxels in {t_extract + t_sim:.3f}s "
        f"(fast mode: {t_fast + t_sim:.3f}s = {mvps_fast:.2f} Mvoxel/s)"
    )

    print(
        json.dumps(
            {
                "metric": "e2e feature extraction + similarity throughput "
                f"({size}^3 vol, ViT-S/8 fos{fos}, 5x256 annotations, 1 chip); "
                f"re-similarity p50 {p50*1e3:.0f}ms",
                "value": round(mvps, 3),
                "unit": "Mvoxel/s",
                "vs_baseline": round(mvps / 125.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
