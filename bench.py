"""Benchmark: end-to-end feature extraction + similarity on real TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Captured configs (one invocation):
  1. 256³ volume — reference-parity full sweep AND slice-subsample fast
     mode, plus similarity (5×256 annotations) and interactive
     re-similarity p50.
  2. 512³ and 1024³ volumes — fast mode. Quality-validated in
     docs/FASTMODE.md: on the labeled phantom, fast mode's mIoU is equal
     to the full sweep at 2× subsampling and BETTER at 4×/8×/16× (the
     full sweep's slice pooling blurs; picking does not).

All use DINO ViT-S/8 (random weights — FLOPs identical to pretrained),
3-axis sweep at feature-output-size 64, bf16 compute with the fused
Pallas block kernel. value = the largest volume's fast-mode Mvoxel/s;
the metric string carries the full table.

vs_baseline: the reference never committed wall-times (BASELINE.md), so
the driver's north star is the denominator: ≥1 Gvoxel/s on v5e-8 ⇒ a
single-chip share of 125 Mvoxel/s. vs_baseline = value / 125.

Details (stage times, TFLOP/s + MFU vs v5e bf16 peak, p50 latency) go to
stderr. FLOPs are analytic (utils/flops.py) so kernel regressions show
up as MFU drops, not just e2e noise.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _fence_arr(x) -> None:
    """Force completion + one D2H RTT (block_until_ready under-reports on
    the tunnel transport)."""
    np.asarray(jax.device_get(x.ravel()[0]))


def bench_extract(vol, params, cfg, ex_cfg, label, flops):
    from vittf_tpu.pipeline.features import extract_features
    from vittf_tpu.utils.flops import TPU_V5E_BF16_PEAK

    t0 = time.perf_counter()
    feats = extract_features(vol, params, cfg, ex_cfg)["k"]
    _fence_arr(feats)
    log(f"  {label} compile+run: {time.perf_counter() - t0:.2f}s; feats {feats.shape}")

    t0 = time.perf_counter()
    feats = extract_features(vol, params, cfg, ex_cfg)["k"]
    _fence_arr(feats)
    t = time.perf_counter() - t0
    tflops = flops / t / 1e12
    mfu = flops / t / TPU_V5E_BF16_PEAK
    log(
        f"  {label}: {t:.3f}s, {tflops:.1f} TFLOP/s analytic "
        f"({mfu * 100:.1f}% of v5e bf16 peak)"
    )
    return feats, t, mfu


def main():
    # NOTE: do NOT enable jax_compilation_cache_dir here — the axon
    # backend hangs on it (measured: a 256³-only bench stalled >30 min at
    # the first compile with the cache enabled vs ~14 min cold /
    # ~1 min warm without it)
    fos = int(os.environ.get("BENCH_FOS", "64"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    sizes = tuple(
        int(s) for s in os.environ.get("BENCH_SIZES", "256,512,1024").split(",")
    )

    from vittf_tpu.models.dino import DINO_ARCHS
    from vittf_tpu.models.vit import init_vit_params
    from vittf_tpu.pipeline.features import ExtractConfig
    from vittf_tpu.pipeline.ntf import compute_similarities
    from vittf_tpu.utils.flops import extraction_flops

    log(f"devices: {jax.devices()}")
    cfg = DINO_ARCHS["vits8"]
    params = init_vit_params(cfg, jax.random.PRNGKey(0))

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
    fast_cfg = dataclasses.replace(ex_cfg, slice_subsample=True)

    rng = np.random.default_rng(0)
    table = {}

    def fence_sims(sims):
        return int(np.asarray(next(iter(sims.values()))[0, 0, 0]))

    for size in sizes:
        log(f"== {size}^3 ==")
        # volume generated on device: a host random volume is a 4 GB H2D
        # transfer at 1024³ on the tunnel transport
        vol = jax.jit(
            lambda: jax.random.uniform(
                jax.random.PRNGKey(0), (size, size, size), jnp.float32
            )
        )()
        entry = {}

        if size <= 256:
            # reference-parity full sweep (every slice, 3 axes)
            _, t_full, mfu_full = bench_extract(
                vol, params, cfg, ex_cfg, "full sweep",
                extraction_flops((size,) * 3, cfg, ex_cfg),
            )
            entry["full_s"] = t_full
            entry["full_mfu"] = mfu_full

        feats, t_fast, mfu_fast = bench_extract(
            vol, params, cfg, fast_cfg, "fast mode",
            extraction_flops((size,) * 3, cfg, fast_cfg),
        )
        entry["fast_s"] = t_fast
        entry["fast_mfu"] = mfu_fast

        # similarity: 5 classes × 256 annotations
        annotations = {
            f"cls{i}": rng.integers(0, size, (256, 3)).astype(np.int64)
            for i in range(5)
        }
        t0 = time.perf_counter()
        sims = compute_similarities(vol, feats, annotations)
        fence_sims(sims)
        log(f"  similarity compile+run: {time.perf_counter() - t0:.3f}s")
        t0 = time.perf_counter()
        sims = compute_similarities(vol, feats, annotations)
        fence_sims(sims)
        entry["sim_s"] = time.perf_counter() - t0
        log(f"  similarity: {entry['sim_s']:.3f}s")

        voxels = size**3
        if "full_s" in entry:
            entry["mvps_full"] = voxels / (entry["full_s"] + entry["sim_s"]) / 1e6
        entry["mvps_fast"] = voxels / (entry["fast_s"] + entry["sim_s"]) / 1e6
        log(
            f"  e2e fast: {entry['mvps_fast']:.1f} Mvoxel/s"
            + (
                f"; e2e full: {entry['mvps_full']:.2f} Mvoxel/s"
                if "mvps_full" in entry
                else ""
            )
        )
        table[size] = entry

        if size == 256:
            # interactive re-similarity p50 (features cached, annotations move)
            lat = []
            for _ in range(10):
                ann = {
                    f"cls{i}": rng.integers(0, size, (256, 3)).astype(np.int64)
                    for i in range(5)
                }
                t0 = time.perf_counter()
                s = compute_similarities(vol, feats, ann)
                fence_sims(s)
                lat.append(time.perf_counter() - t0)
            table["p50_ms"] = float(np.median(lat)) * 1e3
            log(f"  interactive re-similarity p50: {table['p50_ms']:.1f}ms (n=10)")

    headline_size = max(s for s in sizes)
    value = table[headline_size]["mvps_fast"]
    parts = []
    for size in sizes:
        e = table[size]
        seg = f"{size}^3 fast {e['mvps_fast']:.1f}"
        if "mvps_full" in e:
            seg += f" / parity-full {e['mvps_full']:.2f}"
        parts.append(seg)
    metric = (
        "e2e feature+similarity Mvoxel/s, ViT-S/8 fos64 bf16 fused, 1 chip "
        f"[{'; '.join(parts)}]"
        f"; fast-mode quality: docs/FASTMODE.md"
        + (
            f"; re-sim p50 {table['p50_ms']:.0f}ms"
            if "p50_ms" in table
            else ""
        )
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": "Mvoxel/s",
                "vs_baseline": round(value / 125.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
