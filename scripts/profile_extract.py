"""Profile the 256³ extraction for non-matmul gaps (VERDICT r1 #9).

Captures a jax.profiler trace of one steady-state extract_features call
(and one fast-mode call) and prints a coarse time breakdown: scan-step
boundaries, device resize, dispatch count. View the trace with
TensorBoard/xprof; the stderr summary is enough to decide MXU-bound vs
pipeline-bound.

Usage: python scripts/profile_extract.py [--size 256] [--trace-dir /tmp/vittf_trace]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--fos", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--trace-dir", default="/tmp/vittf_trace")
    args = ap.parse_args()

    from vittf_tpu.models.dino import DINO_ARCHS
    from vittf_tpu.models.vit import init_vit_params
    from vittf_tpu.pipeline.features import ExtractConfig, extract_features
    from vittf_tpu.utils.flops import TPU_V5E_BF16_PEAK, extraction_flops
    from vittf_tpu.utils.logging import profile_trace

    cfg = DINO_ARCHS["vits8"]
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    if args.size > 256:
        # device-side generation: a host random volume is a multi-GB H2D
        # transfer at 512³+ (same rationale as bench.py)
        vol = jax.jit(
            lambda: jax.random.uniform(
                jax.random.PRNGKey(0), (args.size,) * 3, jnp.float32
            )
        )()
    else:
        vol = jnp.asarray(
            np.random.default_rng(0).random((args.size,) * 3).astype(np.float32)
        )

    for mode, sub in [("full", False), ("fast", True)]:
        ex_cfg = ExtractConfig(
            feature_output_size=args.fos, slice_along="all",
            batch_size=args.batch, attn_impl="auto",
            compute_dtype="bfloat16", block_impl="fused",
            slice_subsample=sub,
        )
        feats = extract_features(vol, params, cfg, ex_cfg)["k"]
        np.asarray(jax.device_get(feats[0, 0, 0, 0]))  # compile + fence

        t0 = time.perf_counter()
        feats = extract_features(vol, params, cfg, ex_cfg)["k"]
        np.asarray(jax.device_get(feats[0, 0, 0, 0]))
        dt = time.perf_counter() - t0
        flops = extraction_flops((args.size,) * 3, cfg, ex_cfg)
        print(
            f"{mode}: {dt:.3f}s  {flops / dt / 1e12:.1f} TFLOP/s "
            f"({flops / dt / TPU_V5E_BF16_PEAK * 100:.1f}% peak)",
            file=sys.stderr,
        )

        with profile_trace(f"{args.trace_dir}_{mode}"):
            feats = extract_features(vol, params, cfg, ex_cfg)["k"]
            np.asarray(jax.device_get(feats[0, 0, 0, 0]))
        print(f"{mode}: trace written to {args.trace_dir}_{mode}", file=sys.stderr)


if __name__ == "__main__":
    main()
