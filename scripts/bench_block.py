"""Micro-benchmark: 12-block ViT-S stack on the extraction geometry.

Times the fused Pallas block kernel vs the XLA+Pallas-attention path on a
(16, 4097, 384) bf16 batch — the hot shape of 256³ extraction at fos64
(im_sz 512, 64×64 patch tokens + CLS). VERDICT r1 #4 target: ≤ 80 ms for
the fused 12-block stack (was 102 ms).

Usage: python scripts/bench_block.py [--batch 16] [--tokens 4097] [--iters 20]
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
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=4097)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--impls", nargs="*", default=["fused", "rows", "xla"])
    args = ap.parse_args()

    from vittf_tpu.models.dino import DINO_ARCHS
    from vittf_tpu.models.vit import init_vit_params
    from vittf_tpu.utils.flops import TPU_V5E_BF16_PEAK

    cfg = DINO_ARCHS["vits8"]
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    blocks = params["blocks"]
    B, N, D = args.batch, args.tokens, cfg.embed_dim
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, N, D)), jnp.bfloat16
    )

    # analytic stack FLOPs: 12 full blocks (no capture short-circuit here)
    fb = (8 + 4 * cfg.mlp_ratio) * N * D * D + 4 * N * N * D
    flops = cfg.depth * B * fb

    def run_stack(impl):
        if impl != "xla":
            from vittf_tpu.ops.fused_block import fused_block

            kimpl = "rows" if impl.startswith("rows") else "loop"
            smax = "nomax" not in impl
            sdt = "bf16" if impl.endswith("bf16s") else "fp32"

            @jax.jit
            def f(x):
                for i in range(cfg.depth):
                    x = fused_block(
                        x, blocks[i], cfg.num_heads, impl=kimpl,
                        softmax_max=smax, score_dtype=sdt,
                    )
                return x

        else:
            from vittf_tpu.models.vit import _block

            @jax.jit
            def f(x):
                for i in range(cfg.depth):
                    x, _ = _block(x, blocks[i], cfg, "default", "auto")
                return x

        return f

    results = {}
    for impl in args.impls:
        f = run_stack(impl)
        out = f(x)
        np.asarray(jax.device_get(out[0, 0, 0]))  # compile + fence
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(x)
        np.asarray(jax.device_get(out[0, 0, 0]))
        dt = (time.perf_counter() - t0) / args.iters
        tfs = flops / dt / 1e12
        results[impl] = dt
        print(
            f"{impl:>6}: {dt * 1e3:7.2f} ms  {tfs:6.1f} TFLOP/s "
            f"({tfs / (TPU_V5E_BF16_PEAK / 1e12) * 100:4.1f}% peak)"
        )
    if "fused" in results and "xla" in results:
        print(f"fused/xla: {results['fused'] / results['xla']:.3f}")


if __name__ == "__main__":
    main()
