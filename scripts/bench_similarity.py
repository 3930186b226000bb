"""Micro-benchmark: similarity kernel store layout (VERDICT r2 item 7).

Times the fused similarity at the interactive geometry (256³ volume at
fos64 → N = 64³ voxels, F = 384, C classes × 256 annotations) in both
store layouts:

  nc: (BLOCK_N, C) output tiles — C≈5 of 128 lanes used on the store,
      then the pipeline transposes (N, C) → (C, W, H, D)
  cn: (C, BLOCK_N) tiles — lane-dense store, already in volume order

and the end-to-end interactive dispatch (`_similarities_device`: sample →
kernel → quantize → resize) which is what a GUI round trip runs.

Usage: python scripts/bench_similarity.py [--iters 30]
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


def _fence(x):
    np.asarray(jax.device_get(x.ravel()[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--n", type=int, default=64**3)
    ap.add_argument("--f", type=int, default=384)
    ap.add_argument("--classes", type=int, default=5)
    ap.add_argument("--annotations", type=int, default=256)
    args = ap.parse_args()

    from vittf_tpu.ops.similarity import class_mean_matrix, fused_similarity_m

    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((args.n, args.f)).astype(np.float32) * 0.1
    )
    A = args.classes * args.annotations
    qf = jnp.asarray(rng.standard_normal((A, args.f)).astype(np.float32) * 0.1)
    m = jnp.asarray(
        class_mean_matrix([args.annotations] * args.classes, A)
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    results = {}
    for layout in ("nc", "cn"):
        out = fused_similarity_m(feats, qf, m, out_layout=layout)
        _fence(out)  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fused_similarity_m(feats, qf, m, out_layout=layout)
        _fence(out)
        dt = (time.perf_counter() - t0) / args.iters
        results[layout] = dt
        print(f"kernel {layout}: {dt * 1e3:7.3f} ms  (out {out.shape})")

    # end-to-end interactive dispatch (sample → kernel → quantize → resize)
    from vittf_tpu.pipeline.ntf import compute_similarities

    size = round(args.n ** (1 / 3)) * 4
    vol = jax.jit(
        lambda: jax.random.uniform(
            jax.random.PRNGKey(0), (size,) * 3, jnp.float32
        )
    )()
    fvol = feats.T.reshape(args.f, *(round(args.n ** (1 / 3)),) * 3)
    lat = []
    for i in range(10):
        ann = {
            f"c{k}": rng.integers(0, size, (args.annotations, 3)).astype(np.int64)
            for k in range(args.classes)
        }
        t0 = time.perf_counter()
        sims = compute_similarities(vol, fvol, ann)
        int(np.asarray(next(iter(sims.values()))[0, 0, 0]))
        if i:  # first call compiles
            lat.append(time.perf_counter() - t0)
    print(
        f"interactive dispatch p50: {np.median(lat) * 1e3:.1f} ms "
        f"(current default layout)"
    )
    print(f"cn/nc kernel ratio: {results['cn'] / results['nc']:.3f}")


if __name__ == "__main__":
    main()
