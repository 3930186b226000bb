"""Headline-scale timing of refine_similarities_batched (512-cube sim grid).

Reproduces the round-4 measurement (82 s warm / 5 classes, 6.3 s one-class
edit at whole-grid support) with per-stage attribution:
- _prep_boxes_device dispatch + box fetch
- the chunked batched refine dispatches
- worst case (whole-grid support) and organ case (~128-cube support)

Run: python scripts/bench_bls_refine.py [grid_size] [n_classes]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.pipeline.refine import (
    _prep_boxes_device,
    refine_similarities_batched,
)


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timed(label, fn, n=1):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        fence(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {label}: {min(ts):.2f}s" + (f" (min of {n})" if n > 1 else ""),
          flush=True)
    return out


def make_sims(C, sim_shape, support):
    """Random sims with a given support box (crop extent driver)."""

    @jax.jit
    def build(key):
        s = jax.random.uniform(key, (C,) + sim_shape, jnp.float32)
        if support < sim_shape[0]:
            mask = jnp.zeros(sim_shape, jnp.float32)
            mask = mask.at[:support, :support, :support].set(1.0)
            s = s * mask[None]
        return s

    return build(jax.random.PRNGKey(0))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sim_shape = (size,) * 3
    print(f"grid {sim_shape}, chunk budget "
          f"{os.environ.get('VITTF_BLS_CHUNK_VOXELS', '70M default')}",
          flush=True)

    ref_u8 = jax.jit(
        lambda k: (jax.random.uniform(k, sim_shape) * 255).astype(jnp.uint8)
    )(jax.random.PRNGKey(1))
    fence(ref_u8)

    for support, label in ((size // 4, "organ support"),
                           (size, "whole-grid support")):
        print(f"== {label} ({support}^3 crops) ==", flush=True)
        sims = make_sims(C, sim_shape, support)
        fence(sims)

        # stage 1: box pass
        timed("prep_boxes (compile)", lambda: _prep_boxes_device(
            sims, sim_shape, 0.1)[1])
        timed("prep_boxes (warm)", lambda: _prep_boxes_device(
            sims, sim_shape, 0.1)[1], n=2)

        # full path, C classes
        t0 = time.perf_counter()
        out = refine_similarities_batched(sims, None, sim_shape, ref_u8=ref_u8)
        fence(out)
        print(f"  refine C={C} (compile+run): {time.perf_counter()-t0:.1f}s",
              flush=True)
        timed(f"refine C={C} (warm)", lambda: refine_similarities_batched(
            sims, None, sim_shape, ref_u8=ref_u8))

        # one-class edit
        sims1 = sims[:1]
        t0 = time.perf_counter()
        out = refine_similarities_batched(sims1, None, sim_shape, ref_u8=ref_u8)
        fence(out)
        print(f"  refine C=1 (compile+run): {time.perf_counter()-t0:.1f}s",
              flush=True)
        timed("refine C=1 (warm)", lambda: refine_similarities_batched(
            sims1, None, sim_shape, ref_u8=ref_u8), n=2)

        # coarse-to-fine solve (σ-doubled warm start + truncated fine CG)
        c2f = {"coarse_to_fine": True}
        t0 = time.perf_counter()
        out_c = refine_similarities_batched(
            sims, None, sim_shape, ref_u8=ref_u8, bs_params=c2f)
        fence(out_c)
        print(f"  refine C={C} c2f (compile+run): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        timed(f"refine C={C} c2f (warm)", lambda: refine_similarities_batched(
            sims, None, sim_shape, ref_u8=ref_u8, bs_params=c2f))
        out_b = refine_similarities_batched(sims, None, sim_shape, ref_u8=ref_u8)
        d = np.abs(np.asarray(jax.device_get(out_c), np.int32)
                   - np.asarray(jax.device_get(out_b), np.int32))
        print(f"  c2f vs direct uint8: mean {d.mean():.3f} "
              f"frac<=3 {(d <= 3).mean():.5f} max {d.max()}", flush=True)
        timed("refine C=1 c2f (warm)", lambda: refine_similarities_batched(
            sims1, None, sim_shape, ref_u8=ref_u8, bs_params=c2f), n=2)


if __name__ == "__main__":
    main()
