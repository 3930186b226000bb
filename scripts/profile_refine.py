"""Trace one warm headline-scale BLS refine and write an xplane profile.

Captures `refine_similarities_batched` (C classes, whole-grid support,
512^3 sim grid by default) in the steady state, for per-op attribution
via scripts/analyze_trace.py — the VERDICT-r5 question is where the
1.63 s one-class-edit wall time lives (solve kernels vs crop/sobel/
quantize overhead).

Usage: python scripts/profile_refine.py [size] [C] [trace_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.pipeline.refine import refine_similarities_batched
from vittf_tpu.utils.logging import profile_trace


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    trace_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/vittf_trace_refine"
    sim_shape = (size,) * 3

    sims = jax.jit(
        lambda k: jax.random.uniform(k, (C,) + sim_shape, jnp.float32)
    )(jax.random.PRNGKey(0))
    ref_u8 = jax.jit(
        lambda k: (jax.random.uniform(k, sim_shape) * 255).astype(jnp.uint8)
    )(jax.random.PRNGKey(1))
    fence((sims, ref_u8))

    # compile + warm
    out = refine_similarities_batched(sims, None, sim_shape, ref_u8=ref_u8)
    fence(out)
    t0 = time.perf_counter()
    out = refine_similarities_batched(sims, None, sim_shape, ref_u8=ref_u8)
    fence(out)
    print(f"warm refine C={C} @{size}^3: {time.perf_counter()-t0:.2f}s",
          flush=True)

    with profile_trace(trace_dir):
        out = refine_similarities_batched(sims, None, sim_shape, ref_u8=ref_u8)
        fence(out)
    print(f"trace written to {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
