"""Per-stage device timing of the batched BLS refinement.

Times, at interactive bench geometry (default 256³ volume → 128³ sim
grid, bucketed crop), the pieces of refine_similarities_batched:

  e2e     the full classic path (2 round trips)
  prep    _prep_boxes_device (cast + resize + boxes)
  solve   _refine_batched_device (crop → sobel → vmapped solve → writeback)
          for BOTH pixel_impls (scan vs scatter A/B)
  micros  per-op device cost of splat/slice/blur, RTT-free (the op looped
          N× inside one jit with a data dependency)

Findings that shaped ops/bilateral.py::bilateral_solve_gray (v5e, 96³
crop): scatter-add splat 9.1 ms and gather slice 7.8 ms vs 1.8 / 1.5 ms
for the blockwise bin-scan forms; and without the optimization_barriers
the blocked views re-materialize inside the bin scans every iteration
(632 ms for a C=5 128³-crop batched solve vs 85 ms with them).
Reference hot path: predict_ntf.py:73-96.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.core.synthetic import make_multiclass_volume
from vittf_tpu.ops.bilateral import _blur, _vertex_ids
from vittf_tpu.pipeline.refine import (
    _prep_boxes_device,
    _refine_batched_device,
    make_bls_reference,
    refine_similarities_batched,
)


def timeit_fetch(fn, n=5):
    """Wall time including the sync fetch (what an interactive frame pays)."""
    out = fn()
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def timeit_op(body, n=20):
    """RTT-free per-iteration device time: body looped inside one jit.

    ``body(i)`` must return a scalar that depends on the op's output and
    on ``i`` (so XLA can't hoist it out of the loop)."""

    @jax.jit
    def run():
        return jax.lax.fori_loop(
            0, n, lambda i, acc: acc + body(i), jnp.float32(0)
        )

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) * 1e3 / n


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sim_shape = (size // 2,) * 3
    vol, _ = make_multiclass_volume(size, seed=0)
    rng = np.random.default_rng(0)
    # synthetic sims with a realistic support box (~70% extent per dim)
    sims = np.zeros((C,) + sim_shape, np.float32)
    e = int(sim_shape[0] * 0.7)
    for c in range(C):
        sims[c, :e, :e, :e] = rng.random((e, e, e), np.float32)
    sims_d = jnp.asarray(sims)
    ref_u8 = make_bls_reference(jnp.asarray(vol), sim_shape)
    jax.block_until_ready(ref_u8)

    t_e2e = timeit_fetch(
        lambda: refine_similarities_batched(
            sims_d, vol, sim_shape, ref_u8=ref_u8, speculative=False
        )
    )
    print(f"e2e refine_similarities_batched C={C}: {t_e2e:.1f} ms")

    t_prep = timeit_fetch(lambda: _prep_boxes_device(sims_d, sim_shape, 0.1))
    print(f"  prep (cast+resize+boxes):        {t_prep:.1f} ms")

    # reproduce the classic path's crop geometry
    sims_r, boxes_d, ne_d = _prep_boxes_device(sims_d, sim_shape, 0.1)
    boxes, ne = jax.device_get((boxes_d, ne_d))
    boxes, ne = np.asarray(boxes), np.asarray(ne) > 0
    mi = np.clip(boxes[:, 0] - 2, 0, None)
    ma = np.minimum(boxes[:, 1] + 2, np.asarray(sim_shape))
    ext = np.max((ma - mi)[ne], axis=0)
    ext = tuple(int(x) for x in np.minimum(-(-ext // 8) * 8, sim_shape))
    starts = jnp.asarray(
        np.minimum(mi, np.asarray(sim_shape) - ext).astype(np.int32)
    )
    t_scan = timeit_fetch(
        lambda: _refine_batched_device(
            sims_r, ref_u8, starts, ext,
            sigma_spatial=7, sigma_luma=5, lam=256.0, cg_maxiter=25,
        )
    )
    print(f"  batched solve, pixel_impl=scan    (crop {ext}): {t_scan:.1f} ms")

    t_scatter = timeit_fetch(
        lambda: _refine_batched_device(
            sims_r, ref_u8, starts, ext,
            sigma_spatial=7, sigma_luma=5, lam=256.0, cg_maxiter=25,
            pixel_impl="scatter",
        )
    )
    print(f"  batched solve, pixel_impl=scatter (crop {ext}): {t_scatter:.1f} ms")

    # ---- RTT-free micros at the crop geometry ----
    crop = tuple(ext)
    luma = jnp.asarray(rng.integers(0, 256, crop).astype(np.float32))
    t = jnp.asarray(rng.random(crop, np.float32))
    c = jnp.asarray(rng.random(crop, np.float32))
    vid, lat_ext = _vertex_ids(crop, luma, 7, 5)
    nverts = int(np.prod(lat_ext))
    vid_flat = vid.reshape(-1)
    print(f"  lattice extents {lat_ext} = {nverts} verts; "
          f"pixels {int(np.prod(crop))}")

    ms = timeit_op(
        lambda i: jnp.zeros((nverts,), jnp.float32)
        .at[vid_flat].add((t * c + i).reshape(-1))[0]
    )
    print(f"  splat x1 scatter-add:            {ms:.2f} ms")
    y = jnp.asarray(rng.random((nverts,), np.float32))
    ms = timeit_op(lambda i: (y + i)[vid_flat].sum())
    print(f"  slice x1 gather:                 {ms:.2f} ms")
    ms = timeit_op(
        lambda i: _blur((y + i).reshape(lat_ext)).reshape(-1)[0]
    )
    print(f"  blur x1 lattice:                 {ms:.2f} ms")


if __name__ == "__main__":
    main()
