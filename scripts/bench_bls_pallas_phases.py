"""Phase-level timing of the PALLAS bilateral-solve path at large crops.

The scan-path phase bench (bench_bls_phases.py) attributed the pre-Pallas
cost; this one times the one-HBM-pass kernels that now carry headline-scale
refinement (ops/bilateral.py pixel_impl='pallas'): rank-3 reblock, splat,
bistochastization, CG A-applies, slice, unreblock, and the full solve.
Run: python scripts/bench_bls_pallas_phases.py [size ...]
"""
from __future__ import annotations

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.bilateral import (
    _blur,
    _grid_extents,
    _reblock3d_pallas,
    _slice_pallas,
    _splat_pallas,
    _unreblock3d_pallas,
    bilateral_solve_gray,
)


def fence(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def timeit(fn, *args, n=3, label=""):
    out = fn(*args)
    fence(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        fence(out)
        ts.append(time.perf_counter() - t0)
    print(f"  {label}: {min(ts)*1e3:.1f} ms (min of {n})", flush=True)
    return out, min(ts)


def main():
    sizes = [int(s) for s in (sys.argv[1:] or ["256", "512"])]
    ss, sl = 7, 5
    for size in sizes:
        shape = (size,) * 3
        ext = _grid_extents(shape, ss, sl)
        sp_ext, L = ext[:-1], ext[-1]
        n_cells = int(np.prod(sp_ext))
        nverts = int(np.prod(ext))
        print(
            f"== {size}^3 crop: lattice {ext} = {nverts/1e6:.1f}M verts, "
            f"{n_cells/1e3:.0f}k cells, L={L}, G={ss}",
            flush=True,
        )
        key = jax.random.PRNGKey(0)
        t = jax.jit(lambda k: jax.random.uniform(k, shape))(key)
        luma = jax.jit(
            lambda k: jax.random.uniform(k, shape, maxval=255.0)
        )(jax.random.PRNGKey(1))
        c = jax.jit(lambda k: jax.random.uniform(k, shape))(jax.random.PRNGKey(2))
        fence((t, luma, c))

        reblock = jax.jit(
            functools.partial(_reblock3d_pallas, ss=ss, sp_ext=sp_ext, fill=-1)
        )
        il_b, _ = timeit(
            reblock, (luma / sl).astype(jnp.int32), label="reblock3d (1 array)"
        )

        @jax.jit
        def splat(il_b, t, c):
            return _splat_pallas(
                il_b,
                _reblock3d_pallas(c, ss, sp_ext),
                _reblock3d_pallas(t * c, ss, sp_ext),
                L, groups=ss,
            ).reshape(3, nverts)

        splat_out, _ = timeit(splat, il_b, t, c, label="splat (2 reblocks + kernel)")

        kernel_only = jax.jit(
            functools.partial(_splat_pallas, L=L, groups=ss)
        )
        cb = _reblock3d_pallas(c, ss, sp_ext)
        tcb = _reblock3d_pallas(t * c, ss, sp_ext)
        fence((cb, tcb))
        timeit(kernel_only, il_b, cb, tcb, label="splat kernel only")

        m = splat_out[0]

        @jax.jit
        def bistoch(m):
            occupied = m > 0
            n = occupied.astype(jnp.float32)

            def body(_, n):
                bn = _blur(n.reshape(ext)).reshape(-1)
                return jnp.where(
                    occupied, jnp.sqrt(n * m / jnp.where(bn > 0, bn, 1.0)), 0.0
                )

            n = jax.lax.fori_loop(0, 10, body, n)
            return n, n * _blur(n.reshape(ext)).reshape(-1)

        (n_arr, m_b), _ = timeit(bistoch, m, label="bistoch (10 blurs)")

        w_splat, b = splat_out[1], splat_out[2]

        @jax.jit
        def cg_like(n_arr, m_b, w_splat, b):
            occupied = m_b > 0

            def A(y):
                smooth = m_b * y - n_arr * _blur(
                    (n_arr * y).reshape(ext)
                ).reshape(-1)
                return jnp.where(occupied, 256.0 * smooth + w_splat * y, y)

            def body(_, y):
                return A(y) * 0.5 + b * 1e-3

            return jax.lax.fori_loop(0, 25, body, b)

        timeit(cg_like, n_arr, m_b, w_splat, b, label="25 A-applies")

        slice_k = jax.jit(
            functools.partial(_slice_pallas, L=L, groups=ss)
        )
        yl = b.reshape(n_cells, L)
        sliced, _ = timeit(slice_k, il_b, yl, label="slice kernel only")

        unreblock = jax.jit(
            functools.partial(_unreblock3d_pallas, ss=ss, sp_ext=sp_ext, shape=shape)
        )
        timeit(unreblock, sliced, label="unreblock3d")

        solve = functools.partial(
            bilateral_solve_gray, sigma_spatial=ss, sigma_luma=sl,
            pixel_impl="pallas",
        )
        timeit(solve, t, luma, c, n=2, label="FULL solve (pallas)")


if __name__ == "__main__":
    main()
