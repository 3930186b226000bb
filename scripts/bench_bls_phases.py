"""Phase-level timing of the dense bilateral solve at large crop sizes.

Times each stage of ops/bilateral.py::bilateral_solve_gray separately
(blocked-view build, splat scan, bistochastization, CG, slice scan) plus
the full solve, to attribute the headline-scale (512-cube sim grid) cost
before optimizing. Run: python scripts/bench_bls_phases.py [size ...]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.bilateral import (
    _blocked_pixel_view,
    _blur,
    _grid_extents,
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
            f"{n_cells/1e3:.0f}k cells, L={L}, block {ss**3}",
            flush=True,
        )
        key = jax.random.PRNGKey(0)
        t = jax.jit(lambda k: jax.random.uniform(k, shape))(key)
        luma = jax.jit(
            lambda k: jax.random.uniform(k, shape, maxval=255.0)
        )(jax.random.PRNGKey(1))
        c = jax.jit(lambda k: jax.random.uniform(k, shape))(jax.random.PRNGKey(2))
        fence((t, luma, c))

        # 1. blocked view build (pad + transpose), one array
        bv = jax.jit(
            functools.partial(_blocked_pixel_view, ss=ss, sp_ext=sp_ext)
        )
        il_b, _ = timeit(
            bv, (luma / sl).astype(jnp.int32), label="blocked view (1 array)"
        )

        # 2. splat scan: count + 2 value planes over L bins
        @jax.jit
        def splat3(il_b, t, c):
            vals = jnp.stack([
                _blocked_pixel_view(c, ss, sp_ext),
                _blocked_pixel_view(t * c, ss, sp_ext),
            ])
            vals = jax.lax.optimization_barrier(vals)

            def bin_body(_, l):
                mask = (il_b == l).astype(jnp.float32)
                return _, jnp.concatenate(
                    [mask.sum(-1)[None], (vals * mask[None]).sum(-1)]
                )

            _, per_bin = jax.lax.scan(bin_body, None, jnp.arange(L))
            return per_bin.transpose(1, 2, 0).reshape(3, nverts)

        (splat_out), _ = timeit(splat3, il_b, t, c, label="splat3 scan")

        # 3. bistochastization: 10 blur fixed-point iterations
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

        # 4. CG: 25 A-applies (emulated with fori_loop of A)
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

        # 5. slice scan
        @jax.jit
        def slice_scan(il_b, y_vert):
            yl = y_vert.reshape(n_cells, L)

            def bin_body(acc, l):
                sel = jax.lax.dynamic_slice_in_dim(yl, l, 1, axis=1)
                return jnp.where(il_b == l, sel, acc), None

            out, _ = jax.lax.scan(
                bin_body, jnp.zeros_like(il_b, jnp.float32), jnp.arange(L)
            )
            return out

        timeit(slice_scan, il_b, b, label="slice scan")

        # 6. the real full solve
        solve = functools.partial(
            bilateral_solve_gray, sigma_spatial=ss, sigma_luma=sl
        )
        timeit(solve, t, luma, c, n=2, label="FULL bilateral_solve_gray")


if __name__ == "__main__":
    main()
