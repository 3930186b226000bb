"""General (RGB-capable) sparse bilateral solver: native grid + device CG.

The dense path (ops.bilateral) covers the grayscale references this
pipeline produces; for true RGB references the 6-D bilateral lattice is too
large to densify. Here the data-dependent part — hashing pixels to unique
vertices and resolving the ±1 blur neighbors — runs in the native C++
library (vittf_tpu.native.bilateral_grid_build), and the solve runs on
device with static bucketed shapes:

- splat  = segment-sum over vertex ids
- blur   = 2·dim·x + Σ_{d,±} gathered neighbor values (−1 → 0)
- solve  = the same bistochastized Jacobi-PCG as the dense path

Vertex counts are padded to power-of-two buckets so jit caches stay warm
across frames with slightly different sparsity.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.native import bilateral_grid_build
from vittf_tpu.ops.bilateral import BS_PARAMS_DEFAULT, GRID_PARAMS_DEFAULT

# reference bilateral_solver3d.py:11-15
RGB_TO_YUV = np.array(
    [[0.299, 0.587, 0.114],
     [-0.168736, -0.331264, 0.5],
     [0.5, -0.418688, -0.081312]]
)
YUV_OFFSET = np.array([0.0, 128.0, 128.0])


def rgb2yuv(im: np.ndarray) -> np.ndarray:
    """(..., 3) RGB → YUV with the reference's matrix/offset."""
    return np.tensordot(im, RGB_TO_YUV, ([-1], [1])) + YUV_OFFSET


def build_grid(
    reference_rgb: np.ndarray,
    sigma_spatial: int,
    sigma_luma: int,
    sigma_chroma: int,
):
    """(W, H, D, 3) RGB uint8 → (vertex_of_pixel, neighbors, nverts).

    Coordinate construction per reference bilateral_solver3d.py:39-48:
    3 spatial + luma + 2 chroma, integer-truncated after σ division.
    """
    W, H, D = reference_rgb.shape[:3]
    yuv = rgb2yuv(reference_rgb.astype(np.float64))
    gz, gy, gx = np.mgrid[:W, :H, :D]
    coords = np.concatenate(
        [
            (gx / sigma_spatial).astype(np.int32)[..., None],
            (gy / sigma_spatial).astype(np.int32)[..., None],
            (gz / sigma_spatial).astype(np.int32)[..., None],
            (yuv[..., [0]] / sigma_luma).astype(np.int32),
            (yuv[..., 1:] / sigma_chroma).astype(np.int32),
        ],
        axis=-1,
    ).reshape(-1, 6)
    return bilateral_grid_build(coords)


def _bucket(n: int) -> int:
    return 1 << max(4, int(np.ceil(np.log2(n))))


@functools.partial(
    jax.jit,
    static_argnames=("nvert_pad", "dim", "lam", "A_diag_min", "cg_tol",
                     "cg_maxiter", "bistoch_iters"),
)
def _solve_sparse(
    t, c, vid, neighbors, nverts,
    nvert_pad: int, dim: int,
    lam: float, A_diag_min: float, cg_tol: float, cg_maxiter: int,
    bistoch_iters: int = 10,
):
    """t/c: (npix,); vid: (npix,); neighbors: (nvert_pad, dim, 2)."""

    def splat(x):
        return jnp.zeros((nvert_pad,), jnp.float32).at[vid].add(x)

    def blur(x):
        out = 2.0 * dim * x
        for d in range(dim):
            for off in range(2):
                nb = neighbors[:, d, off]
                out = out + jnp.where(nb >= 0, x[jnp.maximum(nb, 0)], 0.0)
        return out

    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (nvert_pad, 1), 0).squeeze(-1)
        < nverts
    )
    m = splat(jnp.ones_like(t))
    occupied = (m > 0) & valid
    n = occupied.astype(jnp.float32)

    def bi_body(_, n):
        bn = blur(n)
        return jnp.where(occupied, jnp.sqrt(n * m / jnp.where(bn > 0, bn, 1.0)), 0.0)

    n = jax.lax.fori_loop(0, bistoch_iters, bi_body, n)
    m = n * blur(n)

    w_splat = splat(c)
    b = splat(t * c)
    y0 = jnp.where(w_splat > 0, b / jnp.where(w_splat > 0, w_splat, 1.0), 0.0)

    def A(y):
        out = lam * (m * y - n * blur(n * y)) + w_splat * y
        return jnp.where(occupied, out, y)

    a_diag = lam * (m - 2.0 * dim * n * n) + w_splat
    a_diag = jnp.where(occupied, jnp.maximum(a_diag, A_diag_min), 1.0)

    yhat, _ = jax.scipy.sparse.linalg.cg(
        A, b, x0=y0, tol=cg_tol, maxiter=cg_maxiter, M=lambda y: y / a_diag
    )
    return jnp.nan_to_num(yhat[vid])


def apply_bilateral_solver3d_rgb(
    t: jnp.ndarray,
    r: np.ndarray,
    c: jnp.ndarray | None = None,
    grid_params: dict | None = None,
    bs_params: dict | None = None,
) -> jnp.ndarray:
    """Reference-signature solver for true RGB references.

    Args:
        t: target (1, W, H, D) or (W, H, D) float in [0, 1]
        r: reference (3, W, H, D) uint8 RGB
        c: optional confidence; defaults to inverted Sobel of r[0]/255
           (reference :229-238)
    """
    from vittf_tpu.ops.morphology import filter_sobel_separated
    from vittf_tpu.utils.tensor import make_5d

    gp = {**GRID_PARAMS_DEFAULT, **(grid_params or {})}
    bs = {**BS_PARAMS_DEFAULT, **(bs_params or {})}
    shape = t.shape[-3:]
    t = jnp.asarray(t).reshape(shape).astype(jnp.float32)
    r = np.asarray(r)
    if c is None:
        sob = filter_sobel_separated(make_5d(jnp.asarray(r[0], jnp.float32) / 255.0))
        sob = sob.reshape(shape)
        c = sob.max() - sob
    else:
        c = jnp.asarray(c).reshape(shape).astype(jnp.float32)

    rgb = np.moveaxis(r, 0, -1)  # (W, H, D, 3)
    vid, neighbors, nverts = build_grid(
        rgb, int(gp["sigma_spatial"]), int(gp["sigma_luma"]), int(gp["sigma_chroma"])
    )
    nvert_pad = _bucket(nverts)
    nb_pad = np.full((nvert_pad, 6, 2), -1, np.int32)
    nb_pad[:nverts] = neighbors

    out = _solve_sparse(
        t.reshape(-1), c.reshape(-1),
        jnp.asarray(vid), jnp.asarray(nb_pad), jnp.asarray(nverts),
        nvert_pad, 6,
        float(bs["lam"]), float(bs["A_diag_min"]),
        float(bs["cg_tol"]), int(bs["cg_maxiter"]),
    )
    return out.reshape(shape)
