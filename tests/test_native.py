"""Native library tests: build, CC parity vs scipy, grid builder parity,
RGB sparse solver vs a float64 sparse oracle."""
import numpy as np
import pytest
import scipy.ndimage as ndi
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from vittf_tpu import native
from vittf_tpu.ops.bilateral_sparse import (
    apply_bilateral_solver3d_rgb,
    build_grid,
    rgb2yuv,
)


def test_native_library_builds():
    assert native.available(), "g++ build of native/vittf_native.cpp failed"


def test_cc3d_label_vs_scipy(rng):
    mask = rng.random((15, 14, 13)) > 0.7
    labels, n = native.cc3d_label(mask)
    want, n_want = ndi.label(mask, structure=ndi.generate_binary_structure(3, 1))
    assert n == n_want
    fg = want > 0
    pairs = set(zip(labels[fg].tolist(), want[fg].tolist()))
    assert len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})
    assert (labels[~fg] == 0).all()


def test_cc3d_largest(rng):
    mask = np.zeros((10, 10, 10), bool)
    mask[0:5, 0:5, 0:5] = True
    mask[8:10, 8:10, 8:10] = True
    out = native.cc3d_largest(mask)
    assert out.sum() == 125 and out[1, 1, 1] and not out[9, 9, 9]


def test_grid_build_matches_numpy_fallback(rng):
    coords = rng.integers(0, 9, (500, 6)).astype(np.int32)
    vop_n, nb_n, n_n = native.bilateral_grid_build(coords)
    # numpy fallback result (force by calling the fallback path directly)
    uniq, inverse = np.unique(coords, axis=0, return_inverse=True)
    assert n_n == len(uniq)
    # vertex numbering may differ; compare via pixel partitions and
    # neighbor structure counts
    pairs = set(zip(vop_n.tolist(), inverse.tolist()))
    assert len(pairs) == len({p[0] for p in pairs}) == len({p[1] for p in pairs})
    # neighbor existence counts must match
    lookup = {tuple(c): i for i, c in enumerate(uniq)}
    count_want = 0
    for c in uniq:
        for d in range(6):
            for off in (-1, 1):
                nb = list(c)
                nb[d] += off
                if tuple(nb) in lookup:
                    count_want += 1
    assert (nb_n >= 0).sum() == count_want


class RgbSparseOracle:
    """float64 scipy.sparse bilateral solver for RGB references."""

    def __init__(self, rgb, sigma_spatial, sigma_luma, sigma_chroma):
        W, H, D = rgb.shape[:3]
        yuv = rgb2yuv(rgb.astype(np.float64))
        gz, gy, gx = np.mgrid[:W, :H, :D]
        coords = np.concatenate(
            [
                (gx / sigma_spatial).astype(int)[..., None],
                (gy / sigma_spatial).astype(int)[..., None],
                (gz / sigma_spatial).astype(int)[..., None],
                (yuv[..., [0]] / sigma_luma).astype(int),
                (yuv[..., 1:] / sigma_chroma).astype(int),
            ],
            axis=-1,
        ).reshape(-1, 6)
        self.dim = 6
        self.npixels = coords.shape[0]
        uniq, inverse = np.unique(coords, axis=0, return_inverse=True)
        self.nvertices = len(uniq)
        self.S = sp.csr_matrix(
            (np.ones(self.npixels), (inverse, np.arange(self.npixels)))
        )
        lookup = {tuple(c): i for i, c in enumerate(uniq)}
        rows, cols = [], []
        for i, c in enumerate(uniq):
            for d in range(self.dim):
                for off in (-1, 1):
                    nb = list(c)
                    nb[d] += off
                    j = lookup.get(tuple(nb))
                    if j is not None:
                        rows.append(i)
                        cols.append(j)
        self.blur_mat = 2 * self.dim * sp.eye(self.nvertices) + sp.csr_matrix(
            (np.ones(len(rows)), (rows, cols)),
            shape=(self.nvertices, self.nvertices),
        )

    def solve(self, t, c, lam=256.0, A_diag_min=1e-5, cg_tol=1e-5, cg_maxiter=25):
        m = self.S @ np.ones(self.npixels)
        n = np.ones(self.nvertices)
        for _ in range(10):
            n = np.sqrt(n * m / (self.blur_mat @ n))
        m = n * (self.blur_mat @ n)
        Dn = sp.diags(n)
        A = lam * (sp.diags(m) - Dn @ self.blur_mat @ Dn) + sp.diags(self.S @ c)
        b = self.S @ (t * c)
        y0 = b / np.maximum(self.S @ c, 1e-30)
        M = sp.diags(1.0 / np.maximum(A.diagonal(), A_diag_min))
        y, _ = spla.cg(A, b, x0=y0, M=M, maxiter=cg_maxiter, rtol=cg_tol)
        return self.S.T @ y


def test_sparse_solver_bucket_reuse(rng):
    """Slightly different vertex counts land in the same power-of-two bucket
    and must reuse the jitted solver (no shape error, consistent outputs)."""
    import jax.numpy as jnp

    W, H, D = 8, 8, 8
    t = (rng.random((W, H, D)) > 0.5).astype(np.float32)
    c = np.full((W, H, D), 0.9, np.float32)
    outs = []
    for seed in (0, 1):
        r = (np.random.default_rng(seed).integers(0, 4, (3, W, H, D)) * 64).astype(np.uint8)
        out = apply_bilateral_solver3d_rgb(
            jnp.asarray(t), r, jnp.asarray(c),
            grid_params={"sigma_spatial": 3, "sigma_luma": 32, "sigma_chroma": 32},
        )
        outs.append(np.asarray(out))
    assert all(np.isfinite(o).all() for o in outs)
    assert outs[0].shape == outs[1].shape == (W, H, D)


def test_rgb_sparse_solver_vs_oracle(rng):
    import jax.numpy as jnp

    W, H, D = 10, 9, 8
    rgb = rng.integers(0, 256, (3, W, H, D)).astype(np.uint8)
    # quantize colors so vertices get some occupancy
    rgb = (rgb // 64) * 64
    t = (rng.random((W, H, D)) > 0.6).astype(np.float64)
    c = rng.random((W, H, D)) * 0.5 + 0.4

    got = np.asarray(
        apply_bilateral_solver3d_rgb(
            jnp.asarray(t, jnp.float32), rgb, jnp.asarray(c, jnp.float32),
            grid_params={"sigma_spatial": 3, "sigma_luma": 16, "sigma_chroma": 16},
        )
    )
    oracle = RgbSparseOracle(
        np.moveaxis(rgb, 0, -1), sigma_spatial=3, sigma_luma=16, sigma_chroma=16
    )
    want = oracle.solve(t.reshape(-1), c.reshape(-1)).reshape(W, H, D)
    assert np.abs(got - want).max() < 5e-3
    assert np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1] > 0.999
