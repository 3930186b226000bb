"""Bilateral solver parity: dense TPU grid vs an independent sparse oracle.

The oracle below implements the Barron-Poole bilateral grid/solver with
scipy.sparse (float64), structured the way the reference uses it (6-D
coords incl. constant chroma, [1 0 1] blurs, 10 bistochastization
iterations, Jacobi-PCG). Operator-level checks (filter) are tight; the CG
solve check is looser (f32 25-iteration CG vs f64).
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from vittf_tpu.ops.bilateral import (
    apply_bilateral_solver2d,
    apply_bilateral_solver3d,
    bilateral_filter_gray,
    bilateral_solve_gray,
)
from vittf_tpu.pipeline.refine import refine_similarity


class SparseOracle:
    """Independent sparse bilateral grid for grayscale 3D volumes."""

    def __init__(self, luma, sigma_spatial, sigma_luma, sigma_chroma=5):
        W, H, D = luma.shape
        gz, gy, gx = np.mgrid[:W, :H, :D]
        coords = np.stack(
            [
                (gx / sigma_spatial).astype(int),
                (gy / sigma_spatial).astype(int),
                (gz / sigma_spatial).astype(int),
                (luma.astype(float) / sigma_luma).astype(int),
                (np.full_like(luma, 128.0) / sigma_chroma).astype(int),
                (np.full_like(luma, 128.0) / sigma_chroma).astype(int),
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
        self.blurs = []
        for d in range(self.dim):
            rows, cols = [], []
            for off in (-1, 1):
                for i, c in enumerate(uniq):
                    nb = list(c)
                    nb[d] += off
                    j = lookup.get(tuple(nb))
                    if j is not None:
                        rows.append(i)
                        cols.append(j)
            self.blurs.append(
                sp.csr_matrix(
                    (np.ones(len(rows)), (rows, cols)),
                    shape=(self.nvertices, self.nvertices),
                )
            )

    def splat(self, x):
        return self.S @ x

    def slice(self, y):
        return self.S.T @ y

    def blur(self, x):
        out = 2 * self.dim * x
        for b in self.blurs:
            out = out + b @ x
        return out

    def filter(self, x):
        ones = np.ones_like(x)
        return self.slice(self.blur(self.splat(x))) / self.slice(
            self.blur(self.splat(ones))
        )

    def solve(self, t, c, lam=256.0, A_diag_min=1e-5, cg_tol=1e-5, cg_maxiter=25):
        m = self.splat(np.ones(self.npixels))
        n = np.ones(self.nvertices)
        for _ in range(10):
            n = np.sqrt(n * m / self.blur(n))
        m = n * self.blur(n)
        Dm, Dn = sp.diags(m), sp.diags(n)
        blur_mat = 2 * self.dim * sp.eye(self.nvertices)
        for b in self.blurs:
            blur_mat = blur_mat + b
        A_smooth = Dm - Dn @ blur_mat @ Dn
        w_splat = self.splat(c)
        A = lam * A_smooth + sp.diags(w_splat)
        b = self.splat(t * c)
        y0 = b / np.maximum(w_splat, 1e-30)
        M = sp.diags(1.0 / np.maximum(A.diagonal(), A_diag_min))
        y, _ = spla.cg(A, b, x0=y0, M=M, maxiter=cg_maxiter, rtol=cg_tol)
        return self.slice(y)


@pytest.fixture(scope="module")
def gray_volume():
    rng = np.random.default_rng(7)
    z, y, x = np.mgrid[:14, :12, :10]
    base = 120 + 80 * ((z - 7) ** 2 + (y - 6) ** 2 + (x - 5) ** 2 < 20)
    noisy = base + rng.normal(0, 6, base.shape)
    return np.clip(noisy, 0, 255).astype(np.uint8)


def test_filter_parity_with_sparse_oracle(gray_volume):
    rng = np.random.default_rng(1)
    x = rng.random(gray_volume.shape).astype(np.float64)
    oracle = SparseOracle(gray_volume, sigma_spatial=4, sigma_luma=8)
    want = oracle.filter(x.reshape(-1)).reshape(gray_volume.shape)
    got = np.asarray(
        bilateral_filter_gray(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(gray_volume, jnp.float32),
            sigma_spatial=4,
            sigma_luma=8,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_solve_parity_with_sparse_oracle(gray_volume):
    rng = np.random.default_rng(2)
    t = (gray_volume > 150).astype(np.float64) * 0.9 + 0.05
    c = rng.random(gray_volume.shape).astype(np.float64) * 0.5 + 0.4
    oracle = SparseOracle(gray_volume, sigma_spatial=4, sigma_luma=8)
    want = oracle.solve(t.reshape(-1), c.reshape(-1)).reshape(gray_volume.shape)
    got = np.asarray(
        bilateral_solve_gray(
            jnp.asarray(t, jnp.float32),
            jnp.asarray(gray_volume, jnp.float32),
            jnp.asarray(c, jnp.float32),
            sigma_spatial=4,
            sigma_luma=8,
        )
    )
    # f32 25-iter CG vs f64: loose but meaningful bound
    assert np.abs(got - want).max() < 5e-3
    assert np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1] > 0.999


def test_apply_bilateral_solver3d_smoothing_behavior(gray_volume):
    """Edge-aware smoothing: solved target follows reference edges."""
    t = (gray_volume > 150).astype(np.float32)
    rng = np.random.default_rng(3)
    t_noisy = np.clip(t + rng.normal(0, 0.3, t.shape).astype(np.float32), 0, 1)
    r = np.broadcast_to(gray_volume[None], (3,) + gray_volume.shape)
    out = np.asarray(
        apply_bilateral_solver3d(
            jnp.asarray(t_noisy[None]),
            jnp.asarray(r),
            grid_params={"sigma_spatial": 4, "sigma_luma": 8},
        )
    )
    assert out.shape == gray_volume.shape
    assert np.isfinite(out).all()
    # refined map should be closer to the clean target than the noisy input
    assert np.abs(out - t).mean() < np.abs(t_noisy - t).mean()


def test_apply_bilateral_solver2d(gray_volume):
    """2D path: 5-D blur dim, constant confidence, island post-filter."""
    img = gray_volume[:, :, 5].astype(np.float32)  # (14, 12) grayscale slice
    t = (img > 150).astype(np.float32)
    binary, solved = apply_bilateral_solver2d(
        jnp.asarray(t[None]), jnp.asarray(img[None]),
        grid_params={"sigma_spatial": 3, "sigma_luma": 8},
    )
    assert solved.shape == img.shape and binary.shape == img.shape
    assert np.isfinite(np.asarray(solved)).all()
    assert set(np.unique(np.asarray(binary))) <= {0.0, 1.0}
    # the bright blob should survive as the single largest island
    assert np.asarray(binary)[np.asarray(t) > 0.5].mean() > 0.5


def test_refine_similarity_shapes(gray_volume):
    rng = np.random.default_rng(4)
    vol = rng.random((20, 24, 16)).astype(np.float32)
    sim = np.zeros((10, 12, 8), np.float32)
    sim[3:7, 4:9, 2:6] = rng.random((4, 5, 4)).astype(np.float32)
    out = np.asarray(
        refine_similarity(jnp.asarray(sim), jnp.asarray(vol), (10, 12, 8))
    )
    assert out.shape == (10, 12, 8)
    assert np.isfinite(out).all()


def test_refine_similarity_shape_bucket(gray_volume):
    """Bucketed crops: multiple-of-bucket extents, close to the tight-box
    result, and stable crop shapes across slightly different supports."""
    from vittf_tpu.pipeline.refine import _bucket_box

    rng = np.random.default_rng(5)
    vol = rng.random((24, 24, 24)).astype(np.float32)
    sim = np.zeros((12, 12, 12), np.float32)
    sim[3:8, 3:9, 2:7] = rng.random((5, 6, 5)).astype(np.float32)
    tight = np.asarray(
        refine_similarity(jnp.asarray(sim), jnp.asarray(vol), (12, 12, 12))
    )
    bucketed = np.asarray(
        refine_similarity(
            jnp.asarray(sim), jnp.asarray(vol), (12, 12, 12), shape_bucket=4
        )
    )
    assert bucketed.shape == tight.shape
    assert np.isfinite(bucketed).all()
    # box helper: extents become multiples of the bucket, inside the shape
    mi, ma = _bucket_box(
        (np.array([3, 3, 2]), np.array([10, 11, 9])), (12, 12, 12), 4
    )
    assert (((ma - mi) % 4) == 0).all()
    assert (mi >= 0).all() and (ma <= 12).all()


def test_scan_pixel_impl_matches_scatter(gray_volume):
    """The blockwise-scan splat/slice lowering agrees with the direct
    scatter/gather form (fp32 summation order is the only difference)."""
    rng = np.random.default_rng(6)
    t = (gray_volume > 150).astype(np.float32)
    c = rng.random(gray_volume.shape).astype(np.float32) * 0.5 + 0.4
    kw = dict(sigma_spatial=4, sigma_luma=8)
    a = np.asarray(bilateral_solve_gray(
        jnp.asarray(t), jnp.asarray(gray_volume, jnp.float32),
        jnp.asarray(c), pixel_impl="scan", **kw))
    b = np.asarray(bilateral_solve_gray(
        jnp.asarray(t), jnp.asarray(gray_volume, jnp.float32),
        jnp.asarray(c), pixel_impl="scatter", **kw))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)
    # 2D rank too (the 2D solver path)
    img = gray_volume[:, :, 5].astype(np.float32)
    t2 = (img > 150).astype(np.float32)
    c2 = np.full(img.shape, 0.999, np.float32)
    from vittf_tpu.ops.bilateral import _BLUR_DIM_2D
    a2 = np.asarray(bilateral_solve_gray(
        jnp.asarray(t2), jnp.asarray(img), jnp.asarray(c2),
        sigma_spatial=3, sigma_luma=8, blur_dim=_BLUR_DIM_2D,
        pixel_impl="scan"))
    b2 = np.asarray(bilateral_solve_gray(
        jnp.asarray(t2), jnp.asarray(img), jnp.asarray(c2),
        sigma_spatial=3, sigma_luma=8, blur_dim=_BLUR_DIM_2D,
        pixel_impl="scatter"))
    np.testing.assert_allclose(a2, b2, rtol=2e-4, atol=2e-4)


def test_blocked_pixel_view_roundtrip():
    from vittf_tpu.ops.bilateral import (
        _blocked_pixel_view,
        _unblock_pixel_view,
    )

    rng = np.random.default_rng(7)
    for shape, ss in [((14, 12, 10), 4), ((13, 11), 3), ((8, 8, 8), 8)]:
        sp_ext = tuple((s - 1) // ss + 1 for s in shape)
        x = jnp.asarray(rng.random(shape, np.float32))
        xb = _blocked_pixel_view(x, ss, sp_ext)
        assert xb.shape == (int(np.prod(sp_ext)), ss ** len(shape))
        back = _unblock_pixel_view(xb, ss, sp_ext, shape)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_fused_pallas_impl_matches_scan(gray_volume):
    """The fused single-kernel splat/slice lowering (in-kernel binning,
    t*c, reblock transpose; pixel_impl='pallas') agrees with the scan
    form. Runs the kernels in Pallas interpret mode so the Mosaic-path
    numerics are exercised on CPU; the on-chip agreement test lives in
    tests_tpu/."""
    rng = np.random.default_rng(8)
    t = (gray_volume > 150).astype(np.float32)
    c = rng.random(gray_volume.shape).astype(np.float32) * 0.5 + 0.4
    kw = dict(sigma_spatial=4, sigma_luma=8)  # ragged: 20^3, ss=4 -> 5^3
    a = np.asarray(bilateral_solve_gray(
        jnp.asarray(t), jnp.asarray(gray_volume, jnp.float32),
        jnp.asarray(c), pixel_impl="pallas_interpret", **kw))
    b = np.asarray(bilateral_solve_gray(
        jnp.asarray(t), jnp.asarray(gray_volume, jnp.float32),
        jnp.asarray(c), pixel_impl="scan", **kw))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_fused_pallas_ragged_and_divisible_geometry():
    """Fused kernels handle both ragged (pad z/y, lane pad) and exactly
    divisible crops; splat counts ignore pad pixels (total pixel count
    preserved through the in-kernel luma binning)."""
    from vittf_tpu.ops.bilateral import (
        _grid_extents,
        _pad5d_fill,
        _splat_fused3d_pallas,
    )

    rng = np.random.default_rng(9)
    for shape in [(11, 9, 13), (8, 8, 8)]:
        ss, sl = 4, 8
        ext = _grid_extents(shape, ss, sl)
        sp_ext, L = ext[:-1], ext[-1]
        luma = rng.random(shape, np.float32) * 255.0
        t = rng.random(shape, np.float32)
        c = rng.random(shape, np.float32)
        out = _splat_fused3d_pallas(
            _pad5d_fill(jnp.asarray(luma), ss, sp_ext, -2.0 * sl),
            _pad5d_fill(jnp.asarray(t), ss, sp_ext, 0),
            _pad5d_fill(jnp.asarray(c), ss, sp_ext, 0),
            sl, ss, sp_ext, L, interpret=True,
        )
        m = np.asarray(out[0])
        assert m.sum() == np.prod(shape)  # pad pixels bin to -1: uncounted
        np.testing.assert_allclose(
            np.asarray(out[1]).sum(), c.sum(), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out[2]).sum(), (t * c).sum(), rtol=1e-5
        )


def test_coarse_restriction_is_exact():
    """The coarse-to-fine solve's restriction claim: sum-pooling the fine
    splat 2x along every lattice axis equals splatting directly onto the
    sigma-doubled grid (pixel->cell and luma->bin index maps compose:
    p // ss // 2 == p // (2*ss), (luma // sl) // 2 == luma // (2*sl))."""
    from vittf_tpu.ops.bilateral import _grid_extents, _sumpool2, _vertex_ids

    rng = np.random.default_rng(10)
    shape, ss, sl = (21, 17, 13), 4, 8
    luma = jnp.asarray(rng.random(shape, np.float32) * 255.0)
    vals = jnp.asarray(rng.random(shape, np.float32))

    def splat(ss_, sl_):
        vid, ext = _vertex_ids(shape, luma, ss_, sl_)
        n = int(np.prod(ext))
        return (
            jnp.zeros((n,), jnp.float32).at[vid.reshape(-1)].add(
                vals.reshape(-1)
            ).reshape(ext),
            ext,
        )

    fine, ext_f = splat(ss, sl)
    coarse, ext_c = splat(2 * ss, 2 * sl)
    assert ext_c == _grid_extents(shape, 2 * ss, 2 * sl)
    np.testing.assert_allclose(
        np.asarray(_sumpool2(fine, ext_c)), np.asarray(coarse), rtol=1e-6
    )


def test_coarse_to_fine_bounded_deviation():
    """coarse_to_fine=True differs from the direct solve ONLY in the CG
    start/iterations; on a structured volume (luma correlated with the
    target, the real refine regime) the output deviation stays within a
    few quantization steps and downstream thresholded masks agree."""
    rng = np.random.RandomState(11)
    S = 40
    z, y, x = np.mgrid[:S, :S, :S]
    blob = (z - 20) ** 2 + (y - 20) ** 2 + (x - 20) ** 2 < 12 ** 2
    luma = np.clip(
        np.where(blob, 180.0, 80.0) + 12 * rng.randn(S, S, S), 0, 255
    ).astype(np.float32)
    t = np.clip(blob + 0.2 * rng.randn(S, S, S), 0, 1).astype(np.float32)
    c = np.full((S, S, S), 0.9, np.float32)
    kw = dict(sigma_spatial=7, sigma_luma=5, pixel_impl="scan")
    exact = np.asarray(bilateral_solve_gray(
        jnp.asarray(t), jnp.asarray(luma), jnp.asarray(c), **kw))
    c2f = np.asarray(bilateral_solve_gray(
        jnp.asarray(t), jnp.asarray(luma), jnp.asarray(c),
        coarse_to_fine=True, **kw))
    d = np.abs(exact - c2f)
    assert d.max() < 0.05 and d.mean() < 0.002
    m_e, m_c = exact > 0.5, c2f > 0.5
    assert m_e.sum() > 1000  # meaningful foreground to compare
    assert (m_e == m_c).mean() > 0.999
    iou = (m_e & m_c).sum() / max((m_e | m_c).sum(), 1)
    assert iou > 0.99


def test_refine_batched_coarse_to_fine():
    """bs_params['coarse_to_fine'] threads through the batched refine;
    uint8 outputs stay within a few quantization steps of the default."""
    from vittf_tpu.pipeline.refine import refine_similarities_batched

    rng = np.random.default_rng(12)
    zz, yy, xx = np.mgrid[:12, :12, :12]
    b0 = ((zz - 5) ** 2 + (yy - 5) ** 2 + (xx - 5) ** 2) < 4 ** 2
    b1 = ((zz - 4) ** 2 + (yy - 8) ** 2 + (xx - 7) ** 2) < 3 ** 2
    volhalf = np.where(b0, 0.9, np.where(b1, 0.6, 0.3))
    vol = (
        np.kron(volhalf, np.ones((2, 2, 2)))
        + 0.03 * rng.standard_normal((24, 24, 24))
    ).astype(np.float32)
    sims = np.stack([
        np.clip(b0 + 0.15 * rng.standard_normal(b0.shape), 0, 1),
        np.clip(b1 + 0.15 * rng.standard_normal(b1.shape), 0, 1),
    ]).astype(np.float32)
    base = np.asarray(refine_similarities_batched(
        jnp.asarray(sims), jnp.asarray(vol), (12, 12, 12)))
    c2f = np.asarray(refine_similarities_batched(
        jnp.asarray(sims), jnp.asarray(vol), (12, 12, 12),
        bs_params={"coarse_to_fine": True}))
    assert c2f.shape == base.shape and c2f.dtype == np.uint8
    d = np.abs(c2f.astype(np.int32) - base.astype(np.int32))
    assert np.mean(d <= 3) > 0.999
    assert d.max() <= 8
