"""Mosaic-lowered kernel correctness on real TPU hardware.

Each test mirrors a CPU interpret-mode test from `tests/` but runs the
actual compiled kernel. Tolerances are the documented on-chip bf16
contracts (ops/fused_block.py: ~2% max rel accumulation noise vs the
XLA bf16 path over 12 blocks; single blocks are tighter).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vittf_tpu.models.dino import DINO_ARCHS
from vittf_tpu.models.vit import _block, init_vit_params
from vittf_tpu.ops.fused_block import fused_block
from vittf_tpu.ops.similarity import (
    class_mean_matrix,
    similarity_pallas,
    similarity_xla,
)

CFG = DINO_ARCHS["vits8"]


@pytest.fixture(scope="module")
def block_inputs():
    rng = np.random.default_rng(0)
    params = init_vit_params(CFG, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((2, 640, 384)) * 0.5, jnp.bfloat16)
    want, _ = _block(x, params["blocks"][0], CFG, "default", "auto")
    return params["blocks"][0], x, np.asarray(want, np.float32)


@pytest.mark.parametrize(
    "impl,softmax_max,score_dtype",
    [
        ("loop", True, "fp32"),
        ("loop", False, "fp32"),  # extraction default (_nomax)
        ("loop", False, "bf16"),  # experiment knob, still must be sane
        ("rows", True, "fp32"),
    ],
)
def test_fused_block_on_chip_vs_xla(block_inputs, impl, softmax_max,
                                    score_dtype):
    blk, x, want = block_inputs
    got = np.asarray(
        fused_block(
            x, blk, CFG.num_heads, impl=impl, softmax_max=softmax_max,
            score_dtype=score_dtype,
        ),
        np.float32,
    )
    scale = np.abs(want).max()
    tol = (0.05 if score_dtype == "bf16" else 0.02) * scale
    np.testing.assert_allclose(got, want, atol=tol)


def test_fused_block_padded_tokens_match_unpadded(block_inputs):
    """Np padding (row-block multiple) must not leak into valid tokens."""
    blk, x, _ = block_inputs
    full = fused_block(x, blk, CFG.num_heads)
    # same valid tokens, more padding: n_valid masks the extra rows
    xp = jnp.pad(x, ((0, 0), (0, 37), (0, 0)))
    padded = fused_block(xp, blk, CFG.num_heads, n_valid=x.shape[1])
    np.testing.assert_allclose(
        np.asarray(padded[:, : x.shape[1]], np.float32),
        np.asarray(full, np.float32),
        atol=0.02 * float(np.abs(np.asarray(full, np.float32)).max()),
    )


@pytest.mark.parametrize("mean_first", [False, True])
@pytest.mark.parametrize("out_layout", ["nc", "cn"])
def test_similarity_on_chip_vs_xla(rng, mean_first, out_layout):
    N, F_dim = 300, 24
    counts = [1500] if mean_first else [9, 4]
    A = sum(counts)
    feats = jnp.asarray(rng.standard_normal((N, F_dim)) * 0.3, jnp.float32)
    qf = jnp.asarray(rng.standard_normal((A, F_dim)) * 0.1, jnp.float32)
    m = jnp.asarray(class_mean_matrix(counts, A))
    want = np.asarray(
        similarity_xla(feats, qf, m, mean_first=mean_first,
                       out_layout=out_layout)
    )
    got = np.asarray(
        similarity_pallas(feats, qf, m, mean_first=mean_first,
                          out_layout=out_layout)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_nearest_decimation_exact_on_chip(rng):
    """The split major-slice + minor-reshape decimation (ops/resize.py,
    features._predecimate_fast_input) is element-exact on hardware."""
    from vittf_tpu.ops.resize import resize_nearest

    x = jnp.asarray(rng.standard_normal((4, 64, 96)), jnp.float32)
    got = np.asarray(resize_nearest(x, (32, 32)))
    want = np.asarray(x)[:, ::2, ::3]
    np.testing.assert_array_equal(got, want)


def test_connected_components_on_chip(rng):
    from vittf_tpu.ops.connected import connected_components

    vol = (rng.random((24, 24, 24)) > 0.7).astype(np.uint8)
    labels = np.asarray(
        jax.device_get(
            connected_components(jnp.asarray(vol)).astype(jnp.int32)
        )
    )
    # oracle: scipy 6-connectivity
    from scipy import ndimage

    want, n = ndimage.label(vol, structure=ndimage.generate_binary_structure(3, 1))
    # same partition: bijection between label sets on foreground voxels
    fg = vol.astype(bool)
    pairs = {(int(a), int(b)) for a, b in zip(labels[fg], want[fg])}
    assert len({a for a, _ in pairs}) == n
    assert len({b for _, b in pairs}) == n
    assert len(pairs) == n


def test_bilateral_scan_matches_scatter_on_chip():
    """The scan pixel_impl's blocked views and bin scans take different
    layout/fusion paths under the real TPU compiler than under the CPU
    interpreter — assert the two impls still agree on hardware."""
    from vittf_tpu.ops.bilateral import bilateral_solve_gray

    rng = np.random.default_rng(11)
    shape = (40, 36, 28)
    z, y, x = np.mgrid[: shape[0], : shape[1], : shape[2]]
    luma = np.clip(
        120 + 80 * ((z - 20) ** 2 + (y - 18) ** 2 + (x - 14) ** 2 < 120)
        + rng.normal(0, 6, shape),
        0, 255,
    ).astype(np.float32)
    t = (luma > 150).astype(np.float32)
    c = rng.random(shape).astype(np.float32) * 0.5 + 0.4
    kw = dict(sigma_spatial=7, sigma_luma=5)
    a = np.asarray(bilateral_solve_gray(
        jnp.asarray(t), jnp.asarray(luma), jnp.asarray(c),
        pixel_impl="scan", **kw))
    b = np.asarray(bilateral_solve_gray(
        jnp.asarray(t), jnp.asarray(luma), jnp.asarray(c),
        pixel_impl="scatter", **kw))
    assert np.isfinite(a).all()
    np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("impl", ["pallas", "pallas_reblock"])
def test_bilateral_pallas_matches_scan_on_chip(impl):
    """The Mosaic splat/slice kernels — 'pallas' (fused single-kernel:
    in-kernel binning + t·c + reblock transpose; the TPU 'auto' default)
    and 'pallas_reblock' (split reblock→splat/slice→unreblock) — are
    algebraically the same per-(cell, bin) reduction as the scan form;
    assert they agree on hardware, including at non-multiple shapes that
    exercise the cell padding."""
    from vittf_tpu.ops.bilateral import bilateral_solve_gray

    rng = np.random.default_rng(13)
    for shape in ((40, 36, 28), (33, 47, 21)):
        z, y, x = np.mgrid[: shape[0], : shape[1], : shape[2]]
        luma = np.clip(
            120 + 80 * ((z - 16) ** 2 + (y - 18) ** 2 + (x - 10) ** 2 < 120)
            + rng.normal(0, 6, shape),
            0, 255,
        ).astype(np.float32)
        t = (luma > 150).astype(np.float32)
        c = rng.random(shape).astype(np.float32) * 0.5 + 0.4
        kw = dict(sigma_spatial=7, sigma_luma=5)
        a = np.asarray(bilateral_solve_gray(
            jnp.asarray(t), jnp.asarray(luma), jnp.asarray(c),
            pixel_impl="scan", **kw))
        b = np.asarray(bilateral_solve_gray(
            jnp.asarray(t), jnp.asarray(luma), jnp.asarray(c),
            pixel_impl=impl, **kw))
        assert np.isfinite(b).all()
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4)
