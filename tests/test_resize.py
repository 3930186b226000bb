"""Parity tests: resize/pool ops vs torch (the reference's numerics)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vittf_tpu.ops.resize import adaptive_avg_pool, resize_linear, resize_nearest

SIZES_3D = [
    ((7, 9, 11), (4, 4, 4)),
    ((4, 4, 4), (7, 9, 11)),
    ((16, 16, 16), (5, 16, 3)),
    ((5, 5, 5), (5, 5, 5)),
]


@pytest.mark.parametrize("in_sz,out_sz", SIZES_3D)
def test_resize_nearest_3d(rng, in_sz, out_sz):
    x = rng.standard_normal((2, 3) + in_sz).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), out_sz))
    want = F.interpolate(torch.from_numpy(x), size=out_sz, mode="nearest").numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("in_sz,out_sz", SIZES_3D)
def test_resize_trilinear_3d(rng, in_sz, out_sz):
    x = rng.standard_normal((1, 2) + in_sz).astype(np.float32)
    got = np.asarray(resize_linear(jnp.asarray(x), out_sz))
    want = F.interpolate(
        torch.from_numpy(x), size=out_sz, mode="trilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resize_nearest_2d(rng):
    # 2D slice-resize path used by the feature extractor (infer.py:177)
    x = rng.standard_normal((4, 3, 33, 57)).astype(np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), (64, 48)))
    want = F.interpolate(torch.from_numpy(x), size=(64, 48), mode="nearest").numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("in_sz,out_sz", SIZES_3D)
def test_adaptive_avg_pool3d(rng, in_sz, out_sz):
    x = rng.standard_normal((2, 3) + in_sz).astype(np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_sz))
    want = torch.nn.AdaptiveAvgPool3d(out_sz)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
