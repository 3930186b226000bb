"""Shape-fuzz parity: random shape/size combinations through the
torch-parity ops. The index arithmetic (floor/ceil boundaries, clamping,
scale-factor rounding) is where ports silently drift; each op is checked
against torch across a seeded batch of random geometries.
"""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vittf_tpu.ops.resize import (
    adaptive_avg_pool,
    resize_cubic,
    resize_linear,
    resize_nearest,
)
from vittf_tpu.ops.sampling import grid_sample_3d

N_CASES = 12


def _rand_sizes(rng, lo=1, hi=17, n=3):
    return tuple(int(x) for x in rng.integers(lo, hi, n))


def test_fuzz_resize_nearest(rng):
    for _ in range(N_CASES):
        in_sz = _rand_sizes(rng, 1, 14)
        out_sz = _rand_sizes(rng, 1, 14)
        x = rng.standard_normal((1, 2) + in_sz).astype(np.float32)
        got = np.asarray(resize_nearest(jnp.asarray(x), out_sz))
        want = F.interpolate(torch.from_numpy(x), size=out_sz, mode="nearest").numpy()
        np.testing.assert_array_equal(got, want, err_msg=f"{in_sz}->{out_sz}")


def test_fuzz_resize_trilinear(rng):
    for _ in range(N_CASES):
        in_sz = _rand_sizes(rng, 1, 14)
        out_sz = _rand_sizes(rng, 1, 14)
        x = rng.standard_normal((1, 1) + in_sz).astype(np.float32)
        got = np.asarray(resize_linear(jnp.asarray(x), out_sz))
        want = F.interpolate(
            torch.from_numpy(x), size=out_sz, mode="trilinear", align_corners=False
        ).numpy()
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5, err_msg=f"{in_sz}->{out_sz}"
        )


def test_fuzz_adaptive_pool(rng):
    for _ in range(N_CASES):
        in_sz = _rand_sizes(rng, 1, 14)
        out_sz = tuple(int(rng.integers(1, s + 1)) for s in in_sz)
        x = rng.standard_normal((1, 2) + in_sz).astype(np.float32)
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_sz))
        want = torch.nn.AdaptiveAvgPool3d(out_sz)(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5, err_msg=f"{in_sz}->{out_sz}"
        )


def test_fuzz_bicubic(rng):
    for _ in range(N_CASES):
        in_sz = _rand_sizes(rng, 2, 12, 2)
        out_sz = _rand_sizes(rng, 1, 14, 2)
        x = rng.standard_normal((1, 1) + in_sz).astype(np.float32)
        got = np.asarray(resize_cubic(jnp.asarray(x), out_sz))
        want = F.interpolate(
            torch.from_numpy(x), size=out_sz, mode="bicubic", align_corners=False
        ).numpy()
        np.testing.assert_allclose(
            got, want, rtol=1e-3, atol=1e-4, err_msg=f"{in_sz}->{out_sz}"
        )


def test_fuzz_grid_sample(rng):
    for i in range(N_CASES):
        in_sz = _rand_sizes(rng, 1, 10)
        npts = int(rng.integers(1, 30))
        x = rng.standard_normal((1, 3) + in_sz).astype(np.float32)
        # span in-range, boundary and far out-of-range coordinates
        grid = (rng.random((1, npts, 1, 1, 3)).astype(np.float32) * 4 - 2)
        mode = "bilinear" if i % 2 == 0 else "nearest"
        got = np.asarray(
            grid_sample_3d(jnp.asarray(x), jnp.asarray(grid), mode=mode)
        )
        want = F.grid_sample(
            torch.from_numpy(x), torch.from_numpy(grid), mode=mode,
            align_corners=False, padding_mode="zeros",
        ).numpy()
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-5, err_msg=f"{in_sz} {mode}"
        )
