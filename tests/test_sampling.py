"""Parity tests: grid_sample_3d / sample_features3d vs torch."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vittf_tpu.ops.sampling import (
    grid_sample_3d,
    rel_coords_from_abs,
    sample_features3d,
)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_3d_parity(rng, mode, align_corners):
    inp = rng.standard_normal((2, 4, 5, 6, 7)).astype(np.float32)
    # include clearly out-of-range points to exercise zero padding
    grid = (rng.random((2, 3, 4, 2, 3)).astype(np.float32) * 2.6) - 1.3
    got = np.asarray(
        grid_sample_3d(
            jnp.asarray(inp), jnp.asarray(grid), mode=mode, align_corners=align_corners
        )
    )
    want = F.grid_sample(
        torch.from_numpy(inp),
        torch.from_numpy(grid),
        mode=mode,
        align_corners=align_corners,
        padding_mode="zeros",
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_sample_features3d_parity(rng, mode):
    """Full reference-path parity: abs coords → rel coords → sampled feats."""
    F_dim, W, H, D = 8, 6, 7, 9
    feat = rng.standard_normal((F_dim, W, H, D)).astype(np.float32)
    abs_coords = np.stack(
        [
            rng.integers(0, W, 11),
            rng.integers(0, H, 11),
            rng.integers(0, D, 11),
        ],
        axis=-1,
    ).astype(np.float32)
    rel = np.asarray(rel_coords_from_abs(jnp.asarray(abs_coords), (W, H, D)))

    got = np.asarray(sample_features3d(jnp.asarray(feat), jnp.asarray(rel), mode=mode))

    # torch reference (mirrors infer.py:48-72 semantics)
    tfeat = torch.from_numpy(feat)[None, None]  # (1, 1, F, W, H, D) -> make_5d twice
    tfeat = torch.from_numpy(feat)[None]  # (M=1, F, W, H, D)
    trel = torch.from_numpy(rel)[None, None]  # (1, 1, A, 3)
    grid = trel.flip(-1)[:, :, :, None, :]  # (1, 1, A, 1, 3)
    want = (
        F.grid_sample(tfeat, grid, mode=mode, align_corners=False)
        .squeeze(-1)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.shape == (1, 1, 11, F_dim)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_2d_parity(rng, mode):
    inp = rng.standard_normal((3, 4, 6, 7)).astype(np.float32)
    grid = (rng.random((3, 5, 2, 2)).astype(np.float32) * 2.6) - 1.3
    from vittf_tpu.ops.sampling import grid_sample_2d

    got = np.asarray(grid_sample_2d(jnp.asarray(inp), jnp.asarray(grid), mode=mode))
    want = F.grid_sample(
        torch.from_numpy(inp), torch.from_numpy(grid),
        mode=mode, align_corners=False, padding_mode="zeros",
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_sample_features2d_parity(rng, mode):
    """Slice-indexed 2D sampling vs a torch replica of cluster_dino.py:31-46."""
    from vittf_tpu.ops.sampling import sample_features2d

    F_dim, W, H, D = 6, 5, 7, 9
    feat = rng.standard_normal((1, F_dim, W, H, D)).astype(np.float32)
    C_cls, A = 2, 4
    abs_coords = np.stack(
        [rng.integers(0, s, (C_cls, A)) for s in (W, H, D)], axis=-1
    ).astype(np.int64)
    rel = (abs_coords.astype(np.float32) + 0.5) / np.array([W, H, D]) * 2 - 1

    got = np.asarray(
        sample_features2d(jnp.asarray(feat), jnp.asarray(abs_coords),
                          jnp.asarray(rel), mode=mode)
    )
    tf_ = torch.from_numpy(feat)
    slices = tf_.squeeze(0).permute(3, 0, 1, 2)[
        torch.from_numpy(abs_coords.reshape(-1, 3))[:, 2]
    ]
    grid_idx = torch.from_numpy(rel.reshape(-1, 3))[:, None, None, [1, 0]].float()
    want = (
        F.grid_sample(slices, grid_idx, mode=mode, align_corners=False)
        .reshape(C_cls, A, F_dim)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sample_features3d_exact_voxel_centers(rng):
    """Sampling at voxel centers with bilinear must return the voxel value."""
    F_dim, W, H, D = 4, 8, 8, 8
    feat = rng.standard_normal((F_dim, W, H, D)).astype(np.float32)
    idx = np.stack([rng.integers(0, s, 16) for s in (W, H, D)], axis=-1)
    rel = rel_coords_from_abs(jnp.asarray(idx.astype(np.float32)), (W, H, D))
    got = np.asarray(sample_features3d(jnp.asarray(feat), rel, mode="bilinear"))[0, 0]
    want = feat[:, idx[:, 0], idx[:, 1], idx[:, 2]].T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
