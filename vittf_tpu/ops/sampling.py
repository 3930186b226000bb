"""3D grid sampling with exact ``torch.nn.functional.grid_sample`` parity.

The reference samples annotation features from the feature volume via
``F.grid_sample`` with ``align_corners=False`` and zero padding
(reference infer.py:48-72 ``sample_features3d``); the similarity maps are
bit-determined by this op, so the index arithmetic matches torch exactly:

- unnormalize: ``ix = ((x + 1) * W - 1) / 2``
- bilinear: 8-corner trilinear weights, out-of-bounds corners contribute 0
- nearest: round-half-to-even (``std::nearbyint``), out-of-bounds → 0

Implemented as masked flat gathers (``jnp.take`` on the flattened spatial
axis) — XLA lowers these to efficient dynamic-gathers; annotation counts are
tiny (KBs) so this path never becomes a bottleneck.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vittf_tpu.utils.tensor import make_4d, make_5d


def _unnormalize(coord, size, align_corners):
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_3d(inp_flat, iz, iy, ix, D, H, W):
    """Zero-padded gather: inp_flat (C, D*H*W); iz/iy/ix (P,) int."""
    valid = (
        (iz >= 0) & (iz < D) & (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    )
    izc = jnp.clip(iz, 0, D - 1)
    iyc = jnp.clip(iy, 0, H - 1)
    ixc = jnp.clip(ix, 0, W - 1)
    flat_idx = (izc * H + iyc) * W + ixc
    vals = jnp.take(inp_flat, flat_idx, axis=1)  # (C, P)
    return jnp.where(valid[None, :], vals, 0.0)


def _grid_sample_3d_one(inp, points, mode, align_corners):
    """inp (C, D, H, W); points (P, 3) with (x, y, z) normalized coords."""
    C, D, H, W = inp.shape
    inp_flat = inp.reshape(C, D * H * W)
    x = _unnormalize(points[:, 0], W, align_corners)
    y = _unnormalize(points[:, 1], H, align_corners)
    z = _unnormalize(points[:, 2], D, align_corners)

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        iz = jnp.round(z).astype(jnp.int32)
        return _gather_3d(inp_flat, iz, iy, ix, D, H, W)

    if mode != "bilinear":
        raise ValueError(f"Unsupported mode: {mode}")

    ix0 = jnp.floor(x).astype(jnp.int32)
    iy0 = jnp.floor(y).astype(jnp.int32)
    iz0 = jnp.floor(z).astype(jnp.int32)
    wx = x - ix0
    wy = y - iy0
    wz = z - iz0

    out = jnp.zeros((C, points.shape[0]), dtype=inp.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                w = (
                    (wx if dx else 1.0 - wx)
                    * (wy if dy else 1.0 - wy)
                    * (wz if dz else 1.0 - wz)
                )
                vals = _gather_3d(
                    inp_flat, iz0 + dz, iy0 + dy, ix0 + dx, D, H, W
                )
                out = out + vals * w[None, :]
    return out


def grid_sample_3d(
    inp: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch-parity 3D grid sample with zero padding.

    Args:
        inp:  (N, C, D, H, W)
        grid: (N, *out_dims, 3) — last axis is (x, y, z) in [-1, 1],
              x indexing W, y indexing H, z indexing D (torch convention).
        mode: 'bilinear' or 'nearest'

    Returns:
        (N, C, *out_dims)
    """
    N, C = inp.shape[:2]
    out_dims = grid.shape[1:-1]
    points = grid.reshape(N, -1, 3).astype(jnp.float32)
    sampled = jax.vmap(
        lambda i, p: _grid_sample_3d_one(i.astype(jnp.float32), p, mode, align_corners)
    )(inp, points)
    return sampled.reshape(N, C, *out_dims).astype(inp.dtype)


def sample_features3d(
    feat_vol: jnp.ndarray, rel_coords: jnp.ndarray, mode: str = "nearest"
) -> jnp.ndarray:
    """Sample features at relative coords; reference infer.py:48-72 parity.

    Args:
        feat_vol:   ([M,] F, W, H, D)
        rel_coords: ([M,] C, A, 3) in [-1, 1], coordinate order (W, H, D) —
                    flipped internally to torch's (x→last dim) convention.

    Returns:
        (M, C, A, F)
    """
    feat_vol = make_5d(feat_vol)  # (M, F, W, H, D)
    if rel_coords.ndim in (2, 3):
        rel_coords = make_4d(rel_coords)  # (M, C, A, 3)
    if rel_coords.shape[0] != feat_vol.shape[0]:
        rel_coords = jnp.broadcast_to(
            rel_coords, (feat_vol.shape[0],) + rel_coords.shape[1:]
        )
    # flip (W,H,D)-order coords → (x=D, y=H, z=W): torch sees the feature
    # volume as (N, C, D_in=W, H_in=H, W_in=D).
    grid = jnp.flip(rel_coords, axis=-1)[:, :, :, None, :]  # (M, C, A, 1, 3)
    feats = grid_sample_3d(feat_vol, grid, mode=mode)  # (M, F, C, A, 1)
    return jnp.transpose(feats[..., 0], (0, 2, 3, 1))  # (M, C, A, F)


def _grid_sample_2d_one(inp, points, mode, align_corners):
    """inp (C, H, W); points (P, 2) with (x, y) normalized coords."""
    C, H, W = inp.shape
    inp_flat = inp.reshape(C, H * W)
    x = _unnormalize(points[:, 0], W, align_corners)
    y = _unnormalize(points[:, 1], H, align_corners)

    def gather(iy, ix):
        valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        flat = jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)
        vals = jnp.take(inp_flat, flat, axis=1)
        return jnp.where(valid[None, :], vals, 0.0)

    if mode == "nearest":
        return gather(jnp.round(y).astype(jnp.int32), jnp.round(x).astype(jnp.int32))
    ix0 = jnp.floor(x).astype(jnp.int32)
    iy0 = jnp.floor(y).astype(jnp.int32)
    wx = x - ix0
    wy = y - iy0
    out = jnp.zeros((C, points.shape[0]), dtype=inp.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            w = (wx if dx else 1.0 - wx) * (wy if dy else 1.0 - wy)
            out = out + gather(iy0 + dy, ix0 + dx) * w[None, :]
    return out


def grid_sample_2d(
    inp: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch-parity 2D grid sample with zero padding.

    inp (N, C, H, W); grid (N, *out_dims, 2) with (x→W, y→H) coords.
    Returns (N, C, *out_dims).
    """
    N, C = inp.shape[:2]
    out_dims = grid.shape[1:-1]
    points = grid.reshape(N, -1, 2).astype(jnp.float32)
    sampled = jax.vmap(
        lambda i, p: _grid_sample_2d_one(i.astype(jnp.float32), p, mode, align_corners)
    )(inp, points)
    return sampled.reshape(N, C, *out_dims).astype(inp.dtype)


def sample_features2d(
    feat_vol: jnp.ndarray,
    abs_coords: jnp.ndarray,
    rel_coords: jnp.ndarray,
    mode: str = "nearest",
) -> jnp.ndarray:
    """Slice-indexed 2D feature sampling (reference old/cluster_dino.py:31-46).

    The un-reduced axis D is indexed by the absolute z coordinate, then the
    (W, H) plane is grid-sampled at the relative coords.

    Args:
        feat_vol:   (1, F, W, H, D) or (F, W, H, D)
        abs_coords: (C, A, 3) integer voxel coords (z taken from [:, :, 2])
        rel_coords: (C, A, 3) relative coords

    Returns:
        (C, A, F)
    """
    feat_vol = make_5d(feat_vol)[0]  # (F, W, H, D)
    C_cls, A = abs_coords.shape[:2]
    z = abs_coords.reshape(-1, 3)[:, 2].astype(jnp.int32)
    slices = jnp.moveaxis(feat_vol, -1, 0)[z]  # (C·A, F, W, H)
    # torch sees (N, C, H_in=W, W_in=H): grid x ← rel[1] (H), y ← rel[0] (W)
    grid = rel_coords.reshape(-1, 3)[:, None, None, [1, 0]]
    feats = grid_sample_2d(slices, grid, mode=mode)  # (C·A, F, 1, 1)
    return feats.reshape(C_cls, A, feat_vol.shape[0])


def rel_coords_from_abs(abs_coords: jnp.ndarray, vol_shape) -> jnp.ndarray:
    """Voxel indices → [-1, 1] relative coords (predict_ntf.py:56 parity)."""
    extent = jnp.asarray(vol_shape, dtype=jnp.float32)
    return (abs_coords.astype(jnp.float32) + 0.5) / extent * 2.0 - 1.0
