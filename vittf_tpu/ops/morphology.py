"""Morphological + small separable-filter ops as XLA reduce_windows/convs.

TPU-native replacements for the reference's scipy.ndimage / conv3d usage:
- separable Sobel magnitude / Gaussian blur (bilateral_solver3d.py:169-181)
- binary erosion with scipy-compatible structuring elements
  (compare_feat_sampling.py:19-30 surface sampling)
- binary_fill_holes (bilateral_solver.py:199-201 2D cc filtering)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.utils.tensor import make_5d


def _conv1d_axis(x5, win, axis):
    """Depthwise 1D filter along a spatial axis of (N, C, D, H, W), SAME
    zero pad — the reference's padded F.conv3d with a small separable
    kernel (bilateral_solver3d.py:169-181).

    Implemented as padded shifted adds, NOT lax.conv: XLA's TPU conv
    lowering pads the (N, C=1) dims into a 128-lane tile — a measured
    128× memory expansion (1 GB temp per 128³ volume, 8 GB for a batch of
    8 → OOM in the batched BLS refinement). k-1 shifted multiply-adds are
    exact (same cross-correlation sum, fp32) and layout-neutral.
    """
    k = len(win)
    r = k // 2
    pad_cfg = [(0, 0)] * 5
    pad_cfg[axis] = (r, r)
    xp = jnp.pad(x5, pad_cfg)
    S = x5.shape[axis]
    out = None
    for i, w in enumerate(win):
        if w == 0:
            continue
        sl = [slice(None)] * 5
        sl[axis] = slice(i, i + S)
        term = xp[tuple(sl)] * jnp.asarray(w, x5.dtype)
        out = term if out is None else out + term
    return out


def filter_sobel_separated(x: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude via [-0.5, 0, 0.5] central differences per axis
    (reference bilateral_solver3d.py:176-181). Input (N, C, D, H, W)."""
    x5 = make_5d(x)
    win = [-0.5, 0.0, 0.5]
    out = _conv1d_axis(x5, win, 4) ** 2
    out = out + _conv1d_axis(x5, win, 3) ** 2
    out = out + _conv1d_axis(x5, win, 2) ** 2
    return jnp.sqrt(out)


def filter_gauss_separated(x: jnp.ndarray) -> jnp.ndarray:
    """[0.25, 0.5, 0.25] separable blur (reference :169-174)."""
    x5 = make_5d(x)
    win = [0.25, 0.5, 0.25]
    out = _conv1d_axis(x5, win, 4)
    out = _conv1d_axis(out, win, 3)
    return _conv1d_axis(out, win, 2)


def generate_binary_structure(rank: int = 3, connectivity: int = 1) -> np.ndarray:
    """scipy-compatible 3³ structuring element (sum |offset| ≤ connectivity)."""
    grid = np.indices((3,) * rank) - 1
    return (np.abs(grid).sum(axis=0) <= connectivity)


@functools.partial(jax.jit, static_argnames=("offsets", "radii"))
def _erosion_shift_counts(mask_u8, offsets, radii):
    """Sum the mask over the structuring element's true cells via padded
    shifts — each offset is one elementwise add over the volume. A real
    lax conv here is a trap: XLA's TPU conv lowering materializes a
    patches buffer that reaches ~70 GB for a 3³ kernel over a 512³ volume
    (measured AOT OOM); ≤27 shift-adds are bandwidth-bound and safe at
    any size the pipeline handles.
    """
    # uint8 accumulation would wrap for structures with > 255 true cells
    # (internal callers max out at 27, but the public API takes arbitrary
    # scipy-style structures)
    acc_dtype = jnp.uint8 if len(offsets) <= 255 else jnp.int32
    padded = jnp.pad(
        mask_u8.astype(acc_dtype), [(r, r) for r in radii]
    )  # zeros == scipy border_value=0
    shape = mask_u8.shape
    counts = jnp.zeros(shape, acc_dtype)
    for off in offsets:
        idx = tuple(
            slice(r + o, r + o + s) for r, o, s in zip(radii, off, shape)
        )
        counts = counts + padded[idx]
    return counts


def binary_erosion(mask: jnp.ndarray, structure: np.ndarray | None = None) -> jnp.ndarray:
    """scipy.ndimage.binary_erosion parity (border_value=0).

    A voxel survives iff every 1-cell of the structuring element lies on a
    true voxel; outside the volume counts as false (scipy default).
    """
    mask = jnp.asarray(mask)
    if structure is None:
        structure = generate_binary_structure(mask.ndim, 1)
    structure = np.asarray(structure).astype(bool)
    radii = tuple(s // 2 for s in structure.shape)
    offsets = tuple(
        tuple(int(c) - r for c, r in zip(cell, radii))
        for cell in np.argwhere(structure)
    )
    counts = _erosion_shift_counts(mask.astype(jnp.uint8), offsets, radii)
    return counts == len(offsets)


def binary_fill_holes(mask: jnp.ndarray, max_iter: int | None = None) -> jnp.ndarray:
    """scipy.ndimage.binary_fill_holes parity via background flood fill.

    Background reachable from the border is grown by 6/4-connected
    dilation (bounded ``while_loop``); holes = ~mask ∧ ~reachable.
    """
    mask = jnp.asarray(mask).astype(bool)
    nd = mask.ndim
    if max_iter is None:
        # worst-case flood path (snaking cavities) is bounded by the voxel
        # count; the while_loop exits at the fixed point long before
        max_iter = int(np.prod(mask.shape))

    free = ~mask

    # seed: free border cells
    border = jnp.zeros_like(mask)
    for ax in range(nd):
        idx = [slice(None)] * nd
        idx[ax] = 0
        border = border.at[tuple(idx)].set(True)
        idx[ax] = -1
        border = border.at[tuple(idx)].set(True)
    reach0 = border & free

    def dilate(r):
        out = r
        for ax in range(nd):
            out = out | jnp.roll(r, 1, axis=ax).at[
                tuple(slice(None) if a != ax else 0 for a in range(nd))
            ].set(False)
            out = out | jnp.roll(r, -1, axis=ax).at[
                tuple(slice(None) if a != ax else -1 for a in range(nd))
            ].set(False)
        return out & free

    def cond(state):
        r, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        r, _, it = state
        nr = dilate(r)
        return nr, jnp.any(nr != r), it + 1

    reach, _, _ = jax.lax.while_loop(cond, body, (reach0, jnp.bool_(True), 0))
    return mask | (~reach & free)
