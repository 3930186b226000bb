"""Resize / pooling ops with exact PyTorch index-arithmetic parity.

The reference's artifact contract depends on three torch ops whose index
rules must be matched bit-for-bit at fp32 (SURVEY.md §7 "hard parts"):

- ``F.interpolate(mode='nearest')``        (reference infer.py:177, predict_ntf.py:100)
- ``F.interpolate(mode='trilinear')``      (predict_ntf.py:80-87)
- ``nn.AdaptiveAvgPool3d``                 (infer.py:329)

All three are separable per axis, so each is implemented as a sequence of
per-axis resamplings. The linear/adaptive variants are expressed as small
static ``(out, in)`` weight matrices contracted with ``jnp.tensordot`` —
turning host-style index arithmetic into MXU matmuls that XLA fuses freely.
Weight matrices are built with numpy at trace time (shapes are static under
``jit``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest' (not nearest-exact): src = floor(i * in/out), clamped.
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def _linear_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix for 1D linear resample, align_corners=False.

    torch rule: src = (i + 0.5) * in/out - 0.5, clamped at 0 below;
    neighbors floor(src)/floor(src)+1 clamped into range.
    """
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    src = np.maximum(src, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - np.floor(src)
    w1 = np.where(i1 == i0, 0.0, w1)
    w = np.zeros((out_size, in_size))
    np.add.at(w, (np.arange(out_size), i0), 1.0 - w1)
    np.add.at(w, (np.arange(out_size), i1), w1)
    return w


def _cubic_kernel(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel; torch uses A=-0.75 (not Keys' -0.5)."""
    t = np.abs(t)
    return np.where(
        t <= 1.0,
        ((A + 2.0) * t - (A + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, (((t - 5.0) * t + 8.0) * t - 4.0) * A, 0.0),
    )


def _cubic_weight_matrix(
    in_size: int, out_size: int, coord_scale: float | None = None
) -> np.ndarray:
    """(out, in) matrix for 1D bicubic resample, align_corners=False.

    torch rule: src = (i + 0.5) * coord_scale - 0.5 (kept negative for
    cubic), 4 taps at floor(src) + {-1, 0, 1, 2}, indices clamped to the
    border (value-bounded access). ``coord_scale`` defaults to in/out;
    callers that mimic torch's ``scale_factor=`` path (where torch keeps
    the user-provided factor, e.g. DINO's pos-embed ``(w0+0.1)/M``) pass
    the reciprocal of that factor explicitly.
    """
    scale = in_size / out_size if coord_scale is None else coord_scale
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    w = np.zeros((out_size, in_size))
    rows = np.arange(out_size)
    for offset in (-1, 0, 1, 2):
        idx = np.clip(i0 + offset, 0, in_size - 1)
        np.add.at(w, (rows, idx), _cubic_kernel(offset - t))
    return w


def _adaptive_avg_weight_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) matrix for 1D adaptive average pooling.

    torch rule: window [floor(i*in/out), ceil((i+1)*in/out)), uniform weights.
    """
    starts = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int64)
    ends = np.ceil((np.arange(out_size) + 1) * in_size / out_size).astype(np.int64)
    w = np.zeros((out_size, in_size))
    for i, (s, e) in enumerate(zip(starts, ends)):
        w[i, s:e] = 1.0 / (e - s)
    return w


def _apply_axis_matrix(x: jnp.ndarray, w: np.ndarray, axis: int) -> jnp.ndarray:
    wj = jnp.asarray(w, dtype=jnp.promote_types(x.dtype, jnp.float32))
    # precision='highest': these weights define the artifact contract; fp32
    # accuracy is required even on TPU (where default matmul is bf16).
    moved = jnp.tensordot(wj, x, axes=[[1], [axis]], precision="highest")
    return jnp.moveaxis(moved, 0, axis).astype(x.dtype)


def _spatial_axes(ndim: int, n_spatial: int) -> list[int]:
    return list(range(ndim - n_spatial, ndim))


def resize_nearest(x: jnp.ndarray, size: tuple[int, ...]) -> jnp.ndarray:
    """Nearest resize of the trailing ``len(size)`` axes, torch parity."""
    for axis, out_size in zip(_spatial_axes(x.ndim, len(size)), size):
        in_size = x.shape[axis]
        if in_size == out_size:
            continue
        if in_size % out_size == 0:
            # integer downsample ratio r: floor(i·r) = i·r exactly, so the
            # torch 'nearest' pick IS a strided slice — identical elements,
            # but a slice HLO instead of a gather (the hot fast-mode case:
            # 1024² slices → 512² at 1024³/fos64)
            r = in_size // out_size
            if axis == x.ndim - 1:
                # minor-axis strided slices read poorly from HBM (lane
                # stride): reshape (…, out, r) + index-0 lowers to a
                # row-granular read instead — measured 36 → 17 ms on a
                # 1024³ fp32 stride-2 decimation (element-identical)
                x = x.reshape(x.shape[:-1] + (out_size, r))[..., 0]
            else:
                x = jax.lax.slice_in_dim(
                    x, 0, (out_size - 1) * r + 1, stride=r, axis=axis
                )
        elif out_size % in_size == 0:
            # integer upsample ratio k: floor(i·in/out) = i // k, so each
            # source element repeats k times — a broadcast + reshape
            # instead of a gather (the half-res similarity upsample at
            # 1024³ is three 8× passes over (C, 512³) uint8; gathers on
            # the lane dim dominated the no-BLS similarity dispatch)
            k = out_size // in_size
            xe = jnp.expand_dims(x, axis + 1)
            tgt = xe.shape[: axis + 1] + (k,) + xe.shape[axis + 2 :]
            x = jnp.broadcast_to(xe, tgt).reshape(
                x.shape[:axis] + (out_size,) + x.shape[axis + 1 :]
            )
        else:
            x = jnp.take(
                x, jnp.asarray(_nearest_indices(in_size, out_size)), axis=axis
            )
    return x


def resize_linear(x: jnp.ndarray, size: tuple[int, ...]) -> jnp.ndarray:
    """(Bi/tri)linear resize, align_corners=False, torch parity."""
    for axis, out_size in zip(_spatial_axes(x.ndim, len(size)), size):
        in_size = x.shape[axis]
        if in_size != out_size:
            x = _apply_axis_matrix(x, _linear_weight_matrix(in_size, out_size), axis)
    return x


def resize_cubic(x: jnp.ndarray, size: tuple[int, ...]) -> jnp.ndarray:
    """Bicubic resize, align_corners=False, torch parity (A=-0.75).

    Used for ViT position-embedding interpolation (DINO resizes pos_embed
    bicubically to the slice token grid).
    """
    for axis, out_size in zip(_spatial_axes(x.ndim, len(size)), size):
        in_size = x.shape[axis]
        if in_size != out_size:
            x = _apply_axis_matrix(x, _cubic_weight_matrix(in_size, out_size), axis)
    return x


def resize_cubic_scaled(
    x: jnp.ndarray, size: tuple[int, ...], coord_scales: tuple[float, ...]
) -> jnp.ndarray:
    """Bicubic resize with explicit coordinate scales (torch ``scale_factor=``
    semantics). DINO pos-embed parity: coord_scale = M / (w0 + 0.1)."""
    for axis, out_size, cs in zip(
        _spatial_axes(x.ndim, len(size)), size, coord_scales
    ):
        in_size = x.shape[axis]
        x = _apply_axis_matrix(x, _cubic_weight_matrix(in_size, out_size, cs), axis)
    return x


def adaptive_avg_pool(x: jnp.ndarray, size: tuple[int, ...]) -> jnp.ndarray:
    """Adaptive average pooling over trailing axes, torch parity."""
    for axis, out_size in zip(_spatial_axes(x.ndim, len(size)), size):
        in_size = x.shape[axis]
        if in_size != out_size:
            x = _apply_axis_matrix(x, _adaptive_avg_weight_matrix(in_size, out_size), axis)
    return x
