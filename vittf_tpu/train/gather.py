"""Semi-sparse receptive-field gather (reference old/semisparseconv.py).

Gathers k³ crops around sampled voxel centers so only annotated voxels are
convolved — the reference's trick for sparse-annotation training. The TPU
version is one vectorized gather (static shapes: #centers × k³) instead of
the reference's per-offset Python loop.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def gather_receptive_fields(
    volume: jnp.ndarray, centers: jnp.ndarray, ks: int = 3
) -> jnp.ndarray:
    """(C, Z, Y, X) volume + (N, 3) centers → (N, C, ks, ks, ks) crops.

    Zero padding of ks//2 per side; crop n is centered on ``centers[n]``
    (reference gather_receiptive_fields2 semantics, old/semisparseconv.py:14-22).
    """
    L = ks // 2
    pad = jnp.pad(volume, ((0, 0),) + ((L, L),) * 3)
    offs = jnp.asarray(
        np.stack(np.meshgrid(*([np.arange(ks)] * 3), indexing="ij"), -1).reshape(-1, 3)
    )
    idx = centers.astype(jnp.int32)[:, None, :] + offs[None, :, :]  # (N, k³, 3)
    vals = pad[:, idx[..., 0], idx[..., 1], idx[..., 2]]  # (C, N, k³)
    N = centers.shape[0]
    return jnp.moveaxis(vals, 1, 0).reshape(N, volume.shape[0], ks, ks, ks)


def upscale_indices(indices: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Map low-res voxel indices to high-res (reference old/utils.py:44-57's
    index upscale for low-res annotation volumes): center of the factor³ cell."""
    return indices * factor + factor // 2
