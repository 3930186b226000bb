"""Query-refinement ops: top-K similarity bootstrapping + prototype thinning.

TPU-native ports of the reference's query utilities:
- ``resample_topk`` (infer.py:75-106): re-sample features at the K most
  similar voxels per (class, annotation), recompute similarity, mean over K.
  The reference spills to CPU fp32 for K>4; on TPU everything stays on
  device in fp32 (HBM is not the constraint at these sizes).
- ``take_most_dissimilar`` (infer.py:108-126): keep the ``num_prototypes``
  features with the largest mean pairwise distance (cosine or euclidean).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vittf_tpu.ops.sampling import sample_features3d
from vittf_tpu.utils.tensor import make_5d


def resample_topk(
    feat_vol: jnp.ndarray,
    sims: jnp.ndarray,
    K: int = 8,
    similarity_exponent: float = 2.0,
    feature_sampling_mode: str = "nearest",
) -> jnp.ndarray:
    """Bootstrap similarity maps from their own top-K voxels.

    Args:
        feat_vol: ([M,] F, W, H, D) feature volume.
        sims: ([M,] C, A, W, H, D) similarity volumes.

    Returns:
        ([M,] C, A, W, H, D): per-annotation similarity maps averaged over
        the K resampled queries, clamped to [0,1] and sharpened.
    """
    feat_vol = make_5d(feat_vol)
    if sims.ndim == 5:
        sims = sims[None]
    M, C, A = sims.shape[:3]
    spatial = sims.shape[-3:]

    flat = sims.reshape(M * C * A, -1)
    _, top_idx = jax.lax.top_k(flat, K)  # (MCA, K) descending
    coords = jnp.stack(
        jnp.unravel_index(top_idx.reshape(-1), spatial), axis=-1
    ).reshape(M, C, A, K, 3)
    extent = jnp.asarray(spatial, jnp.float32)
    rel = (coords.astype(jnp.float32) + 0.5) / extent * 2.0 - 1.0

    qf2 = sample_features3d(
        feat_vol, rel.reshape(M, C, A * K, 3), mode=feature_sampling_mode
    )  # (M, C, A*K, F)
    qf2 = qf2.reshape(M, C, A, K, qf2.shape[-1])
    new_sims = jnp.einsum(
        "mfwhd,mcakf->mcakwhd",
        feat_vol.astype(jnp.float32),
        qf2.astype(jnp.float32),
        precision="highest",
    )
    new_sims = jnp.clip(new_sims, 0.0, 1.0) ** similarity_exponent
    return new_sims.mean(axis=3).astype(sims.dtype)


def take_most_dissimilar(
    features: jnp.ndarray, num_prototypes: int = 35, measure: str = "cosine"
) -> jnp.ndarray:
    """Keep the ``num_prototypes`` mutually most dissimilar feature rows.

    dist(i) = mean_j (1 − cos(f_i, f_j)) or mean_j ||f_i − f_j||; the rows
    with the largest mean distance are selected (infer.py:117-126).
    """
    N = features.shape[0]
    if N <= num_prototypes:
        return features
    f = features.astype(jnp.float32)
    if measure == "cosine":
        fn = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
        cos = fn @ fn.T
        dist = (1.0 - cos).mean(axis=0)
    elif measure == "euclidean":
        sq = jnp.sum(f * f, axis=-1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (f @ f.T)
        dist = jnp.sqrt(jnp.maximum(d2, 0.0)).mean(axis=0)
    else:
        raise ValueError(f"Unknown measure: {measure}")
    _, sel = jax.lax.top_k(dist, num_prototypes)
    return features[sel]
