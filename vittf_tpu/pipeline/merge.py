"""Axis-wise feature-volume merge + comparison tools
(reference old/merge_features.py, old/compare_feat_maps.py).

``merge_axis_features`` pools per-axis feature volumes to their common
minimum grid with adaptive average pooling and averages them; the
extraction pipeline does this fused (pipeline.features), but the tool is
kept for merging cached artifacts from separate per-axis runs
(sub/infer_and_merge.sh flow).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.resize import adaptive_avg_pool


def merge_axis_features(feature_volumes: list[jnp.ndarray]) -> jnp.ndarray:
    """Average per-axis (F, W, H, D) feature volumes on the min common grid."""
    vols = [jnp.asarray(v) for v in feature_volumes]
    min_shape = tuple(
        min(v.shape[1 + i] for v in vols) for i in range(3)
    )
    pooled = [adaptive_avg_pool(v, min_shape) for v in vols]
    return sum(pooled) / len(pooled)


def cross_axis_cosine(
    feats_a: jnp.ndarray, feats_b: jnp.ndarray, num_bins: int = 50
) -> tuple[np.ndarray, np.ndarray]:
    """Histogram of voxel-wise cosine similarity between two axis feature
    volumes on their common grid (old/compare_feat_maps.py capability)."""
    common = tuple(
        min(feats_a.shape[1 + i], feats_b.shape[1 + i]) for i in range(3)
    )
    a = adaptive_avg_pool(jnp.asarray(feats_a), common)
    b = adaptive_avg_pool(jnp.asarray(feats_b), common)
    an = a / jnp.maximum(jnp.linalg.norm(a, axis=0, keepdims=True), 1e-12)
    bn = b / jnp.maximum(jnp.linalg.norm(b, axis=0, keepdims=True), 1e-12)
    cos = jnp.sum(an * bn, axis=0).reshape(-1)
    hist, edges = np.histogram(np.asarray(cos), bins=num_bins, range=(-1, 1))
    return hist, edges
