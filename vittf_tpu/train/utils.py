"""Training utilities (reference old/utils.py capability surface).

- seeding + debug config (the CUDA_LAUNCH_BLOCKING / anomaly-detection
  equivalent is jax_debug_nans / jax_disable_jit)
- index helpers ``split_squeeze`` / ``split_squeeze3d``
- ``cluster_kmeans`` / ``project_pca`` feature-space analysis
- ``AverageMeter``
"""
from __future__ import annotations

import random

import jax
import jax.numpy as jnp
import numpy as np


def setup_seed_and_debug(seed: int = 3407, debug: bool = False) -> jax.Array:
    """Seed all RNGs; in debug mode enable nan-checking and disable jit
    (old/utils.py:18-26 equivalent: CUDA_LAUNCH_BLOCKING + detect_anomaly)."""
    random.seed(seed)
    np.random.seed(seed)
    if debug:
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_disable_jit", True)
    return jax.random.PRNGKey(seed)


def split_squeeze(idx: jnp.ndarray, bs: int, f: int):
    """(N, 3) voxel indices → advanced-index tuple into (BS, F, Z, Y, X)
    yielding (BS, F, N) gathers (old/utils.py split_squeeze semantics)."""
    z, y, x = idx[:, 0], idx[:, 1], idx[:, 2]
    b = jnp.arange(bs)[:, None, None]
    c = jnp.arange(f)[None, :, None]
    return (b, c, z[None, None, :], y[None, None, :], x[None, None, :])


def split_squeeze3d(idx: jnp.ndarray):
    """(N, 3) → index tuple into a (Z, Y, X) volume."""
    return (idx[:, 0], idx[:, 1], idx[:, 2])


def cluster_kmeans(features: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    """K-means labels over (N, F) features (old/utils.py cluster_kmeans
    via sklearn)."""
    from sklearn.cluster import KMeans

    return KMeans(n_clusters=k, random_state=seed, n_init=4).fit_predict(
        np.asarray(features)
    )


def project_pca(features: np.ndarray, n_components: int = 3) -> np.ndarray:
    """PCA projection of (N, F) features (old/utils.py project_pca)."""
    from sklearn.decomposition import PCA

    return PCA(n_components=n_components).fit_transform(np.asarray(features))


class AverageMeter:
    """Running average (old/utils.py AverageMeter)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
