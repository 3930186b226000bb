"""Dimension-lifting and normalization utilities.

TPU-native equivalents of the reference's L0 tensor helpers
(reference: infer.py:10-37, old/utils.py:89-108). Pure ``jnp`` — safe to
call inside ``jit``.
"""
from __future__ import annotations

import jax.numpy as jnp

# ImageNet normalization constants (reference: infer.py:39-40).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def make_nd(t: jnp.ndarray, n: int) -> jnp.ndarray:
    """Prepend singleton dimensions to ``t`` until it is ``n``-dimensional.

    Reference parity: infer.py:10-18 (raises if ``t.ndim > n``).
    """
    if n < t.ndim:
        raise ValueError(
            f"make_nd cannot reduce cardinality: ndim={t.ndim} > n={n}"
        )
    return t.reshape((1,) * (n - t.ndim) + t.shape)


def make_3d(t: jnp.ndarray) -> jnp.ndarray:
    """Prepend singleton dimensions until 3D (infer.py:20-22)."""
    return make_nd(t, 3)


def make_4d(t: jnp.ndarray) -> jnp.ndarray:
    """Prepend singleton dimensions until 4D (infer.py:24-26)."""
    return make_nd(t, 4)


def make_5d(t: jnp.ndarray) -> jnp.ndarray:
    """Prepend singleton dimensions until 5D (infer.py:28-30)."""
    return make_nd(t, 5)


def norm_minmax(t: jnp.ndarray) -> jnp.ndarray:
    """Scale ``t`` into [0, 1] by its global min/max (infer.py:32-34)."""
    mi = t.min()
    ma = t.max()
    return (t - mi) / (ma - mi)


def norm_mean_std(t: jnp.ndarray, mu: float = 0.0, std: float = 1.0) -> jnp.ndarray:
    """Standardize to mean ``mu`` / std ``std`` (infer.py:36-37).

    Matches the reference operation order: ``(x - mean(x)) * std / std(x) + mu``
    with the population std the reference's ``Tensor.std`` uses (ddof=1).
    """
    tf = t.astype(jnp.float32)
    return (tf - tf.mean()) * std / tf.std(ddof=1) + mu


def imagenet_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """Channel-wise ImageNet normalization of ``(..., 3, H, W)`` images.

    Equivalent of torchvision ``normalize(img, in_mean, in_std)`` as used at
    reference infer.py:155.
    """
    mean = jnp.asarray(IMAGENET_MEAN, dtype=images.dtype).reshape(3, 1, 1)
    std = jnp.asarray(IMAGENET_STD, dtype=images.dtype).reshape(3, 1, 1)
    return (images - mean) / std
