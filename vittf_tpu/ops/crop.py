"""Crop-to-content helpers (reference bilateral_solver3d.py:183-209).

``crop_pad`` computes the bounding box of ``sim > thresh`` (plus padding)
and crops a list of volumes to it; ``write_crop_into`` writes a refined
crop back. Shapes are data-dependent, so this runs at the host level
between jitted stages (the reference likewise does it eagerly on concrete
tensors); the box itself is computed on device with masked min/max.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def bounding_box(
    mask: jnp.ndarray, pad: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """(mi, ma) corner arrays of the trailing-3-dims bounding box of ``mask``.

    Parity with reference crop_pad: mi clamped at 0, ma at shape (exclusive).
    """
    shape = np.asarray(mask.shape[-3:])
    # fetch as uint8: bool device→host transfers hang on some TPU transports
    m = np.asarray(jnp.asarray(mask).astype(jnp.uint8))
    m = m.reshape(-1, *mask.shape[-3:]).any(axis=0)
    idx = np.argwhere(m)
    if idx.size == 0:
        return np.zeros(3, np.int64), shape.astype(np.int64)
    mi = np.clip(idx.min(axis=0) - pad, 0, None)
    ma = np.minimum(idx.max(axis=0) + pad + 1, shape)
    return mi, ma


def crop_pad(sim, thresh: float = 0.1, pad: int = 0):
    """Crop volume(s) to where ``sim > thresh`` (reference :183-204).

    ``sim`` may be a tensor or a list; the first element defines the box.
    Returns (cropped_or_list, (mi, ma)).
    """
    others = sim if isinstance(sim, list) else [sim]
    first = others[0]
    mi, ma = bounding_box(first > thresh, pad=pad)
    cropped = [
        s[..., mi[0] : ma[0], mi[1] : ma[1], mi[2] : ma[2]] for s in others
    ]
    if isinstance(sim, list):
        return cropped, (mi, ma)
    return cropped[0], (mi, ma)


def write_crop_into(uncropped: jnp.ndarray, crop: jnp.ndarray, mima) -> jnp.ndarray:
    """Write ``crop`` back into ``uncropped`` at the box (reference :206-209).

    Functional (returns a new array) — jnp arrays are immutable.
    """
    mi, ma = mima
    return jnp.asarray(uncropped).at[
        ..., mi[0] : ma[0], mi[1] : ma[1], mi[2] : ma[2]
    ].set(jnp.asarray(crop))
