"""Annotation samplers: synthetic annotations drawn from ground-truth masks.

TPU-native port of the reference samplers (compare_feat_sampling.py:13-33):
- ``sample_uniform``: uniform without-replacement draw over mask voxels,
  with the >2²⁴ stride-2 thinning rule
- ``sample_surface``: voxels on a shell obtained by double binary erosion
  (structure connectivities ``dist_from_surface`` then 1) XOR
- ``sample_both``: half uniform + half surface

Mask nonzero extraction is data-dependent (dynamic count), so sampling runs
at the host boundary with numpy; the erosions run on device through
``ops.morphology``. All samplers take a ``numpy.random.Generator`` for
determinism.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.morphology import binary_erosion, generate_binary_structure


def _default_rng(rng):
    return rng if rng is not None else np.random.default_rng()


def sample_uniform(
    mask: np.ndarray,
    n_samples: int,
    thin_to_reasonable: bool = False,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """(n, 3) voxel coords drawn uniformly without replacement."""
    rng = _default_rng(rng)
    idxs = np.argwhere(np.asarray(mask))
    while thin_to_reasonable and idxs.shape[0] > 2**24:
        idxs = idxs[::2]
    n = min(n_samples, idxs.shape[0])
    sel = rng.choice(idxs.shape[0], size=n, replace=False)
    return idxs[sel]


def surface_shell(mask: np.ndarray, dist_from_surface: int = 4) -> np.ndarray:
    """Shell mask: erode(struct=conn d) XOR erode again (struct=conn 1).

    The two erosions and the XOR run in one device round trip; the result
    is fetched as uint8 (bool device→host transfers hang on some TPU
    transports).
    """
    stel1 = generate_binary_structure(3, dist_from_surface)
    stel2 = generate_binary_structure(3, 1)
    outer = binary_erosion(jnp.asarray(mask), stel1)
    inner = binary_erosion(outer, stel2)
    shell = jnp.logical_xor(inner, outer).astype(jnp.uint8)
    return np.asarray(shell).astype(bool)


def sample_surface(
    mask: np.ndarray,
    n_samples: int,
    dist_from_surface: int = 4,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """(n, 3) coords on the erosion shell; returns all shell voxels if the
    shell is smaller than ``n_samples`` (reference :26-30)."""
    rng = _default_rng(rng)
    surf = np.argwhere(surface_shell(mask, dist_from_surface))
    if surf.shape[0] > n_samples:
        sel = rng.choice(surf.shape[0], size=n_samples, replace=False)
        return surf[sel]
    return surf


def sample_both(
    mask: np.ndarray,
    n_samples: int,
    dist_from_surface: int = 4,
    thin_to_reasonable: bool = False,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Half uniform, half surface (reference :32-33)."""
    rng = _default_rng(rng)
    return np.concatenate(
        [
            sample_uniform(
                mask, n_samples // 2, thin_to_reasonable=thin_to_reasonable, rng=rng
            ),
            sample_surface(
                mask, n_samples // 2, dist_from_surface=dist_from_surface, rng=rng
            ),
        ]
    )


SAMPLING_MODES = {
    "uniform": sample_uniform,
    "surface": sample_surface,
    "both": sample_both,
}


def annotations_from_labels(
    labels: np.ndarray,
    num_samples: float,
    mode: str = "both",
    rng: np.random.Generator | None = None,
) -> dict[str, np.ndarray]:
    """Draw per-class annotations from a GT label volume.

    Reference semantics (predict_ntf.py:157-172): ``num_samples > 1`` is an
    absolute count (capped at the class size); ``0 < num_samples ≤ 1`` is a
    fraction of class voxels; classes with zero samples are skipped; keys
    are ``ntf{i}``.
    """
    rng = _default_rng(rng)
    draw = SAMPLING_MODES[mode]
    labels = np.asarray(labels)
    out = {}
    for i in range(1, int(labels.max()) + 1):
        mask = labels == i
        if num_samples > 1.0:
            n = min(int(num_samples), int(mask.sum()))
        elif num_samples > 0.0:
            n = int(num_samples * mask.sum())
        else:
            raise ValueError(f"Invalid num_samples: {num_samples}")
        if n > 0:
            kwargs = {"rng": rng}
            if mode in ("uniform", "both"):
                kwargs["thin_to_reasonable"] = True
            out[f"ntf{i}"] = draw(mask, n, **kwargs)
    return out
