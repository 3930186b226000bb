"""Annotation samplers: synthetic annotations drawn from ground-truth masks.

TPU-native port of the reference samplers (compare_feat_sampling.py:13-33):
- ``sample_uniform``: uniform without-replacement draw over mask voxels,
  with the >2²⁴ stride-2 thinning rule
- ``sample_surface``: voxels on a shell obtained by double binary erosion
  (structure connectivities ``dist_from_surface`` then 1) XOR
- ``sample_both``: half uniform + half surface

Two implementations, bit-identical by construction:

- ``impl='host'``: the reference's shape — ``np.argwhere`` over the mask,
  then ``rng.choice`` without replacement. At 512³ the argwhere pass plus
  the shell's device→host fetch cost tens of seconds per volume.
- ``impl='device'`` (default): the mask never leaves the device. argwhere
  lists voxels in C order, so the k-th listed voxel is exactly the voxel
  of *rank* k in the mask's flat cumulative popcount — selecting ranks via
  one cumsum + searchsorted dispatch reproduces ``argwhere(mask)[sel]``
  without materializing the index list. Only a scalar popcount and the
  (n, 3) result cross the link, and the erosion shell stays device-side.
  Both paths draw the SAME rng values in the same order, so they return
  identical coordinates (tested in tests/test_predictors_eval.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.morphology import binary_erosion, generate_binary_structure

# reference compare_feat_sampling.py:15-16 thins >2^24-voxel masks by
# striding; module-level so tests can exercise the rule on small masks
THIN_LIMIT = 2**24


def _default_rng(rng):
    return rng if rng is not None else np.random.default_rng()


@jax.jit
def _popcount(mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(mask, dtype=jnp.int32)


@jax.jit
def _rank_select(mask: jnp.ndarray, ranks: jnp.ndarray) -> jnp.ndarray:
    """Coords of the mask voxels with the given C-order ranks.

    ``cumsum(mask)[i]`` counts true voxels in flat positions [0, i], so the
    first position where it exceeds r is the flat index of the r-th true
    voxel — the same voxel ``np.argwhere(mask)[r]`` names."""
    cs = jnp.cumsum(mask.reshape(-1).astype(jnp.int32))
    pos = jnp.searchsorted(cs, ranks.astype(jnp.int32), side="right")
    return jnp.stack(jnp.unravel_index(pos, mask.shape), axis=-1)


def _select_ranks(mask, ranks: np.ndarray) -> np.ndarray:
    coords = _rank_select(mask, jnp.asarray(ranks.astype(np.int32)))
    return np.asarray(jax.device_get(coords)).astype(np.int64)


def _as_device_mask(mask) -> jnp.ndarray:
    m = jnp.asarray(mask)
    return m if m.dtype == jnp.bool_ else m.astype(bool)


def sample_uniform(
    mask,
    n_samples: int,
    thin_to_reasonable: bool = False,
    rng: np.random.Generator | None = None,
    impl: str = "device",
) -> np.ndarray:
    """(n, 3) voxel coords drawn uniformly without replacement."""
    rng = _default_rng(rng)
    if impl == "host":
        idxs = np.argwhere(np.asarray(mask))
        while thin_to_reasonable and idxs.shape[0] > THIN_LIMIT:
            idxs = idxs[::2]
        n = min(n_samples, idxs.shape[0])
        sel = rng.choice(idxs.shape[0], size=n, replace=False)
        return idxs[sel]
    m = _as_device_mask(mask)
    count = int(jax.device_get(_popcount(m)))
    # idxs[::2] keeps ranks 0, 2, 4, …: t thinnings leave ceil-halved
    # counts and map thinned rank r back to original rank r·2^t
    stride = 1
    while thin_to_reasonable and count > THIN_LIMIT:
        count = (count + 1) // 2
        stride *= 2
    n = min(n_samples, count)
    sel = rng.choice(count, size=n, replace=False)
    return _select_ranks(m, sel * stride)


def _surface_shell_device(mask: jnp.ndarray, dist_from_surface: int = 4):
    stel1 = generate_binary_structure(3, dist_from_surface)
    stel2 = generate_binary_structure(3, 1)
    outer = binary_erosion(mask, stel1)
    inner = binary_erosion(outer, stel2)
    return jnp.logical_xor(inner, outer)


def surface_shell(mask: np.ndarray, dist_from_surface: int = 4) -> np.ndarray:
    """Shell mask: erode(struct=conn d) XOR erode again (struct=conn 1).

    The two erosions and the XOR run in one device round trip; the result
    is fetched as uint8 (bool device→host transfers hang on some TPU
    transports).
    """
    shell = _surface_shell_device(jnp.asarray(mask), dist_from_surface)
    return np.asarray(shell.astype(jnp.uint8)).astype(bool)


def sample_surface(
    mask,
    n_samples: int,
    dist_from_surface: int = 4,
    rng: np.random.Generator | None = None,
    impl: str = "device",
) -> np.ndarray:
    """(n, 3) coords on the erosion shell; returns all shell voxels if the
    shell is smaller than ``n_samples`` (reference :26-30)."""
    rng = _default_rng(rng)
    if impl == "host":
        surf = np.argwhere(surface_shell(mask, dist_from_surface))
        if surf.shape[0] > n_samples:
            sel = rng.choice(surf.shape[0], size=n_samples, replace=False)
            return surf[sel]
        return surf
    shell = _surface_shell_device(_as_device_mask(mask), dist_from_surface)
    count = int(jax.device_get(_popcount(shell)))
    if count > n_samples:
        ranks = rng.choice(count, size=n_samples, replace=False)
    else:
        ranks = np.arange(count)
    return _select_ranks(shell, ranks)


def sample_both(
    mask,
    n_samples: int,
    dist_from_surface: int = 4,
    thin_to_reasonable: bool = False,
    rng: np.random.Generator | None = None,
    impl: str = "device",
) -> np.ndarray:
    """Half uniform, half surface (reference :32-33)."""
    rng = _default_rng(rng)
    return np.concatenate(
        [
            sample_uniform(
                mask, n_samples // 2, thin_to_reasonable=thin_to_reasonable,
                rng=rng, impl=impl,
            ),
            sample_surface(
                mask, n_samples // 2, dist_from_surface=dist_from_surface,
                rng=rng, impl=impl,
            ),
        ]
    )


SAMPLING_MODES = {
    "uniform": sample_uniform,
    "surface": sample_surface,
    "both": sample_both,
}


@jax.jit
def _class_mask(labels: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    return labels == i


def annotations_from_labels(
    labels,
    num_samples: float,
    mode: str = "both",
    rng: np.random.Generator | None = None,
    impl: str = "device",
) -> dict[str, np.ndarray]:
    """Draw per-class annotations from a GT label volume.

    Reference semantics (predict_ntf.py:157-172): ``num_samples > 1`` is an
    absolute count (capped at the class size); ``0 < num_samples ≤ 1`` is a
    fraction of class voxels; classes with zero samples are skipped; keys
    are ``ntf{i}``.

    ``impl='device'`` uploads the label volume once and keeps every
    per-class mask, erosion shell, and count on device (the host path pays
    an argwhere pass plus a full shell fetch per class — ~44 s at 512³ on
    the tunnel transport, reduced to the erosion convs + scalar fetches).
    """
    rng = _default_rng(rng)
    draw = SAMPLING_MODES[mode]
    if impl == "host":
        labels = np.asarray(labels)
        n_classes = int(labels.max())
    else:
        labels = jnp.asarray(labels)
        n_classes = int(jax.device_get(labels.max()))
    out = {}
    for i in range(1, n_classes + 1):
        if impl == "host":
            mask = labels == i
            size = int(mask.sum())
        else:
            mask = _class_mask(labels, jnp.asarray(i, labels.dtype))
            size = int(jax.device_get(_popcount(mask)))
        if num_samples > 1.0:
            n = min(int(num_samples), size)
        elif num_samples > 0.0:
            n = int(num_samples * size)
        else:
            raise ValueError(f"Invalid num_samples: {num_samples}")
        if n > 0:
            kwargs = {"rng": rng, "impl": impl}
            if mode in ("uniform", "both"):
                kwargs["thin_to_reasonable"] = True
            out[f"ntf{i}"] = draw(mask, n, **kwargs)
    return out
