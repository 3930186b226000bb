"""Overlapping 3D tiling (reference old/infer_sliding.py:187-209 —
``get_tile_locations``, left unfinished there; completed here).

Tiles a volume into fixed-size overlapping boxes whose grid is centered
when the extent doesn't divide; ``stitch_tiles`` blends overlapping tile
results back with uniform averaging. Used to push volumes beyond HBM
capacity through the extraction pipeline.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def get_tile_locations(
    shape: tuple[int, ...],
    tile_sz: tuple[int | None, ...],
    overlap: tuple[int, ...],
    dim: int = 3,
) -> np.ndarray:
    """(T, 2, dim) array of [start, end) boxes.

    Reference semantics: per axis, steps of ``tile - overlap`` from 0; the
    grid is shifted to center the coverage when the extent is not
    divisible; ``None`` tile size means "use the whole axis".
    """
    max_dims = tuple(shape[-dim:])
    axes_idx = []
    for tile, maxd, overl in zip(tile_sz, max_dims, overlap):
        if tile is None:
            idx = [0]
        else:
            end = maxd + 1 - tile if maxd > tile else 0
            step = tile - overl
            idx = list(range(0, end, step)) if end > step else [0]
            if idx and idx[-1] < end - 1:
                shift = (end - idx[-1]) // 2
                idx = [i + shift for i in idx]
        axes_idx.append(np.asarray(idx, np.int64))
    start = np.stack(
        np.meshgrid(*axes_idx, indexing="ij"), axis=-1
    ).reshape(-1, dim)
    start = np.unique(start, axis=0)
    eff_tile = np.asarray(
        [t if t is not None else m for t, m in zip(tile_sz, max_dims)],
        np.int64,
    )
    end = start + eff_tile
    return np.stack([start, end], axis=-2)  # (T, 2, dim)


def extract_tiles(vol: jnp.ndarray, locations: np.ndarray) -> list[jnp.ndarray]:
    """Cut the (W, H, D) volume into the located tiles."""
    return [
        vol[..., s[0]:e[0], s[1]:e[1], s[2]:e[2]] for s, e in locations
    ]


def stitch_tiles(
    tiles: list[jnp.ndarray],
    locations: np.ndarray,
    out_shape: tuple[int, ...],
) -> jnp.ndarray:
    """Average overlapping tiles back into a full volume.

    ``tiles[i]`` may have leading channel dims; trailing dims must equal
    the located box size.
    """
    lead = tiles[0].shape[:-3]
    acc = jnp.zeros(lead + tuple(out_shape), jnp.float32)
    cnt = jnp.zeros(out_shape, jnp.float32)
    for t, (s, e) in zip(tiles, locations):
        acc = acc.at[..., s[0]:e[0], s[1]:e[1], s[2]:e[2]].add(
            t.astype(jnp.float32)
        )
        cnt = cnt.at[s[0]:e[0], s[1]:e[1], s[2]:e[2]].add(1.0)
    return acc / jnp.maximum(cnt, 1.0)
