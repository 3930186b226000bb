"""Similarity refinement: crop → bilateral solve → write-back.

Port of the reference's BLS branch in compute_similarities
(predict_ntf.py:73-96): the scalar volume is trilinearly downsampled to the
half-res similarity grid, quantized to uint8, the similarity map is cropped
to its support (+2 pad at threshold 0.1), refined with the 3D bilateral
solver (σ_spatial=7, σ_luma=σ_chroma=5), and written back.
"""
from __future__ import annotations

import jax.numpy as jnp

from vittf_tpu.ops.bilateral import apply_bilateral_solver3d
from vittf_tpu.ops.crop import crop_pad, write_crop_into
from vittf_tpu.ops.resize import resize_linear
from vittf_tpu.utils.tensor import make_5d, norm_minmax

BLS_GRID_PARAMS = {  # predict_ntf.py:75-79
    "sigma_spatial": 7,
    "sigma_chroma": 5,
    "sigma_luma": 5,
}


def _bucket_box(mima, shape, bucket: int):
    """Grow a [mi, ma) box so each extent is a multiple of ``bucket``,
    keeping it inside ``shape`` (shifting the start when hitting the end)."""
    import numpy as np

    mi, ma = (np.asarray(m).copy() for m in mima)
    for d in range(3):
        want = -(-int(ma[d] - mi[d]) // bucket) * bucket
        want = min(want, shape[d])
        ma[d] = min(mi[d] + want, shape[d])
        mi[d] = ma[d] - want
    return mi, ma


def refine_similarity(
    sim: jnp.ndarray,
    volume: jnp.ndarray,
    sim_shape: tuple[int, int, int],
    grid_params: dict | None = None,
    bs_params: dict | None = None,
    shape_bucket: int | None = None,
) -> jnp.ndarray:
    """Refine one class's similarity map with the 3D bilateral solver.

    Args:
        sim: (W', H', D') float similarity on the feature grid.
        volume: (W, H, D) scalar volume (full resolution).
        sim_shape: target half-resolution grid (W//2, H//2, D//2).
        shape_bucket: if set (e.g. 8), the crop box is grown to multiples
            of this size so interactive frames reuse compiled solver
            graphs instead of recompiling per crop shape. The solve then
            covers a slightly larger (real-voxel) region than the
            reference's tight box — not bit-parity, typically closer to
            the uncropped solve. None (default) = reference-parity box.

    Returns:
        (sim_shape) float32 refined similarity.
    """
    vol = resize_linear(make_5d(jnp.asarray(volume)), sim_shape).reshape(sim_shape)
    vol = norm_minmax(vol)
    vol_u8 = jnp.trunc(255.0 * vol).astype(jnp.uint8)

    sim = jnp.asarray(sim).astype(jnp.float32)
    if tuple(sim.shape[-3:]) != tuple(sim_shape):
        sim = resize_linear(make_5d(sim), sim_shape).reshape(sim_shape)

    crops, mima = crop_pad([sim, vol_u8], thresh=0.1, pad=2)
    if shape_bucket:
        mima = _bucket_box(mima, sim_shape, shape_bucket)
        mi, ma = mima
        crops = [
            t[..., mi[0]:ma[0], mi[1]:ma[1], mi[2]:ma[2]]
            for t in (sim, vol_u8)
        ]
    csim, cvol = crops
    cref = jnp.broadcast_to(cvol[None], (3,) + tuple(cvol.shape))
    csolved = apply_bilateral_solver3d(
        csim[None], cref,
        grid_params={**BLS_GRID_PARAMS, **(grid_params or {})},
        bs_params=bs_params,
    )
    return write_crop_into(sim, csolved, mima)
