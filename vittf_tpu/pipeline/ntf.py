"""NTF (neural transfer function) similarity + prediction pipeline.

TPU-native equivalent of the reference ``compute_similarities`` and the
NTF predictor CLI (predict_ntf.py:24-101, 104-256). The similarity matmul
runs through the fused Pallas kernel (``ops.similarity``); the quantize /
resize / fuse steps reproduce the reference's artifact semantics exactly,
including its float→uint8 wraparound (values above 255 — the top ~1% by
construction of the 255/(0.99·max) scale — wrap modulo 256 under torch's
cast; see ``quantize_uint8_torch``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.resize import resize_nearest
from vittf_tpu.ops.sampling import rel_coords_from_abs, sample_features3d
from vittf_tpu.ops.similarity import (
    DEFAULT_EXPONENT,
    DEFAULT_THRESHOLD,
    fused_similarity_m,
)

# CT-ORG fusion operating point (predict_ntf.py:207-208)
CT_ORG_NAMES = ["liver", "bladder", "lung", "kidney", "bone"]
CT_ORG_THRESHOLDS = [0.486, 0.264, 0.236, 0.68, 0.291]


def quantize_uint8_torch(x: jnp.ndarray) -> jnp.ndarray:
    """float → uint8 with torch cast semantics (truncate, wrap mod 256)."""
    return (jnp.trunc(x) % 256).astype(jnp.uint8)


def _bucket_annotations(total: int, step: int = 256) -> int:
    return -(-max(total, 1) // step) * step


@partial(
    jax.jit,
    static_argnames=(
        "in_dims", "sim_shape", "threshold", "exponent", "mean_first", "impl",
    ),
)
def _similarities_device(
    in_dims: tuple[int, int, int],  # volume shape (coords are relative to it)
    features: jnp.ndarray,
    abs_coords: jnp.ndarray,  # (A_pad, 3), zero-padded
    class_mat: jnp.ndarray,  # (A_pad, C), zero rows for padding
    sim_shape: tuple[int, int, int],
    threshold: float,
    exponent: float,
    mean_first: bool,
    impl: str,
) -> jnp.ndarray:
    """Whole no-BLS similarity path in ONE jit → (C, *sim_shape) uint8.

    A single dispatch matters: under the TPU tunnel each eager op is a
    network round trip; fusing sampling → fused-similarity kernel →
    quantize → resize into one compiled call makes interactive
    re-similarity a single round trip. The annotation axis is padded to a
    bucket and the class-mean matrix is a runtime value, so adding or
    removing annotations does NOT recompile. Only the volume's SHAPE is
    needed (coords are normalized against it) — the volume itself stays
    out of the dispatch.
    """
    feat_dims = tuple(features.shape[-3:])
    F_dim = features.shape[0]

    rel = rel_coords_from_abs(abs_coords, in_dims)
    qf = sample_features3d(features, rel, mode="bilinear")[0, 0]  # (A_pad, F)

    feats_flat = jnp.moveaxis(features, 0, -1).reshape(-1, F_dim)
    # class-major kernel layout: the (C, N) store is lane-dense and already
    # in volume order — no (N, C) → (C, W, H, D) transpose afterwards
    sims_cn = fused_similarity_m(
        feats_flat, qf, class_mat,
        threshold=threshold, exponent=exponent,
        mean_first=mean_first, impl=impl, out_layout="cn",
    )  # (C, N)
    C = class_mat.shape[1]
    sims = sims_cn.reshape(C, *feat_dims)

    # per-class 0.99·max quantization + nearest resize (predict_ntf.py:95-100)
    # (clamped so all-zero classes — zero-padded class-bucket columns or
    # empty mid-annotation classes — quantize to 0 instead of NaN)
    quant = jnp.maximum(
        0.99 * sims.max(axis=(1, 2, 3), keepdims=True), jnp.float32(1e-30)
    )
    sims_u8 = quantize_uint8_torch(255.0 / quant * sims)
    if feat_dims != sim_shape:
        sims_u8 = resize_nearest(sims_u8, sim_shape)
    return sims_u8


@partial(
    jax.jit,
    static_argnames=("in_dims", "threshold", "exponent", "mean_first", "impl"),
)
def _raw_similarities_device(
    in_dims: tuple[int, int, int],
    features: jnp.ndarray,
    abs_coords: jnp.ndarray,  # (A_pad, 3), zero-padded
    class_mat: jnp.ndarray,  # (A_pad, C)
    threshold: float,
    exponent: float,
    mean_first: bool,
    impl: str,
) -> jnp.ndarray:
    """Float (C, W', H', D') similarities in one dispatch (pre-refinement).

    Same padded-annotation contract as ``_similarities_device`` so the BLS
    path also reuses compiled graphs across annotation edits; quantization
    happens after the (data-dependent) bilateral refinement instead.
    """
    feat_dims = tuple(features.shape[-3:])
    F_dim = features.shape[0]
    rel = rel_coords_from_abs(abs_coords, in_dims)
    qf = sample_features3d(features, rel, mode="bilinear")[0, 0]
    feats_flat = jnp.moveaxis(features, 0, -1).reshape(-1, F_dim)
    sims_cn = fused_similarity_m(
        feats_flat, qf, class_mat,
        threshold=threshold, exponent=exponent,
        mean_first=mean_first, impl=impl, out_layout="cn",
    )  # (C, N) — see _similarities_device
    C = class_mat.shape[1]
    return sims_cn.reshape(C, *feat_dims)


def compute_similarities(
    volume: jnp.ndarray,
    features: jnp.ndarray,
    annotations: dict[str, np.ndarray],
    bilateral_solver: bool = False,
    threshold: float = DEFAULT_THRESHOLD,
    exponent: float = DEFAULT_EXPONENT,
    impl: str = "auto",
    bls_shape_bucket: int | None = None,
    class_bucket: int | None = None,
    bls_ref_u8: jnp.ndarray | None = None,
    mean_first: bool | None = None,
) -> dict[str, jnp.ndarray] | None:
    """Per-class uint8 similarity volumes at half resolution.

    Reference-parity port of predict_ntf.py:24-101:
    - annotation coords → rel coords over the FULL volume extent (:56)
    - bilinear feature sampling (:59)
    - fused dot-threshold-sharpen-mean (:62-72); the single-class >1024
      fast path averages raw dots first (:62-63)
    - optional 3D bilateral refinement on a cropped half-res grid (:73-94)
    - 255/(0.99·max) uint8 quantization (:95-100), then nearest resize to
      half resolution (no-BLS path)

    Args:
        volume:   (W, H, D) scalar volume.
        features: (F, W', H', D') feature volume.
        annotations: {class: (A_c, 3) absolute voxel coords}.
        class_bucket: pad the class axis to a multiple of this (zero
            mean-matrix columns — exact) so interactive sessions adding or
            removing classes reuse the compiled graphs, the same way the
            annotation axis is bucketed. None = exact class count.
        mean_first: override the single-class >1024 mean-first fast path
            decision. Dirty-class sessions pass the decision computed on
            the FULL class set so a one-class recompute stays numerically
            identical to recomputing every class.
    """
    if len(annotations) == 0:
        return None
    counts = tuple(int(v.shape[0]) for v in annotations.values())
    if sum(counts) == 0:
        return None

    in_dims = tuple(volume.shape[-3:])
    sim_shape = tuple(d // 2 for d in in_dims)
    if mean_first is None:
        mean_first = len(annotations) == 1 and counts[0] > 1024
    if impl == "auto":
        import jax

        impl = (
            "pallas"
            if jax.devices()[0].platform in ("tpu", "axon")
            else "xla"
        )

    abs_np = np.concatenate(
        [np.asarray(v) for v in annotations.values()], axis=0
    ).astype(np.float32)

    # pad the annotation axis to a bucket (both branches): interactive
    # annotation changes then reuse the compiled graph (zero mean-matrix
    # rows make the padding exact)
    from vittf_tpu.ops.similarity import class_mean_matrix

    apad = _bucket_annotations(abs_np.shape[0])
    coords_p = np.zeros((apad, 3), np.float32)
    coords_p[: abs_np.shape[0]] = abs_np
    C = len(counts)
    counts_p = list(counts)
    if class_bucket:
        counts_p += [0] * (-(-C // class_bucket) * class_bucket - C)
    m = class_mean_matrix(counts_p, apad)

    if not bilateral_solver:
        sims_u8 = _similarities_device(
            in_dims, features, jnp.asarray(coords_p), jnp.asarray(m),
            sim_shape, threshold, exponent, mean_first, impl,
        )
        return {name: sims_u8[c] for c, name in enumerate(annotations.keys())}

    # BLS path: the crop is data-dependent, so the refinement composes
    # jitted stages; the raw similarity still runs as one padded dispatch
    sims = _raw_similarities_device(
        in_dims, features, jnp.asarray(coords_p), jnp.asarray(m),
        threshold, exponent, mean_first, impl,
    )
    if bls_shape_bucket:
        # bucketed interactive mode: ALL classes refined + quantized in one
        # vmapped dispatch chain (~3 round trips instead of ~6·C)
        from vittf_tpu.pipeline.refine import refine_similarities_batched

        sims_u8 = refine_similarities_batched(
            sims, volume, sim_shape, shape_bucket=bls_shape_bucket,
            ref_u8=bls_ref_u8,
        )
        return {name: sims_u8[c] for c, name in enumerate(annotations.keys())}

    # reference-parity mode: per-class tight crop boxes
    from vittf_tpu.pipeline.refine import refine_similarity

    similarities = {}
    for c, name in enumerate(annotations.keys()):
        sim = refine_similarity(
            sims[c], volume, sim_shape, shape_bucket=bls_shape_bucket
        )
        quant = 0.99 * sim.max()
        similarities[name] = quantize_uint8_torch(255.0 / quant * sim)
    return similarities


@partial(jax.jit, static_argnames=("thresholds",))
def _fuse_device(sims: jnp.ndarray, thresholds: tuple) -> jnp.ndarray:
    pred = jnp.zeros(sims.shape[1:], dtype=jnp.uint8)
    pred_vals = jnp.zeros(sims.shape[1:], dtype=sims.dtype)
    for i in range(sims.shape[0]):
        sim = sims[i]
        mask = (sim > int(thresholds[i] * 255)) & (sim > pred_vals)
        pred = jnp.where(mask, jnp.uint8(i + 1), pred)
        pred_vals = jnp.where(mask, sim, pred_vals)
    return pred


def fuse_predictions(
    similarities: dict[str, jnp.ndarray],
    thresholds: list[float] = CT_ORG_THRESHOLDS,
) -> jnp.ndarray:
    """Fuse per-class uint8 sims into a label volume (predict_ntf.py:203-215).

    Class i wins a voxel iff sim_i > threshold_i·255 and sim_i exceeds the
    best previous class (max-sim tie-break); labels are 1-based, 0 =
    background. Thresholds beyond the provided list fall back to the
    similarity threshold 0.25 (the reference indexes its 5 CT-ORG values
    and would crash on more classes). The fuse runs as ONE jitted
    dispatch — interactively every eager op would be a tunnel round trip.
    """
    sims = jnp.stack(list(similarities.values()))
    if len(thresholds) < sims.shape[0]:
        thresholds = list(thresholds) + [DEFAULT_THRESHOLD] * (
            sims.shape[0] - len(thresholds)
        )
    return _fuse_device(sims, tuple(float(t) for t in thresholds[: sims.shape[0]]))


def fuse_predictions_host(
    similarities: dict[str, "np.ndarray"],
    thresholds: list[float] = CT_ORG_THRESHOLDS,
) -> "np.ndarray":
    """``fuse_predictions`` on HOST numpy arrays, bit-identical.

    The interactive serve loop keeps every class's uint8 map cached on
    host (session.export's dirty-fetch cache); fusing there costs a few
    ms of numpy and ZERO device→host transfer, where the device fuse
    would re-ship a full label volume over the link every frame. Exact
    parity with ``_fuse_device`` is tested (same mask order, same uint8
    comparisons)."""
    sims = [np.asarray(v, dtype=np.uint8) for v in similarities.values()]
    ths = list(thresholds) + [DEFAULT_THRESHOLD] * (
        max(0, len(sims) - len(thresholds))
    )
    pred = np.zeros(sims[0].shape, np.uint8)
    pred_vals = np.zeros(sims[0].shape, np.uint8)
    for i, sim in enumerate(sims):
        mask = (sim > int(ths[i] * 255)) & (sim > pred_vals)
        pred[mask] = np.uint8(i + 1)
        pred_vals[mask] = sim[mask]
    return pred


def upscale_prediction(pred: jnp.ndarray, vol_shape: tuple) -> jnp.ndarray:
    """Nearest-resize a label volume to the full volume shape
    (predict_ntf.py:217-218)."""
    if tuple(pred.shape[-3:]) == tuple(vol_shape[-3:]):
        return pred
    return resize_nearest(pred, tuple(vol_shape[-3:]))
