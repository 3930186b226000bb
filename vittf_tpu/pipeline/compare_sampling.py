"""Similarity-map comparison across annotation-sampling strategies
(reference compare_feat_sampling.py:35-84 __main__ flow).

Normalized features, per-class GT sampling, *unthresholded* squared-dot
similarity averaged over samples (the reference's chunked running mean for
>2¹⁴ queries is mathematically the same mean — here the fused kernel's
blocked accumulation does it), then 255/quantile(0.9999) clamp-quantization
and a ``sim_{class}_{sampler}{n}.npy`` artifact per combination.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.sampling import rel_coords_from_abs, sample_features3d
from vittf_tpu.ops.similarity import fused_similarity
from vittf_tpu.pipeline.annotations import SAMPLING_MODES


def normalize_features(feats: jnp.ndarray) -> jnp.ndarray:
    """F.normalize(feats, dim=0) parity (compare_feat_sampling.py:45)."""
    return feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=0, keepdims=True), 1e-12
    )


def quantize_quantile_u8(sim: jnp.ndarray, q: float = 0.9999) -> jnp.ndarray:
    """255/quantile(q) scale + clamp(0, 255) → uint8
    (compare_feat_sampling.py:82)."""
    scale = 255.0 / jnp.quantile(sim.astype(jnp.float32), q)
    return jnp.clip(scale * sim, 0, 255).astype(jnp.uint8)


def sampling_similarity_map(
    feats_norm: jnp.ndarray,
    abs_coords: np.ndarray,
    exponent: float = 2.0,
    impl: str = "auto",
) -> jnp.ndarray:
    """Mean over samples of (f·q)^exponent, no threshold
    (compare_feat_sampling.py:71-80)."""
    F_dim = feats_norm.shape[0]
    feat_dims = feats_norm.shape[-3:]
    rel = rel_coords_from_abs(
        jnp.asarray(abs_coords, jnp.float32), feat_dims
    )
    qf = sample_features3d(feats_norm, rel, mode="bilinear")[0, 0]
    flat = jnp.moveaxis(feats_norm, 0, -1).reshape(-1, F_dim)
    sims = fused_similarity(
        flat, qf, [qf.shape[0]],
        threshold=-1e30, exponent=exponent, impl=impl,
    )[:, 0]
    return sims.reshape(feat_dims)


def compare_sampling_strategies(
    feats: jnp.ndarray,
    labels: np.ndarray,
    num_samples: float,
    out_dir: str | Path,
    samplers: tuple[str, ...] = ("uniform",),
    rng: np.random.Generator | None = None,
    impl: str = "auto",
) -> dict[str, Path]:
    """Per (class, sampler): similarity map artifact + path dict.

    ``labels`` are on the FEATURE grid (the reference samples coords in
    feature-space: rel coords normalized by vol extent equal feature extent
    there since the label volume matches).
    """
    rng = rng if rng is not None else np.random.default_rng()
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    feats_norm = normalize_features(jnp.asarray(feats))
    written = {}
    labels = np.asarray(labels)
    for i in range(1, int(labels.max()) + 1):
        mask = labels == i
        if num_samples > 1.0:
            n = min(int(num_samples), int(mask.sum()))
        else:
            n = int(num_samples * mask.sum())
        if n == 0:
            continue
        for name in samplers:
            coords = SAMPLING_MODES[name](mask, n, rng=rng)
            sim = sampling_similarity_map(feats_norm, coords, impl=impl)
            sim_u8 = quantize_quantile_u8(sim)
            p = out_dir / f"sim_{i}_sample_{name}{num_samples}.npy"
            np.save(p, np.asarray(sim_u8))
            written[f"{i}_{name}"] = p
    return written
