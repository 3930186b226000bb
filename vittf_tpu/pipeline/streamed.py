"""Host-streamed feature extraction for volumes past HBM residency.

At 2048³ even a uint8 volume is 8 GB — transferring it whole and holding
the permuted slice stacks alongside stops fitting a 16 GB chip. The
reference's only answer at that scale is offline downsampling
(conversion/halfZ.py, conversion/quaterZ.py); this module instead streams
the ORIGINAL volume through the same fused pooled-extraction scan in
bounded device memory:

- the volume stays a host numpy array; per axis it is viewed (not
  copied) as a slice stack via ``transpose``
- chunks of slice batches are copied host→device one at a time and run
  through a jitted chunk step that CONTINUES the pooled accumulator
  (``_scan_pooled_extraction(init=...)``) — the slice-axis adaptive pool
  is an ordered sum over batches, so chunking is exact, matching
  ``extract_features`` to fp32 accumulation order
- device residency is one chunk of raw slices + the (o_ax, fh·fw, D)
  fp32 accumulator per key, independent of volume size

Fast mode (``slice_subsample``) gathers only the picked planes on the
host, so a 2048³ fast sweep transfers 3·o_ax slices instead of 3·2048.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.models.vit import ViTConfig
from vittf_tpu.ops.resize import _adaptive_avg_weight_matrix
from vittf_tpu.pipeline.features import (
    _AXIS_RULES,
    ExtractConfig,
    _axis_geometry,
    _pool_to,
    _pooled_to_volume,
    _qkv_index,
    _scan_pooled_extraction,
    _subsample_slice_indices,
    compute_im_sizes,
)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "img_hw", "f_hw", "o_ax", "key_idx", "precision",
        "attn_impl", "compute_dtype", "feature_source", "block_impl",
    ),
    donate_argnums=(1,),
)
def _chunk_step(
    params, acc, slices_b, w_pool_b, mima,
    cfg: ViTConfig, img_hw, f_hw, o_ax, key_idx, precision, attn_impl,
    compute_dtype, feature_source, block_impl,
):
    """Advance the pooled accumulators by one chunk of slice batches."""
    return _scan_pooled_extraction(
        params, slices_b, w_pool_b, cfg, img_hw, f_hw, o_ax, key_idx,
        precision, attn_impl, jnp.dtype(compute_dtype), feature_source,
        block_impl, mima, init=acc,
    )


def extract_features_streamed(
    vol: np.ndarray,
    params: dict,
    model_cfg: ViTConfig,
    cfg: ExtractConfig = ExtractConfig(),
    chunk_batches: int = 8,
) -> dict[str, jnp.ndarray]:
    """``extract_features`` semantics with host-side streaming.

    ``vol`` is a host (W, H, D) array (any supported dtype; kept compact —
    min-max normalization happens per batch on device from scalars, the
    same contract as the resident path). ``chunk_batches`` bounds device
    residency: ``chunk_batches · batch_size`` raw slices at a time.

    Matches ``extract_features`` to fp32 accumulation order (exact-match
    tested on CPU in tests/test_streamed.py).
    """
    vol = np.asarray(vol)
    if vol.ndim != 3:
        raise ValueError("streamed extraction handles scalar (W,H,D) volumes")
    if vol.dtype not in (
        np.uint8, np.uint16, np.int16, np.float16, np.float32,
    ):
        vol = vol.astype(np.float32)
    im_sz, feat_out_sz = compute_im_sizes(
        vol.shape, cfg.feature_output_size, model_cfg.patch_size
    )
    # one pass over the host array for the normalization scalars
    mima = (
        jnp.float32(np.float32(vol.min())),
        jnp.float32(np.float32(vol.max())),
    )
    key_idx = tuple(_qkv_index(k) for k in cfg.return_keys)
    D = (
        model_cfg.embed_dim
        if cfg.feature_source == "qkv"
        else model_cfg.embed_dim // 3
    )
    bs = cfg.batch_size

    axes = ["z", "y", "x"] if cfg.slice_along == "all" else [cfg.slice_along]
    out: dict[str, jnp.ndarray] = {}
    for ax in axes:
        perm, img_hw, f_hw, o_ax, out_axis = _axis_geometry(
            model_cfg, ax, im_sz, feat_out_sz
        )
        pool = cfg.pooling()
        stack = vol.transpose(perm)  # view, no copy: (S, a, b)
        S = stack.shape[0]
        if not pool:
            o_ax = S
            pool_mat = np.eye(S, dtype=np.float32)
        elif cfg.slice_subsample and S > o_ax:
            pick = _subsample_slice_indices(S, o_ax)
            stack = stack[pick]  # host gather of just the picked planes
            S = o_ax
            pool_mat = np.eye(o_ax, dtype=np.float32)
        else:
            pool_mat = _adaptive_avg_weight_matrix(S, o_ax).astype(np.float32)

        nb = -(-S // bs)
        w_pool = np.pad(pool_mat, ((0, 0), (0, nb * bs - S)))
        acc = tuple(
            jnp.zeros((o_ax, f_hw[0] * f_hw[1], D), jnp.float32)
            for _ in key_idx
        )
        for c0 in range(0, nb, chunk_batches):
            c1 = min(c0 + chunk_batches, nb)
            lo, hi = c0 * bs, min(c1 * bs, S)
            chunk = np.ascontiguousarray(stack[lo:hi])
            if chunk.shape[0] < (c1 - c0) * bs:  # zero-pad the tail chunk
                chunk = np.pad(
                    chunk,
                    ((0, (c1 - c0) * bs - chunk.shape[0]), (0, 0), (0, 0)),
                )
            slices_b = jnp.asarray(
                chunk.reshape(c1 - c0, bs, 1, *chunk.shape[1:])
            )  # H2D: one chunk, (cb, B, C=1, a, b)
            w_b = jnp.asarray(
                w_pool[:, lo : c1 * bs]
                .reshape(o_ax, c1 - c0, bs)
                .transpose(1, 0, 2)
            )
            acc = _chunk_step(
                params, acc, slices_b, w_b, mima, model_cfg, img_hw, f_hw,
                o_ax, key_idx, cfg.precision, cfg.attn_impl,
                cfg.compute_dtype, cfg.feature_source, cfg.block_impl,
            )
        axis_feats = {
            name: _pooled_to_volume(pooled, f_hw, o_ax, out_axis, D)
            for name, pooled in zip(cfg.return_keys, acc)
        }
        if cfg.slice_along == "all":
            axis_feats = {
                k: _pool_to(v, feat_out_sz) for k, v in axis_feats.items()
            }
        for k, v in axis_feats.items():
            out[k] = out.get(k, 0) + v
    return out
