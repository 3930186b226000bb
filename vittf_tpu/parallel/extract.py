"""Multi-device feature extraction and similarity via shard_map.

The TPU-native replacement for the reference's per-axis Python loop and
SLURM fan-out (SURVEY.md §2.4):

- extraction: slice batches are sharded over the ``data`` mesh axis; each
  device runs the fused scan (ViT forward + pooled accumulation, Pallas
  attention locally) on its shard and the per-axis pooled accumulators are
  combined with one psum — exact, because the slice-axis adaptive pool is
  a linear sum over slices (infer.py:332's sum becomes the psum)
- similarity: the flattened voxel axis is sharded over ``data`` (the
  "sequence-parallel" analog — millions of voxels sharded, KB-scale query
  features replicated); no collectives needed beyond the implicit
  replication of queries

shard_map is used rather than GSPMD auto-sharding so the Pallas kernels
run as-is on each device's local shard.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vittf_tpu.models.vit import ViTConfig
from vittf_tpu.pipeline.features import (
    ExtractConfig,
    _build_fused_all_stacks,
    _fused_all_applicable,
    _fused_all_outputs,
    _pool_to,
    _pooled_to_volume,
    _qkv_index,
    _scan_pooled_extraction,
    compute_im_sizes,
    prepare_axis_batches,
)


def _pad_batches_to(slices_b, w_pool_b, ndata):
    """Pad the batch axis to a multiple of ndata; zero pool weights make
    the padding exact. Handles both (nb, o, B) and (nb, A, o, B) weights."""
    nb = slices_b.shape[0]
    nb_pad = -(-nb // ndata) * ndata
    if nb_pad != nb:
        slices_b = jnp.pad(
            slices_b, ((0, nb_pad - nb),) + ((0, 0),) * (slices_b.ndim - 1)
        )
        w_pool_b = jnp.pad(
            w_pool_b, ((0, nb_pad - nb),) + ((0, 0),) * (w_pool_b.ndim - 1)
        )
    return slices_b, w_pool_b


def _extract_fused_sharded(vol, params, model_cfg, cfg, mesh, im_sz,
                           feat_out_sz, mima):
    """Sharded twin of pipeline.features._extract_all_axes_fused: all three
    axis sweeps concatenated into ONE shard_map'd scan (one dispatch/compile
    instead of three), batches sharded over ``data``, pooled accumulators
    combined with one psum. Exact for the same reason the sequential fused
    path is: off-axis pool-weight rows are zero and zero-padded batches
    carry zero weight."""
    ndata = mesh.shape["data"]
    dtype = jnp.dtype(cfg.compute_dtype)
    key_idx = tuple(_qkv_index(k) for k in cfg.return_keys)
    # identity_pool (geom[-1]) is deliberately unused here: the sharded
    # scan keeps the dense einsum accumulator so each device's partial is
    # psum-combinable; its per-device traffic divides by the device count
    slices_all, w_all, (img_hw, f_hw, o_ax, _) = _build_fused_all_stacks(
        vol, model_cfg, im_sz, feat_out_sz, cfg.batch_size,
        cfg.slice_subsample,
    )
    slices_all, w_all = _pad_batches_to(slices_all, w_all, ndata)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=P(),
        check_vma=False,
    )
    def run(p, sb, wb):
        acc = _scan_pooled_extraction(
            p, sb, wb, model_cfg, img_hw, f_hw, o_ax,
            key_idx, cfg.precision, cfg.attn_impl, dtype,
            cfg.feature_source, cfg.block_impl, mima,
        )
        return tuple(jax.lax.psum(a, "data") for a in acc)

    acc = jax.jit(run)(params, slices_all, w_all)
    D = (
        model_cfg.embed_dim
        if cfg.feature_source == "qkv"
        else model_cfg.embed_dim // 3
    )
    return _fused_all_outputs(acc, cfg.return_keys, f_hw, o_ax, feat_out_sz, D)


def extract_features_sharded(
    vol: jnp.ndarray,
    params: dict,
    model_cfg: ViTConfig,
    cfg: ExtractConfig,
    mesh: Mesh,
) -> dict[str, jnp.ndarray]:
    """Data-parallel ``extract_features`` over ``mesh``'s ``data`` axis."""
    vol = jnp.asarray(vol)
    if not jnp.issubdtype(vol.dtype, jnp.floating) or vol.dtype == jnp.float64:
        vol = vol if vol.dtype in (jnp.uint8, jnp.uint16, jnp.int16) else vol.astype(jnp.float32)
    im_sz, feat_out_sz = compute_im_sizes(
        vol.shape, cfg.feature_output_size, model_cfg.patch_size
    )
    # same contract as pipeline.features: slice stacks keep the raw dtype,
    # min-max normalization happens per batch in the scan from scalars
    mima = (vol.min().astype(jnp.float32), vol.max().astype(jnp.float32))
    vol_normed = vol
    if _fused_all_applicable(vol, cfg):
        # cubic 'all' sweep: one sharded dispatch/compile for all three axes
        return _extract_fused_sharded(
            vol_normed, params, model_cfg, cfg, mesh, im_sz, feat_out_sz,
            mima,
        )

    ndata = mesh.shape["data"]
    dtype = jnp.dtype(cfg.compute_dtype)
    key_idx = tuple(_qkv_index(k) for k in cfg.return_keys)

    axes = ["z", "y", "x"] if cfg.slice_along == "all" else [cfg.slice_along]
    out: dict[str, jnp.ndarray] = {}
    for ax in axes:
        slices_b, w_pool_b, (img_hw, f_hw, o_ax, out_axis, _) = (
            prepare_axis_batches(
                vol_normed, model_cfg, ax, im_sz, feat_out_sz,
                cfg.batch_size, cfg.slice_subsample, cfg.pooling(),
            )
        )
        slices_b, w_pool_b = _pad_batches_to(slices_b, w_pool_b, ndata)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P(),
            # the scan carry starts replicated but becomes device-varying;
            # the trailing psum restores replication — skip the static check
            check_vma=False,
        )
        def run(p, sb, wb):
            acc = _scan_pooled_extraction(
                p, sb, wb, model_cfg, img_hw, f_hw, o_ax,
                key_idx, cfg.precision, cfg.attn_impl, dtype,
                cfg.feature_source, cfg.block_impl, mima,
            )
            return tuple(jax.lax.psum(a, "data") for a in acc)

        acc = jax.jit(run)(params, slices_b, w_pool_b)
        D = (
            model_cfg.embed_dim
            if cfg.feature_source == "qkv"
            else model_cfg.embed_dim // 3
        )
        axis_feats = {
            name: _pooled_to_volume(pooled, f_hw, o_ax, out_axis, D)
            for name, pooled in zip(cfg.return_keys, acc)
        }
        if cfg.slice_along == "all":
            axis_feats = {k: _pool_to(v, feat_out_sz) for k, v in axis_feats.items()}
        for k, v in axis_feats.items():
            out[k] = out.get(k, 0) + v
    return out


def similarity_sharded(
    feats_flat: jnp.ndarray,
    queries: jnp.ndarray,
    class_mat: jnp.ndarray,
    mesh: Mesh,
    threshold: float = 0.25,
    exponent: float = 2.5,
    mean_first: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Voxel-sharded fused similarity: (N, F) sharded over ``data``."""
    from vittf_tpu.ops.similarity import similarity_pallas, similarity_xla

    N = feats_flat.shape[0]
    ndata = mesh.shape["data"]
    npad = -(-N // ndata) * ndata
    feats_p = jnp.pad(feats_flat, ((0, npad - N), (0, 0)))

    use_pallas = impl == "pallas" or (
        impl == "auto" and jax.devices()[0].platform in ("tpu", "axon")
    )
    fn = similarity_pallas if use_pallas else similarity_xla

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("data"), P(), P()),
        out_specs=P("data"),
    )
    def run(f_local, q, m):
        return fn(f_local, q, m, threshold, exponent, mean_first)

    out = jax.jit(run)(feats_p, queries, class_mat)
    return out[:N]
