"""Feature extraction: frozen ViT over volume slices, 3-axis merge.

TPU-native redesign of the reference's ``compute_qkv`` (infer.py:130-210)
and the ``--slice-along all`` driver (infer.py:317-333):

reference (GPU, hook-based)                 this module (TPU)
---------------------------------------    ----------------------------------
python loop over slice batches,            one ``lax.scan`` over slice
host→device copy per batch                 batches inside a single ``jit``
forward hook copies qkv to CPU half        qkv is an explicit model output
per batch (infer.py:134)                   staying in HBM
materialize full-res per-axis feature      adaptive-avg-pool along the slice
volume, then AdaptiveAvgPool3d             axis is FUSED into the scan as a
(infer.py:329-333)                         weighted accumulation — the
                                           full-res axis volume never exists
three sequential axis sweeps + sum         same three sweeps (shapes differ
                                           per axis → separate jit), summed
                                           in the accumulator dtype

Key parity facts preserved (SURVEY.md §7 "hard parts"):
- ``im_sz = int(patch * (d // ref_fact))`` with ``ref_fact = sorted(shape)[1]
  / feature_output_size`` (float floor; infer.py:317-319)
- global min-max normalization then ImageNet normalization (infer.py:155)
- per-batch nearest resize of raw slices to ``im_sz`` (infer.py:177)
- CLS-token drop and per-axis inverse permute (infer.py:194-209)
- in-plane feature grids already equal the pooled output grid (the im_sz
  rule guarantees it), so AdaptiveAvgPool3d reduces to a 1D adaptive pool
  along the slice axis — expressed here as an (out, S) matmul fused into
  the accumulation.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.models.vit import ViTConfig, vit_forward_raw
from vittf_tpu.ops.resize import _adaptive_avg_weight_matrix, resize_nearest
from vittf_tpu.utils.tensor import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    imagenet_normalize,
)

# (permute of (W,H,D) → slice stack, image dims (of im_sz), output axis the
# slice index lands on in the (F, o0, o1, o2) feature volume)
_AXIS_RULES = {
    "z": ((2, 0, 1), (0, 1), 3),  # slices (D, W, H); images (W,H)
    "y": ((1, 0, 2), (0, 2), 2),  # slices (H, W, D); images (W,D)
    "x": ((0, 1, 2), (1, 2), 1),  # slices (W, H, D); images (H,D)
}


@dataclass(frozen=True)
class ExtractConfig:
    """Feature-extraction settings (mirrors infer.py CLI surface)."""

    feature_output_size: int = 64
    slice_along: str = "all"  # 'x' | 'y' | 'z' | 'all'
    batch_size: int = 8
    return_keys: tuple = ("k",)
    precision: str = "default"  # 'default' (bf16 MXU) | 'highest' (fp32 parity)
    attn_impl: str = "auto"
    compute_dtype: str = "float32"  # activation dtype: bfloat16 for speed
    # 'qkv' = DINO path (infer.py hook target); 'mlp' = CLIP/BLIP path
    # (infer_clip.py hooks blocks[-1].mlp and splits the output in thirds)
    feature_source: str = "qkv"
    # Fast mode: run the ViT only on the slices nearest the pooled output
    # grid instead of every slice (the reference sketched exactly this and
    # left it commented out, infer.py:160-166). ~(S/o_ax)× fewer ViT
    # forwards; NOT artifact-parity with the default full sweep.
    slice_subsample: bool = False
    # Reference parity: the slice axis is pooled only in the 'all' sweep
    # (infer.py:329 vs :326's pool_fn=_noop). None = follow that rule;
    # True/False overrides explicitly.
    pool_slice_axis: bool | None = None
    # 'xla' | 'fused' — 'fused' runs non-capture blocks through the fused
    # Pallas block kernel (ops/fused_block.py; bf16 speed mode only,
    # ~43% faster block stack). Numerics: same contract as speed mode
    # (bf16 matmuls, fp32 LN/softmax stats) but different accumulation
    # order, so not bit-identical to 'xla' speed mode. On the extraction
    # path 'fused' resolves to the '_nomax' softmax (inputs provably
    # bounded after min-max + ImageNet normalization); 'fused_max' forces
    # the shifted form.
    block_impl: str = "xla"

    def pooling(self, axis_mode: str | None = None) -> bool:
        mode = axis_mode or self.slice_along
        if self.pool_slice_axis is not None:
            return self.pool_slice_axis
        return mode == "all"


def compute_im_sizes(
    vol_shape: tuple[int, int, int], feature_output_size: int, patch_size: int
) -> tuple[tuple[int, int, int], tuple[int, int, int]]:
    """Reference parity: infer.py:317-319 image/feature size rule."""
    ref_fact = sorted(vol_shape)[1] / feature_output_size
    im_sz = tuple(int(patch_size * (d // ref_fact)) for d in vol_shape)
    feat_out_sz = tuple(d // patch_size for d in im_sz)
    return im_sz, feat_out_sz


def _qkv_index(key: str) -> int:
    return {"q": 0, "k": 1, "v": 2}[key]


def _axis_geometry(cfg, axis, im_sz, feat_out_sz):
    perm, im_dims, out_axis = _AXIS_RULES[axis]
    img_hw = (im_sz[im_dims[0]], im_sz[im_dims[1]])
    f_hw = (img_hw[0] // cfg.patch_size, img_hw[1] // cfg.patch_size)
    o_ax = feat_out_sz[out_axis - 1]
    return perm, img_hw, f_hw, o_ax, out_axis


def fold_grayscale_patch_embed(params: dict) -> dict:
    """Fold replicate-to-RGB + ImageNet normalize into the patch embed.

    Scalar volumes replicate 1→3 channels before the per-channel ImageNet
    normalize (infer.py:154-155). Both are affine per channel and the
    patch embed is linear over channels, so for a grayscale pixel x:

        Σ_c K[·,c,·]·(x − m_c)/s_c  =  (Σ_c K[·,c,·]/s_c)·x
                                       + (b − Σ_c (m_c/s_c)·Σ_p K[p,c,·])

    i.e. an exactly equivalent single-channel kernel + bias shift. This
    removes the 3× replicated-image traffic and the per-pixel normalize
    from the hot loop (the conv consumed 44 ms of a 1.04 s 1024³ fast
    extraction before the fold). Returns params with a (P, P, 1, D)
    patch-embed kernel; everything else is shared (no copy).
    """
    k = params["patch_embed"]["kernel"]  # (P, P, 3, D) HWIO
    b = params["patch_embed"]["bias"]
    inv_std = jnp.asarray(IMAGENET_STD, jnp.float32) ** -1  # (3,)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    kf = k.astype(jnp.float32)
    k1 = jnp.einsum("hwcd,c->hwd", kf, inv_std)[:, :, None, :]
    shift = jnp.einsum("hwcd,c->d", kf, mean * inv_std)
    out = dict(params)
    out["patch_embed"] = {
        "kernel": k1.astype(k.dtype),
        "bias": (b.astype(jnp.float32) - shift).astype(b.dtype),
    }
    return out


def _slice_batch_features(
    params, batch, cfg, img_hw, f_hw, key_idx, precision, attn_impl,
    dtype, feature_source, block_impl, mima=None,
):
    """One slice batch through the ViT → per-key (B, fh·fw, D) fp32.

    ``mima``: optional (global min, global max) fp32 scalars — when set,
    the batch arrives in the volume's RAW dtype (possibly uint8/16) and
    min-max normalization happens here, after the nearest resize (which
    commutes with elementwise ops exactly). Keeping the volume compact
    until this point halves/quarters HBM residency for integer volumes.
    """
    imgs = resize_nearest(batch, img_hw)  # (B, C, h, w), raw dtype
    if mima is not None:
        # identical arithmetic to utils.tensor.norm_minmax (same division)
        imgs = (imgs.astype(jnp.float32) - mima[0]) / (mima[1] - mima[0])
    kernel_ch = params["patch_embed"]["kernel"].shape[2]
    if imgs.shape[1] == 1 and kernel_ch == 1:
        # grayscale-folded patch embed (fold_grayscale_patch_embed):
        # replicate + ImageNet normalize already live in the kernel/bias
        imgs = imgs.astype(dtype)
    else:
        if imgs.shape[1] == 1:
            # scalar volumes replicate 1→3 channels (infer.py:154)
            imgs = jnp.broadcast_to(imgs, (batch.shape[0], 3) + img_hw)
        imgs = imagenet_normalize(imgs).astype(dtype)
    if block_impl == "fused":
        # Inputs at this point are min-max + ImageNet normalized
        # (bounded ±~2.6) and the ViT's LayerNorms bound every block
        # input, so exp2-domain attention scores stay O(10) — far from
        # the ~120 overflow bound the softmax row-max pass guards
        # against. Skipping it is exact on this path and measures ~2%
        # faster end-to-end (ops/fused_block.py '_nomax'; the shifted
        # form stays the default for unbounded inputs elsewhere —
        # request it explicitly here with 'fused_max').
        block_impl = "fused_nomax"
    elif block_impl == "fused_max":
        block_impl = "fused"
    # qkv path: compute only the requested thirds of the last block's
    # fused projection (extraction defaults to k alone — the q/v matmul
    # columns and the post-hoc HLO slices are dead compute otherwise)
    thirds = tuple(key_idx) if feature_source == "qkv" else None
    _, qkv = vit_forward_raw(
        params, imgs, cfg, precision=precision, attn_impl=attn_impl,
        return_qkv_last=True, compute_dtype=dtype, capture=feature_source,
        stop_after_capture=(feature_source == "qkv"),
        block_impl=block_impl, capture_thirds=thirds,
    )  # (B, 1+hw, n·D') — n = len(key_idx) for qkv, 3 for mlp
    n = len(key_idx) if thirds is not None else 3
    feats = qkv[:, 1:].reshape(
        batch.shape[0], f_hw[0] * f_hw[1], n, qkv.shape[-1] // n
    )  # CLS dropped (infer.py:197)
    if thirds is not None:
        return [feats[:, :, i].astype(jnp.float32) for i in range(n)]
    return [feats[:, :, ki].astype(jnp.float32) for ki in key_idx]


def _scan_pooled_extraction(
    params, slices_b, w_pool_b, cfg, img_hw, f_hw, o_ax,
    key_idx, precision, attn_impl, dtype, feature_source="qkv",
    block_impl="xla", mima=None, init=None, identity_pool=False,
):
    """Core scan over slice batches with fused slice-axis pooling.

    Args:
        slices_b: (nb, B, a, b) raw slice batches.
        w_pool_b: (nb, o_ax, B) per-batch slice-axis pool weight columns —
            or (nb, A, o_ax, B) for the fused all-axes sweep, in which
            case accumulators carry a leading A axis.
        init: optional carried-in accumulators (one per key) — the
            host-streamed path (pipeline/streamed.py) chains chunks of
            batches through repeated calls, which is exact because the
            accumulation is a plain ordered sum over batches.
        identity_pool: static promise that the pool matrix is the
            identity (fast-mode picked slices, or an unpooled single-axis
            sweep): slice i is output slot i, so the pooled result is the
            scan's stacked per-step features, reshaped. The carried
            einsum-accumulate would read AND write the full fp32
            accumulator every step — at 1024³ fast (3, 64, 4096, 384)
            fp32 = 1.2 GB, i.e. ~29 GB of HBM traffic over 12 steps,
            measured as 44 ms of a 1.0 s extraction — where stacking
            writes each element exactly once. Bit-identical: the identity
            einsum contributes each fp32 feature with weight 1.0 into a
            zero slot. Ignored when ``init`` is given (the streamed
            path's chunk chaining needs a carry).

    Returns one (o_ax, fh·fw, D) — or (A, o_ax, fh·fw, D) — fp32
    accumulator per requested key. The sum over batches distributes, so
    sharding batches across devices and psumming the accumulators is
    exact (used by the parallel layer).
    """
    D = cfg.embed_dim if feature_source == "qkv" else cfg.embed_dim // 3
    if (
        slices_b.shape[2] == 1
        and params["patch_embed"]["kernel"].shape[2] == 3
    ):
        # grayscale volume + RGB checkpoint: fold replicate + ImageNet
        # normalize into the kernel ONCE, outside the scan body
        params = fold_grayscale_patch_embed(params)
    multi = w_pool_b.ndim == 4
    eq = "aob,bnd->aond" if multi else "ob,bnd->ond"
    acc_shape = (
        (w_pool_b.shape[1], o_ax) if multi else (o_ax,)
    ) + (f_hw[0] * f_hw[1], D)

    if identity_pool and init is None:

        def body_stack(carry, batch):
            fks = _slice_batch_features(
                params, batch, cfg, img_hw, f_hw, key_idx, precision,
                attn_impl, dtype, feature_source, block_impl, mima,
            )
            return carry, tuple(fks)

        _, ys = jax.lax.scan(body_stack, 0, slices_b)
        nb, B = slices_b.shape[:2]
        out = []
        for y in ys:  # (nb, B, fh·fw, D) fp32, slot order = slice order
            if multi:
                A = w_pool_b.shape[1]
                y = y.reshape(A, (nb // A) * B, *y.shape[2:])
                out.append(y[:, :o_ax])  # drop zero-weight batch padding
            else:
                out.append(y.reshape(nb * B, *y.shape[2:])[:o_ax])
        return tuple(out)

    def body(carry, inp):
        batch, w_rows = inp  # (B, C, a, b), ([A,] o_ax, B)
        fks = _slice_batch_features(
            params, batch, cfg, img_hw, f_hw, key_idx, precision,
            attn_impl, dtype, feature_source, block_impl, mima,
        )
        new_carry = []
        for ci, fk in enumerate(fks):
            contrib = jnp.einsum(eq, w_rows, fk, precision="highest")
            new_carry.append(carry[ci] + contrib)
        return tuple(new_carry), None

    if init is None:
        init = tuple(jnp.zeros(acc_shape, jnp.float32) for _ in key_idx)
    acc, _ = jax.lax.scan(body, init, (slices_b, w_pool_b))
    return acc


def _pooled_to_volume(pooled, f_hw, o_ax, out_axis, D):
    """(o_ax, fh·fw, D) accumulator → (F, o0, o1, o2) feature volume
    (inverse permute of infer.py:198-208)."""
    vol4 = pooled.reshape(o_ax, f_hw[0], f_hw[1], D)
    vol4 = jnp.moveaxis(vol4, -1, 0)  # (F, o_ax, fh, fw)
    return jnp.moveaxis(vol4, 1, out_axis)


def _subsample_slice_indices(S: int, target: int) -> np.ndarray:
    """The reference's commented-out slice pick (infer.py:160-166):
    nearest-resize of arange(S) to ``target`` slices, centered."""
    idx = np.floor(np.arange(target) * (S / target)).astype(np.int64)
    idx = np.minimum(idx, S - 1)
    return idx + (S - idx.max()) // 2


def prepare_axis_batches(
    vol_normed, cfg, axis, im_sz, feat_out_sz, batch_size,
    slice_subsample: bool = False, pool_slice_axis: bool = True,
):
    """Permute to slices, pad to batch multiple, build pool weights.

    ``vol_normed`` is (W, H, D) scalar or (C, W, H, D) multi-channel (the
    reference's old/infer_multi.py RGB path — its permutes put channels in
    the image-channel slot the same way). Slices come out (S, C, a, b).
    """
    perm, img_hw, f_hw, o_ax, out_axis = _axis_geometry(
        cfg, axis, im_sz, feat_out_sz
    )
    if vol_normed.ndim == 3:
        vol_normed = vol_normed[None]  # (1, W, H, D)
    S = vol_normed.shape[perm[0] + 1]
    # identity slot mapping: every output slot is exactly one slice, in
    # order (unpooled sweep; fast-mode pick; or S == o_ax where the
    # adaptive-pool windows are singletons). S < o_ax is NOT identity —
    # the adaptive matrix repeats slices across slots there.
    identity_pool = (
        (not pool_slice_axis) or S == o_ax or (slice_subsample and S > o_ax)
    )
    if not pool_slice_axis:
        # single-axis reference semantics (infer.py:326 pool_fn=_noop):
        # the slice axis keeps full resolution
        o_ax = S
        pool_mat = np.eye(S)
    elif slice_subsample and S > o_ax:
        # one picked slice per output slot → pooling matrix is identity.
        # Pick BEFORE the permute: gathering o_ax planes from the original
        # layout keeps peak memory at one small stack instead of a second
        # full-volume transpose copy (a 1024³ fp32 volume otherwise OOMs a
        # 16 GB chip in fast mode).
        pick = _subsample_slice_indices(S, o_ax)
        step = np.diff(pick)
        ax = perm[0] + 1
        if step.size and np.all(step == step[0]) and step[0] > 0:
            # the pick is an arithmetic progression whenever S % o_ax == 0
            # (the common fast-mode shapes) → a strided lax.slice instead
            # of a gather. The hlo_stats trace at 1024³ showed the gather
            # lowering as ~12.7 ms slice_bitcast fusions per axis (it
            # touches far more than the 268 MB of picked planes); the
            # strided slice reads only what it keeps.
            start = [0] * vol_normed.ndim
            limit = list(vol_normed.shape)
            strides = [1] * vol_normed.ndim
            start[ax] = int(pick[0])
            limit[ax] = int(pick[-1]) + 1
            strides[ax] = int(step[0])
            vol_normed = jax.lax.slice(vol_normed, start, limit, strides)
        else:
            vol_normed = jnp.take(
                vol_normed, jnp.asarray(pick), axis=ax
            )
        S = o_ax
        pool_mat = np.eye(o_ax)
    else:
        pool_mat = _adaptive_avg_weight_matrix(S, o_ax)
    slices = jnp.transpose(
        vol_normed, (perm[0] + 1, 0, perm[1] + 1, perm[2] + 1)
    )  # (S, C, a, b)
    nb = -(-S // batch_size)
    # zero-padded slices get zero pool weight, so batch padding is exact
    w_pool = jnp.asarray(
        np.pad(pool_mat, ((0, 0), (0, nb * batch_size - S))),
        dtype=jnp.float32,
    )
    slices = jnp.pad(
        slices, ((0, nb * batch_size - S),) + ((0, 0),) * (slices.ndim - 1)
    )
    slices_b = slices.reshape(nb, batch_size, *slices.shape[1:])
    w_pool_b = w_pool.reshape(o_ax, nb, batch_size).transpose(1, 0, 2)
    return slices_b, w_pool_b, (img_hw, f_hw, o_ax, out_axis, identity_pool)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "axis", "im_sz", "feat_out_sz", "batch_size",
        "return_keys", "precision", "attn_impl", "compute_dtype",
        "feature_source", "slice_subsample", "pool_slice_axis",
        "block_impl",
    ),
)
def _extract_axis(
    params: dict,
    vol_normed: jnp.ndarray,
    cfg: ViTConfig,
    axis: str,
    im_sz: tuple[int, int, int],
    feat_out_sz: tuple[int, int, int],
    batch_size: int,
    return_keys: tuple,
    precision: str,
    attn_impl: str,
    compute_dtype: str,
    feature_source: str = "qkv",
    slice_subsample: bool = False,
    pool_slice_axis: bool = True,
    block_impl: str = "xla",
):
    """One axis sweep → pooled (F, o0, o1, o2) feature volume per key.

    ``vol_normed`` is the raw (W, H, D) volume in any dtype (fp32, fp16,
    uint8/16) — only its global min/max scalars are computed here; the
    slice stacks keep the compact dtype and min-max normalization happens
    per batch inside the scan (a normalized fp32 copy would stay resident
    across dispatches: 4 GB at 1024³); ImageNet normalization follows the
    1→3 channel expand.
    """
    dtype = jnp.dtype(compute_dtype)
    mima = (
        vol_normed.min().astype(jnp.float32),
        vol_normed.max().astype(jnp.float32),
    )
    slices_b, w_pool_b, (img_hw, f_hw, o_ax, out_axis, ident) = (
        prepare_axis_batches(
            vol_normed, cfg, axis, im_sz, feat_out_sz, batch_size,
            slice_subsample, pool_slice_axis,
        )
    )
    key_idx = tuple(_qkv_index(k) for k in return_keys)
    acc = _scan_pooled_extraction(
        params, slices_b, w_pool_b, cfg, img_hw, f_hw, o_ax,
        key_idx, precision, attn_impl, dtype, feature_source, block_impl,
        mima, identity_pool=ident,
    )
    D = cfg.embed_dim if feature_source == "qkv" else cfg.embed_dim // 3
    return {
        name: _pooled_to_volume(pooled, f_hw, o_ax, out_axis, D)
        for name, pooled in zip(return_keys, acc)
    }


# fused all-axes sweep materializes all three permuted slice stacks at
# once; cap their combined size so big full sweeps fall back to the
# sequential path. Empirically XLA hoists per-slice preprocessing across
# the whole concatenated scan input at 512³ full sweeps (a ~70 GB
# intermediate → AOT OOM), so the cap stays below that: 256³ full sweeps
# (3 × 64 MB) and fast mode at any size stay fused.
_FUSED_ALL_MAX_BYTES = 2**30


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "im_sz", "feat_out_sz", "batch_size",
        "return_keys", "precision", "attn_impl", "compute_dtype",
        "feature_source", "slice_subsample", "block_impl",
    ),
)
def _extract_all_axes_fused(
    params: dict,
    vol_normed: jnp.ndarray,
    cfg: ViTConfig,
    im_sz: tuple[int, int, int],
    feat_out_sz: tuple[int, int, int],
    batch_size: int,
    return_keys: tuple,
    precision: str,
    attn_impl: str,
    compute_dtype: str,
    feature_source: str = "qkv",
    slice_subsample: bool = False,
    block_impl: str = "xla",
):
    """Cubic-volume fast path: ALL three axis sweeps in ONE jit/scan.

    The reference runs z, y, x sequentially (infer.py:327-333); for cubic
    volumes every axis has identical slice geometry, so the three
    permuted stacks concatenate into one scan whose pool-weight rows
    carry a per-axis leading dim (zero off-axis — exact in fp32). One
    dispatch instead of three (each is a tunnel round trip) and one
    compilation of the ViT scan instead of three. Numerically identical
    to the sequential path: same per-axis batch order, same final
    z+y+x accumulator addition order.
    """
    dtype = jnp.dtype(compute_dtype)
    key_idx = tuple(_qkv_index(k) for k in return_keys)
    mima = (
        vol_normed.min().astype(jnp.float32),
        vol_normed.max().astype(jnp.float32),
    )
    slices_all, w_all, (img_hw, f_hw, o_ax, ident) = _build_fused_all_stacks(
        vol_normed, cfg, im_sz, feat_out_sz, batch_size, slice_subsample
    )
    acc = _scan_pooled_extraction(
        params, slices_all, w_all, cfg, img_hw, f_hw, o_ax,
        key_idx, precision, attn_impl, dtype, feature_source, block_impl,
        mima, identity_pool=ident,
    )
    D = cfg.embed_dim if feature_source == "qkv" else cfg.embed_dim // 3
    return _fused_all_outputs(acc, return_keys, f_hw, o_ax, feat_out_sz, D)


def _predecimate_fast_input(vol, im_sz, feat_out_sz):
    """Fast-mode prefilter: decimate the volume ONCE when every read is
    strided anyway.

    At 1024³/fos64 the in-plane nearest resize is a stride-2 subsample
    (resize_nearest's integer-ratio rule) and the picked plane indices are
    all even, so every element fast mode ever touches lies on the
    ``vol[::r, ::r, ::r]`` lattice. Building that lattice once replaces
    (a) three per-axis strided plane-picks over the FULL volume (the
    1024³ trace showed ~23 ms of minor-dim-strided slice reads), (b) the
    per-batch in-plane resize inside the scan (which fused into the
    patch-embed convolution as strided input reads — 3.7 ms/step vs the
    1.22 ms/step the same fusion costs on contiguous input), and (c) 4×
    of the scan-input bytes. Element-identical by construction: the
    integer-ratio nearest pick IS ``[::r]`` from 0, and the plane-pick
    equivalence is checked exactly below (host-side, static shapes) with
    a fall-through to the unfiltered path when it doesn't hold. Global
    min/max normalization is NOT affected — callers compute it from the
    full volume before this runs (reference parity, infer.py:155).
    """
    shp = vol.shape[-3:]
    if not (shp[0] == shp[1] == shp[2] and im_sz[0] == im_sz[1] == im_sz[2]):
        return vol
    S, im, o_ax = shp[0], im_sz[0], feat_out_sz[0]
    if im >= S or S % im or im <= o_ax:
        return vol
    r = S // im
    pick = _subsample_slice_indices(S, o_ax)
    if np.any(pick % r) or not np.array_equal(
        pick // r, _subsample_slice_indices(im, o_ax)
    ):
        return vol
    nd = vol.ndim
    start, limit, strides = [0] * nd, list(vol.shape), [1] * nd
    for ax in range(nd - 3, nd - 1):
        limit[ax] = (im - 1) * r + 1  # resize_nearest's slice bound
        strides[ax] = r
    # stride the two MAJOR axes with a slice (row-granular HBM reads) and
    # decimate the minor axis via reshape(…, im, r) + index-0: a minor-dim
    # strided slice reads lane-strided from HBM (measured 36 ms for the
    # full (r, r, r) slice at 1024³ fp32 vs 17 ms for this split — same
    # elements; r·im == S by the guards above, so no pre-slice is needed)
    vol = jax.lax.slice(vol, start, limit, strides)
    return vol.reshape(vol.shape[:-1] + (im, r))[..., 0]


def _build_fused_all_stacks(
    vol_normed, cfg, im_sz, feat_out_sz, batch_size, slice_subsample
):
    """Concatenated 3-axis slice stacks + per-axis pool-weight planes.

    Shared by the single-device fused sweep and its sharded twin
    (parallel/extract.py) so the weight layout and axis order cannot
    diverge between them."""
    if slice_subsample:
        vol_normed = _predecimate_fast_input(vol_normed, im_sz, feat_out_sz)
    stacks = []
    geom = None
    for ax in ("z", "y", "x"):
        s_b, w_b, g = prepare_axis_batches(
            vol_normed, cfg, ax, im_sz, feat_out_sz, batch_size,
            slice_subsample, True,
        )
        stacks.append((s_b, w_b))
        # out_axis (g[3]) legitimately differs per axis; the slice/image
        # geometry must match for the stacks to share one scan
        assert geom is None or g[:3] == geom[:3], (
            "fused sweep needs equal slice geometry"
        )
        geom = g
    img_hw, f_hw, o_ax, _, identity_pool = geom
    nb = stacks[0][0].shape[0]

    slices_all = jnp.concatenate([s for s, _ in stacks], axis=0)
    w_all = jnp.zeros((3, nb, 3, o_ax, batch_size), jnp.float32)
    for a, (_, w_b) in enumerate(stacks):
        w_all = w_all.at[a, :, a].set(w_b)
    w_all = w_all.reshape(3 * nb, 3, o_ax, batch_size)
    return slices_all, w_all, (img_hw, f_hw, o_ax, identity_pool)


def _fused_all_outputs(acc, return_keys, f_hw, o_ax, feat_out_sz, D):
    """(3, o_ax, hw, D) per-key accumulators → summed feature volumes
    (z+y+x, parity order)."""
    out = {}
    for name, pooled in zip(return_keys, acc):
        vols = [
            _pooled_to_volume(
                pooled[a], f_hw, o_ax, _AXIS_RULES[ax][2], D
            )
            for a, ax in enumerate(("z", "y", "x"))
        ]
        vols = [_pool_to(v, feat_out_sz) for v in vols]
        out[name] = (vols[0] + vols[1]) + vols[2]
    return out


def _fused_all_applicable(vol: jnp.ndarray, cfg: ExtractConfig) -> bool:
    shp = vol.shape[-3:]
    if cfg.slice_along != "all" or cfg.pooling() is not True:
        return False
    if not (shp[0] == shp[1] == shp[2]):
        return False
    C = vol.shape[0] if vol.ndim == 4 else 1
    if cfg.slice_subsample:
        return True  # picked stacks are o_ax slices each — tiny
    stack_bytes = 3 * C * shp[0] * shp[1] * shp[2] * 4
    return stack_bytes <= _FUSED_ALL_MAX_BYTES


def extract_features(
    vol: jnp.ndarray,
    params: dict,
    model_cfg: ViTConfig,
    cfg: ExtractConfig = ExtractConfig(),
) -> dict[str, jnp.ndarray]:
    """Full feature extraction over one, or all three, volume axes.

    ``vol`` is (W, H, D) scalar or (3, W, H, D) RGB (the old/infer_multi.py
    multi-channel path, channels fed to the ViT directly). Returns
    {key: (F, o0, o1, o2) float32} — for ``slice_along='all'`` the
    per-axis pooled volumes are summed (infer.py:327-333; the reference's
    fp16 accumulation is widened to fp32 here, stored half by the CLI).
    """
    vol = jnp.asarray(vol)
    if vol.dtype not in (jnp.uint8, jnp.uint16, jnp.int16, jnp.float16,
                         jnp.bfloat16, jnp.float32):
        vol = vol.astype(jnp.float32)
    im_sz, feat_out_sz = compute_im_sizes(
        vol.shape[-3:], cfg.feature_output_size, model_cfg.patch_size
    )
    # normalization happens inside the per-axis jits (no resident fp32
    # copy; integer volumes stay compact until the per-batch cast)
    vol_normed = vol

    if _fused_all_applicable(vol, cfg):
        # cubic 'all' sweep: one dispatch/compile for all three axes
        return _extract_all_axes_fused(
            params, vol_normed, model_cfg, im_sz, feat_out_sz,
            cfg.batch_size, tuple(cfg.return_keys), cfg.precision,
            cfg.attn_impl, cfg.compute_dtype, cfg.feature_source,
            cfg.slice_subsample, cfg.block_impl,
        )

    axes = ["z", "y", "x"] if cfg.slice_along == "all" else [cfg.slice_along]
    out: dict[str, jnp.ndarray] = {}
    for ax in axes:
        axis_feats = _extract_axis(
            params, vol_normed, model_cfg, ax, im_sz, feat_out_sz,
            cfg.batch_size, tuple(cfg.return_keys), cfg.precision,
            cfg.attn_impl, cfg.compute_dtype, cfg.feature_source,
            cfg.slice_subsample, cfg.pooling(), cfg.block_impl,
        )
        if cfg.slice_along == "all":
            # pooled to the common grid before summing (infer.py:329-333)
            axis_feats = {
                k: _pool_to(v, feat_out_sz) for k, v in axis_feats.items()
            }
        for k, v in axis_feats.items():
            out[k] = out.get(k, 0) + v
    return out


def _pool_to(feat: jnp.ndarray, feat_out_sz: tuple[int, int, int]) -> jnp.ndarray:
    from vittf_tpu.ops.resize import adaptive_avg_pool

    if feat.shape[1:] == tuple(feat_out_sz):
        return feat
    return adaptive_avg_pool(feat, feat_out_sz)
