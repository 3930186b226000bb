"""Vision Transformer (DINO / DINOv2 family) in pure-functional JAX.

TPU-native rewrite of the reference's frozen feature extractor. The
reference loads PyTorch DINO ViTs from torch.hub and harvests the qkv
projection of the last block via a forward hook (reference infer.py:42-46,
133-135). Here the model is a pure function over a parameter pytree and the
last block's qkv activations are an explicit output — no hooks, no
mutation, fully ``jit``/``shard_map`` compatible.

Design notes (TPU-first):
- all matmuls run through ``_dot`` with a configurable precision: ``bf16``
  (``'default'``) for throughput, ``'highest'`` for fp32 parity runs.
- attention is delegated to ``vittf_tpu.ops.attention`` which picks a
  Pallas flash-attention kernel on TPU and an XLA softmax path elsewhere.
- position embeddings are interpolated bicubically (torch A=-0.75 parity)
  to the slice token grid, matching DINO's ``interpolate_pos_encoding``.

Parameter pytree layout (all jnp arrays):
    patch_embed: {kernel (P, P, 3, D), bias (D,)}
    cls_token   (1, 1, D)
    pos_embed   (1, 1 + G*G, D)
    blocks: list of {
        norm1: {scale, bias}, norm2: {scale, bias},
        qkv:  {kernel (D, 3D), bias (3D,)},
        proj: {kernel (D, D), bias (D,)},
        fc1:  {kernel (D, H), bias (H,)},
        fc2:  {kernel (H, D), bias (D,)},
        [ls1 (D,), ls2 (D,)]          # DINOv2 LayerScale
    }
    norm: {scale, bias}
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.attention import multi_head_attention
from vittf_tpu.ops.resize import resize_cubic_scaled


@dataclass(frozen=True)
class ViTConfig:
    """Architecture hyperparameters for one DINO/DINOv2 ViT variant."""

    patch_size: int = 8
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    img_size: int = 224
    layerscale: bool = False  # DINOv2 uses LayerScale, DINO v1 does not
    name: str = "vits8"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def pos_grid(self) -> int:
        return self.img_size // self.patch_size

    @property
    def hidden_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


def init_vit_params(cfg: ViTConfig, key: jax.Array, dtype=jnp.float32) -> dict:
    """Random (trunc-normal 0.02) initialization with the DINO layout.

    With a concrete key, initialization runs HOST-side (numpy) and the
    result is device_put by jnp: device-side ``jax.random`` here would
    trigger one XLA compile per distinct parameter shape at process
    start, which costs minutes when the tunnel's remote compile service
    is cold — measured as a ~15 min stall before the first benchmark
    section. Under tracing (e.g. flax ``init``), the jax.random path is
    used instead. Deterministic in ``key`` per path.
    """
    try:
        seed = np.asarray(key).tolist()  # fails on traced keys
    except Exception:
        seed = None

    if seed is not None:
        rng = np.random.default_rng(seed)

        def tn(_key, shape, std=0.02):
            # rejection-sampled truncation at ±2σ (truncated_normal's
            # support; the random init's exact distribution is immaterial)
            x = rng.standard_normal(shape)
            bad = np.abs(x) > 2
            while bad.any():
                x[bad] = rng.standard_normal(int(bad.sum()))
                bad = np.abs(x) > 2
            return jnp.asarray(x * std, dtype)

        k = iter(range(4 + 8 * cfg.depth))  # draw order fixed by construction
    else:
        k = iter(jax.random.split(key, 4 + 8 * cfg.depth))

        def tn(kk, shape, std=0.02):
            return (
                jax.random.truncated_normal(kk, -2, 2, shape) * std
            ).astype(dtype)

    def linear(kk, din, dout):
        return {"kernel": tn(kk, (din, dout)), "bias": jnp.zeros((dout,), dtype)}

    def ln():
        return {
            "scale": jnp.ones((cfg.embed_dim,), dtype),
            "bias": jnp.zeros((cfg.embed_dim,), dtype),
        }

    params = {
        "patch_embed": {
            "kernel": tn(next(k), (cfg.patch_size, cfg.patch_size, 3, cfg.embed_dim)),
            "bias": jnp.zeros((cfg.embed_dim,), dtype),
        },
        "cls_token": jnp.zeros((1, 1, cfg.embed_dim), dtype),
        "pos_embed": tn(next(k), (1, 1 + cfg.pos_grid**2, cfg.embed_dim)),
        "blocks": [],
        "norm": ln(),
    }
    for _ in range(cfg.depth):
        blk = {
            "norm1": ln(),
            "norm2": ln(),
            "qkv": linear(next(k), cfg.embed_dim, 3 * cfg.embed_dim),
            "proj": linear(next(k), cfg.embed_dim, cfg.embed_dim),
            "fc1": linear(next(k), cfg.embed_dim, cfg.hidden_dim),
            "fc2": linear(next(k), cfg.hidden_dim, cfg.embed_dim),
        }
        if cfg.layerscale:
            blk["ls1"] = jnp.full((cfg.embed_dim,), 1e-5, dtype)
            blk["ls2"] = jnp.full((cfg.embed_dim,), 1e-5, dtype)
        params["blocks"].append(blk)
    return params


def _dot(x, w, precision):
    return jnp.dot(x, w, precision=precision, preferred_element_type=x.dtype)


def _layer_norm(x, p, eps=1e-6):
    # statistics in fp32 for bf16 activation runs
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p["scale"] + p["bias"]


def _linear(x, p, precision):
    return _dot(x, p["kernel"], precision) + p["bias"]


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, grid_hw: tuple[int, int]
) -> jnp.ndarray:
    """Resize pos_embed (1, 1+G*G, D) to a (h, w) token grid.

    DINO parity: CLS position kept; patch grid resized with torch-bicubic
    (align_corners=False, A=-0.75) using DINO's ``scale_factor=(h+0.1)/G``
    coordinate arithmetic (same in DINOv2 with interpolate_offset=0.1).
    """
    h, w = grid_hw
    n_patch = pos_embed.shape[1] - 1
    g = int(round(float(np.sqrt(n_patch))))
    if (h, w) == (g, g):
        return pos_embed
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].reshape(1, g, g, -1)
    patch_pos = jnp.transpose(patch_pos, (0, 3, 1, 2))  # (1, D, g, g)
    patch_pos = resize_cubic_scaled(
        patch_pos, (h, w), (g / (h + 0.1), g / (w + 0.1))
    )
    patch_pos = jnp.transpose(patch_pos, (0, 2, 3, 1)).reshape(1, h * w, -1)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def _block(x, p, cfg: ViTConfig, precision, attn_impl, capture=None):
    """Pre-LN transformer block. Returns (x, captured_activations_or_None).

    ``capture``: None | 'qkv' (the fused qkv projection output — what the
    reference hooks at infer.py:133-135) | 'mlp' (the MLP output before the
    residual — the infer_clip.py hook target).
    """
    y = _layer_norm(x, p["norm1"])
    qkv = _linear(y, p["qkv"], precision)  # (B, N, 3D)
    attn_out = multi_head_attention(
        qkv, cfg.num_heads, precision=precision, impl=attn_impl
    )
    attn_out = _linear(attn_out, p["proj"], precision)
    if "ls1" in p:
        attn_out = attn_out * p["ls1"]
    x = x + attn_out

    y = _layer_norm(x, p["norm2"])
    y = _linear(y, p["fc1"], precision)
    # parity mode ('highest') uses torch's exact erf GELU; speed mode uses
    # the tanh approximation (~25% of non-attention time is erf on the VPU)
    y = jax.nn.gelu(y, approximate=(precision != "highest"))
    y = _linear(y, p["fc2"], precision)
    if "ls2" in p:
        y = y * p["ls2"]
    x = x + y
    captured = {"qkv": qkv, "mlp": y}.get(capture) if capture else None
    return x, captured


def vit_forward_raw(
    params: dict,
    images: jnp.ndarray,
    cfg: ViTConfig,
    precision: str = "default",
    attn_impl: str = "auto",
    return_qkv_last: bool = True,
    compute_dtype=jnp.float32,
    capture: str = "qkv",
    stop_after_capture: bool = False,
    block_impl: str = "xla",  # 'xla' | 'fused' (bf16 speed mode only)
    capture_thirds: tuple | None = None,
):
    """Run the ViT over a batch of images (trace-time function; see
    ``vit_forward`` for the jitted entry point).

    Args:
        images: (B, C, H, W), H/W multiples of ``cfg.patch_size``. C must
            match the patch-embed kernel's input channels (3 for hub
            checkpoints; 1 when the caller pre-folded the grayscale
            replicate + ImageNet normalize into the kernel —
            pipeline/features.fold_grayscale_patch_embed).
        compute_dtype: activation/matmul dtype — bfloat16 for TPU
            throughput, float32 (+ precision='highest') for parity runs.
        capture_thirds: with ``stop_after_capture`` + ``capture='qkv'``,
            compute only these thirds of the last block's qkv projection
            (e.g. ``(1,)`` = k only). The narrowed matmul is exactly the
            corresponding column block of the fused qkv linear; extraction
            consumes one third by default, so the other two are dead
            compute (and a ~52 MB/batch HLO slice) otherwise.

    Returns:
        (tokens, qkv_last): tokens (B, 1+hw, D) after the final LayerNorm;
        qkv_last (B, 1+hw, 3D) — the last block's qkv projection output,
        the tensor the reference captures by hook (infer.py:133-135) —
        (B, 1+hw, len(capture_thirds)·D) when narrowed.
    """
    dtype = jnp.dtype(compute_dtype)
    if params["cls_token"].dtype != dtype:
        params = jax.tree.map(lambda a: a.astype(dtype), params)
    images = images.astype(dtype)
    B, C, H, W = images.shape
    P = cfg.patch_size
    h, w = H // P, W // P

    # Patch embed as a token GEMM. The stride-P "conv" is a disjoint
    # patch regroup + one (h·w, P²C) × (P²C, D) matmul; XLA's conv path
    # lowers the C=3 NCHW case poorly on TPU (C doesn't tile to the lane
    # dim — measured 44 ms of a 1.04 s 1024³ fast extraction, ~3% of
    # peak), while the regroup is pure data formatting and the GEMM runs
    # on the MXU. Contraction order (i, j, c) matches the HWIO kernel
    # reshape, so this is the same dot product, not an approximation.
    kernel = params["patch_embed"]["kernel"]  # (P, P, C, D) HWIO
    xp = images.astype(kernel.dtype).reshape(B, C, h, P, w, P)
    xp = jnp.transpose(xp, (0, 2, 4, 3, 5, 1)).reshape(B, h * w, P * P * C)
    x = _dot(xp, kernel.reshape(P * P * C, cfg.embed_dim), precision)
    x = x + params["patch_embed"]["bias"]

    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(params["pos_embed"], (h, w)).astype(x.dtype)

    qkv_last = None
    # block_impl grammar: 'fused[_rows][_nomax]' — '_rows' picks the
    # grid-level row-block variant, '_nomax' skips the softmax row-max
    # pass (exact softmax identity while |exp2-domain scores| < ~120;
    # real ViT logits are O(10) — see ops/fused_block.py)
    use_fused = block_impl.startswith("fused") and dtype == jnp.bfloat16
    if use_fused:
        from vittf_tpu.ops.fused_block import fused_block

    for i, blk in enumerate(params["blocks"]):
        is_last = i == cfg.depth - 1
        want = capture if (return_qkv_last and is_last) else None
        if stop_after_capture and is_last and want == "qkv":
            # feature-extraction fast path, EXACT for the harvested tensor:
            # the last block's qkv projection is computed from LN(x) before
            # its attention/MLP run, so when only qkv_last is consumed the
            # rest of the block and the final LayerNorm are dead compute
            # (~8% of the forward). 'mlp' capture needs the full block.
            y = _layer_norm(x, blk["norm1"])
            if capture_thirds is not None:
                # narrowed qkv: only the requested D-wide column blocks
                # of the fused projection (q|k|v are contiguous thirds of
                # the output dim — see split_qkv / infer.py:189-193)
                D = cfg.embed_dim
                ker = blk["qkv"]["kernel"]
                bias = blk["qkv"]["bias"]
                ker = jnp.concatenate(
                    [ker[:, t * D:(t + 1) * D] for t in capture_thirds],
                    axis=1,
                )
                bias = jnp.concatenate(
                    [bias[t * D:(t + 1) * D] for t in capture_thirds]
                )
                qkv_last = _dot(y, ker, precision) + bias
            else:
                qkv_last = _linear(y, blk["qkv"], precision)
            return None, qkv_last
        if use_fused and want is None:
            x = fused_block(
                x, blk, cfg.num_heads,
                impl="rows" if "_rows" in block_impl else "loop",
                softmax_max="_nomax" not in block_impl,
            )
            continue
        x, cap = _block(x, blk, cfg, precision, attn_impl, capture=want)
        if cap is not None:
            qkv_last = cap
    x = _layer_norm(x, params["norm"])
    return x, qkv_last


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "precision", "attn_impl", "return_qkv_last", "compute_dtype",
        "capture",
    ),
)
def vit_forward(
    params: dict,
    images: jnp.ndarray,
    cfg: ViTConfig,
    precision: str = "default",
    attn_impl: str = "auto",
    return_qkv_last: bool = True,
    compute_dtype: str = "float32",
    capture: str = "qkv",
):
    """Jitted ``vit_forward_raw``; ``compute_dtype`` as a string for hashability."""
    return vit_forward_raw(
        params, images, cfg, precision, attn_impl, return_qkv_last,
        jnp.dtype(compute_dtype), capture,
    )


def split_qkv(
    qkv: jnp.ndarray, num_heads: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, N, 3D) → three (B, N, D) tensors via the DINO head reshape.

    Matches the reference's post-hook reshape (infer.py:189-207): view as
    (B, N, 3, heads, hd), take q/k/v, re-merge heads to (B, N, D).
    """
    B, N, threeD = qkv.shape
    D = threeD // 3
    parts = qkv.reshape(B, N, 3, num_heads, D // num_heads)
    q, k, v = (parts[:, :, i] for i in range(3))
    return (
        q.reshape(B, N, D),
        k.reshape(B, N, D),
        v.reshape(B, N, D),
    )
