"""Pipeline parallelism: GPipe-style staged ViT blocks over a ``pipe`` axis.

TP (parallel/mesh.py) covers wide models; PP covers deep ones by placing
contiguous block ranges on successive devices and streaming microbatches
through them. Implementation is shard_map-native:

- block parameters are stacked per stage (leading ``pipe`` axis) and
  sharded over the mesh, so each device holds only its stage's blocks
- the classic M + P − 1 step schedule runs as a Python loop of
  ``ppermute`` rounds: at step t, stage 0 injects microbatch t (while
  t < M), every stage applies its block chunk, and activations rotate one
  hop along the ring; the last stage's outputs are collected and
  broadcast back with a psum-mask
- the last block's qkv capture (the feature-extraction payload) is
  emitted by the final stage alongside the activations

The schedule keeps all stages busy after the P−1-step fill; bubble
fraction is (P−1)/(M+P−1) as usual. This exists for depth-scaling ViT-g
class models — ViT-S/B fit one chip and use DP/TP instead.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vittf_tpu.models.vit import ViTConfig, _block


def stack_block_params(params: dict, n_stages: int) -> dict:
    """Stack per-block parameter pytrees into stage-major arrays.

    blocks must divide evenly: (depth,) list → pytree of arrays with
    leading dims (n_stages, blocks_per_stage, ...).
    """
    blocks = params["blocks"]
    depth = len(blocks)
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    per = depth // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return jax.tree.map(
        lambda a: a.reshape(n_stages, per, *a.shape[1:]), stacked
    )


def _tree_index(tree, i):
    return jax.tree.map(lambda a: a[i], tree)


@partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "n_micro", "precision", "attn_impl"),
)
def pp_vit_blocks(
    stacked_blocks,
    x_micro: jnp.ndarray,  # (M, B_mb, N, D) token activations
    cfg: ViTConfig,
    mesh: Mesh,
    n_micro: int,
    precision: str = "default",
    attn_impl: str = "xla",
):
    """Run the transformer blocks pipeline-parallel over mesh axis 'pipe'.

    Returns (x_out (M, B_mb, N, D), qkv_last (M, B_mb, N, 3D)) — identical
    to applying the blocks sequentially (modulo fp reordering).
    """
    n_stages = mesh.shape["pipe"]
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("pipe"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(blocks_local, x_mbs):
        stage = jax.lax.axis_index("pipe")
        per = blocks_local["qkv"]["kernel"].shape[1]  # (1, per, ...) local

        def apply_stage(x):
            # every stage captures its chunk's final qkv; only the last
            # stage's survives the psum mask below
            qkv = jnp.zeros(x.shape[:-1] + (3 * cfg.embed_dim,), x.dtype)
            for i in range(per):
                blk = _tree_index(_tree_index(blocks_local, 0), i)
                x, cap = _block(
                    x, blk, cfg, precision, attn_impl,
                    capture="qkv" if i == per - 1 else None,
                )
                if cap is not None:
                    qkv = cap
            return x, qkv

        M = x_mbs.shape[0]
        buf = jnp.zeros_like(x_mbs[0])
        x_out = jnp.zeros_like(x_mbs)
        qkv_out = jnp.zeros(
            x_mbs.shape[:-1] + (3 * cfg.embed_dim,), x_mbs.dtype
        )
        is_first = stage == 0
        is_last = stage == n_stages - 1

        for t in range(M + n_stages - 1):
            mb_in = min(t, M - 1)
            x_in = jnp.where(is_first & (t < M), x_mbs[mb_in], buf)
            y, qkv = apply_stage(x_in)
            # the last stage finishes microbatch t-(P-1) at step t
            mb_done = t - (n_stages - 1)
            if 0 <= mb_done < M:
                write = is_last
                x_out = x_out.at[mb_done].set(
                    jnp.where(write, y, x_out[mb_done])
                )
                qkv_out = qkv_out.at[mb_done].set(
                    jnp.where(write, qkv, qkv_out[mb_done])
                )
            buf = jax.lax.ppermute(y, "pipe", perm)

        # only the last stage holds real outputs; broadcast via psum of
        # the masked contributions
        mask = jnp.where(is_last, 1.0, 0.0).astype(x_out.dtype)
        x_out = jax.lax.psum(x_out * mask, "pipe")
        qkv_out = jax.lax.psum(qkv_out * mask, "pipe")
        return x_out, qkv_out

    return run(stacked_blocks, x_micro)


def pp_vit_forward(
    params: dict,
    images: jnp.ndarray,
    cfg: ViTConfig,
    mesh: Mesh,
    n_micro: int = 4,
    precision: str = "default",
    attn_impl: str = "xla",
):
    """Full ViT forward with pipeline-parallel blocks.

    Patch embed / pos embed / final LN run replicated (they are <1% of
    FLOPs); the block stack streams through the pipe. Batch must divide
    ``n_micro``.
    """
    from vittf_tpu.models.vit import _layer_norm, interpolate_pos_embed

    B, C, H, W = images.shape
    Pz = cfg.patch_size
    h, w = H // Pz, W // Pz
    x = jax.lax.conv_general_dilated(
        images.astype(params["patch_embed"]["kernel"].dtype),
        params["patch_embed"]["kernel"],
        (Pz, Pz), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NHWC"),
        precision=precision,
    ) + params["patch_embed"]["bias"]
    x = x.reshape(B, h * w, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.embed_dim)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + interpolate_pos_embed(params["pos_embed"], (h, w)).astype(x.dtype)

    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by {n_micro} microbatches")
    x_micro = x.reshape(n_micro, B // n_micro, *x.shape[1:])

    n_stages = mesh.shape["pipe"]
    stacked = stack_block_params(params, n_stages)
    stacked = jax.device_put(
        stacked,
        jax.tree.map(
            lambda _: NamedSharding(mesh, P("pipe")), stacked
        ),
    )
    x_out, qkv_out = pp_vit_blocks(
        stacked, x_micro, cfg, mesh, n_micro, precision, attn_impl
    )
    x_out = x_out.reshape(B, *x_out.shape[2:])
    qkv_out = qkv_out.reshape(B, *qkv_out.shape[2:])
    return _layer_norm(x_out, params["norm"]), qkv_out
