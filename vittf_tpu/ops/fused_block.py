"""Fused transformer block: LN→qkv→attention→proj→LN→MLP in one kernel.

Opt-in TPU path (``fused_block``) targeting the inter-op HBM traffic of
the XLA block (~1 GB/block/batch of activations bouncing between
LayerNorm, matmuls and attention): one kernel program processes one full
slice with the residual stream resident in VMEM.

Memory plan per program (ViT-S, N=4224 padded tokens, D=384, bf16):
    x (residual)        3.2 MB   input block, also the output carrier
    y = LN1(x)          3.2 MB   scratch
    attn (H, N, hd)     3.2 MB   head-major attention output scratch
    weights             3.6 MB   qkv/proj/fc1/fc2 (+LN params)
    per-head k, v       1.0 MB   recomputed from y per head (no extra FLOPs)
    score/MLP chunks    ~2 MB    per 512-row block
Weights are pre-arranged head-major — (H, D, hd) for q/k/v and
(H, hd, D) for proj — because Mosaic only allows dynamic indexing on
non-lane dimensions; all per-head access is leading-dim.

Numerics: bf16 matmuls with fp32 LN statistics and fp32 softmax — the
same contract as the speed-mode XLA path. Parity mode keeps XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROW_BLOCK = 256


def _ln(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * scale + bias


def _fused_block_kernel(
    mask_ref,  # (1, Np) f32: 0 valid / -1e30 padded keys
    x_ref,  # (1, Np, D)
    wq_ref, wk_ref, wv_ref,  # (H, D, hd)
    bq_ref, bk_ref, bv_ref,  # (H, 1, hd)
    wproj_ref, bproj_ref,  # (H, hd, D), (1, D)
    wfc1_ref, bfc1_ref,  # (D, Hd), (1, Hd)
    wfc2_ref, bfc2_ref,  # (Hd, D), (1, D)
    ln1_ref, ln2_ref,  # (2, D): row 0 scale, row 1 bias
    out_ref,  # (1, Np, D)
    y_scr,  # VMEM (Np, D)
    attn_scr,  # VMEM (H, Np, hd)
    *, num_heads: int, n_rows: int,
):
    D = x_ref.shape[-1]
    hd = D // num_heads
    scale = hd ** -0.5
    x = x_ref[0]

    # ---- stage 1: y = LN1(x) ----
    y_scr[:] = _ln(x, ln1_ref[0], ln1_ref[1])

    # ---- stage 2: attention per head (head-major scratch) ----
    def head_body(h, _):
        y = y_scr[:]
        k = jnp.dot(
            y, wk_ref[h], preferred_element_type=jnp.float32
        ).astype(y.dtype) + bk_ref[h]
        v = jnp.dot(
            y, wv_ref[h], preferred_element_type=jnp.float32
        ).astype(y.dtype) + bv_ref[h]

        def row_body(i, _):
            rows = pl.ds(i * _ROW_BLOCK, _ROW_BLOCK)
            q = jnp.dot(
                y_scr[rows, :], wq_ref[h], preferred_element_type=jnp.float32
            ).astype(y.dtype) + bq_ref[h]
            s = jax.lax.dot_general(
                q * jnp.asarray(scale, q.dtype), k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + mask_ref[:]
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            ) / denom
            attn_scr[h, rows, :] = o.astype(attn_scr.dtype)
            return 0

        jax.lax.fori_loop(0, n_rows, row_body, 0)
        return 0

    jax.lax.fori_loop(0, num_heads, head_body, 0)

    # ---- stage 3+4: per row-block: proj residual, LN2, MLP residual ----
    def out_body(i, _):
        rows = pl.ds(i * _ROW_BLOCK, _ROW_BLOCK)

        def proj_head(h, acc):
            return acc + jnp.dot(
                attn_scr[h, rows, :], wproj_ref[h],
                preferred_element_type=jnp.float32,
            )

        a0 = jnp.zeros((_ROW_BLOCK, D), jnp.float32)
        a = jax.lax.fori_loop(0, num_heads, proj_head, a0)
        x2 = x_ref[0, rows, :] + a.astype(x.dtype) + bproj_ref[0]
        y2 = _ln(x2, ln2_ref[0], ln2_ref[1])
        mid = jnp.dot(
            y2, wfc1_ref[:], preferred_element_type=jnp.float32
        ).astype(x.dtype) + bfc1_ref[0]
        mid = jax.nn.gelu(mid, approximate=True)
        m2 = jnp.dot(
            mid, wfc2_ref[:], preferred_element_type=jnp.float32
        ).astype(x.dtype) + bfc2_ref[0]
        out_ref[0, rows, :] = x2 + m2
        return 0

    jax.lax.fori_loop(0, n_rows, out_body, 0)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_block(
    x: jnp.ndarray,  # (B, N, D)
    blk: dict,  # one block's parameter pytree (models.vit layout)
    num_heads: int,
    n_valid: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one transformer block with the fused kernel. bf16-oriented;
    no LayerScale support (DINO v1 blocks)."""
    B, N, D = x.shape
    hd = D // num_heads
    Hd = blk["fc1"]["kernel"].shape[1]
    npad = -(-N // _ROW_BLOCK) * _ROW_BLOCK
    nv = N if n_valid is None else n_valid
    xp = jnp.pad(x, ((0, 0), (0, npad - N), (0, 0)))
    mask = jnp.where(jnp.arange(npad) < nv, 0.0, -1e30).astype(jnp.float32)[None]

    dt = x.dtype
    wqkv = blk["qkv"]["kernel"].astype(dt)  # (D, 3D)
    bqkv = blk["qkv"]["bias"].astype(dt)  # (3D,)

    def head_major(w):  # (D, D_slice) → (H, D, hd)
        return jnp.transpose(w.reshape(D, num_heads, hd), (1, 0, 2))

    wq = head_major(wqkv[:, :D])
    wk = head_major(wqkv[:, D : 2 * D])
    wv = head_major(wqkv[:, 2 * D :])
    bq = bqkv[:D].reshape(num_heads, 1, hd)
    bk = bqkv[D : 2 * D].reshape(num_heads, 1, hd)
    bv = bqkv[2 * D :].reshape(num_heads, 1, hd)
    wproj = blk["proj"]["kernel"].astype(dt).reshape(num_heads, hd, D)

    def row2(p):
        return jnp.stack([p["scale"], p["bias"]]).astype(dt)

    args = (
        mask, xp, wq, wk, wv, bq, bk, bv,
        wproj, blk["proj"]["bias"].astype(dt)[None],
        blk["fc1"]["kernel"].astype(dt), blk["fc1"]["bias"].astype(dt)[None],
        blk["fc2"]["kernel"].astype(dt), blk["fc2"]["bias"].astype(dt)[None],
        row2(blk["norm1"]), row2(blk["norm2"]),
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(
            _fused_block_kernel, num_heads=num_heads, n_rows=npad // _ROW_BLOCK
        ),
        out_shape=jax.ShapeDtypeStruct((B, npad, D), dt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, npad), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + [full() for _ in range(14)],
        out_specs=pl.BlockSpec(
            (1, npad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((npad, D), dt),
            pltpu.VMEM((num_heads, npad, hd), dt),
        ],
        # the residual stream is updated in place (every row block is fully
        # read before it is written), saving one (Np, D) VMEM buffer pair
        input_output_aliases={1: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * npad * D * (3 * D + D + 2 * Hd) + 4 * B * npad * npad * D,
            bytes_accessed=2 * B * npad * D * dt.itemsize,
            transcendentals=B * npad * npad,
        ),
    )(*args)
    return out[:, :N]
