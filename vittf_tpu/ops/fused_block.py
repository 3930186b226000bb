"""Fused transformer block: LN→qkv→attention→proj→LN→MLP in one kernel.

Opt-in TPU path (``fused_block``) targeting the inter-op HBM traffic of
the XLA block (~1 GB/block/batch of activations bouncing between
LayerNorm, matmuls and attention): one kernel program processes one full
slice with the residual stream resident in VMEM. Covers the same math as
``models.vit._block`` (the reference's ViT block, infer.py:173-177 runs
it through torch CUDA kernels) in speed-mode numerics.

Structure per program (one slice of the batch grid):
    stage 1: y = LN1(x)                          → y_scr (Np, D)
    stage 2: k = y@Wk, v = y@Wv                  → k_scr, v_scr (Np, D)
             full-width (D, D) matmuls — 2× the MXU utilization of
             per-head (D, hd) matmuls at hd=64
    stage 3: ONE pass over 256-row blocks:
             q = y[rows]@Wq (full-width); per head (static unroll →
             static 64-col lane slices, which Mosaic allows): scores,
             fp32 softmax, PV; head outputs concatenated; then
             proj + residual + LN2 + MLP + residual → out rows.
The single row-block pass keeps the attention output in registers — no
(H, Np, hd) scratch round-trip. ``input_output_aliases`` updates the
residual stream in place (every row block is fully read before written).

Measured (ViT-S/8 geometry, (16, 4097, 384) bf16, 12 blocks, v5e):
102 ms vs 179 ms for the unfused XLA+Pallas-attention path (43% faster).
The remaining gap to roofline is the hd=64 attention contraction, which
caps the QK^T/PV matmuls at half MXU utilization.

Numerics: bf16 matmuls with fp32 LN statistics and fp32 softmax — the
same contract as the speed-mode XLA path. Deviation from an fp32 oracle
matches the XLA bf16 path's own (~1.9% max rel over 12 blocks, both) —
accumulation-order noise. Parity mode ('highest') keeps XLA.

ROW_BLOCK stays at 256: 512-row fp32 score tiles trip a TPU runtime
FailedPrecondition at Np≈4k (oversized VMEM working set).
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
    wq_ref, wk_ref, wv_ref,  # (D, D)
    bq_ref, bk_ref, bv_ref,  # (1, D)
    wproj_ref, bproj_ref,  # (D, D), (1, D)
    wfc1_ref, bfc1_ref,  # (D, Hd), (1, Hd)
    wfc2_ref, bfc2_ref,  # (Hd, D), (1, D)
    ln1_ref, ln2_ref,  # (2, D): row 0 scale, row 1 bias
    ls_ref,  # (2, D): LayerScale gammas (row 0 ls1, row 1 ls2; ones if none)
    out_ref,  # (1, Np, D)
    y_scr, k_scr, v_scr,  # VMEM (Np, D)
    *, num_heads: int, n_rows: int,
):
    D = x_ref.shape[-1]
    hd = D // num_heads
    scale = hd ** -0.5
    x = x_ref[0]

    y_scr[:] = _ln(x, ln1_ref[0], ln1_ref[1])
    y = y_scr[:]
    k_scr[:] = (
        jnp.dot(y, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[:]
    ).astype(y.dtype)
    v_scr[:] = (
        jnp.dot(y, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]
    ).astype(y.dtype)

    def row_body(i, _):
        rows = pl.ds(i * _ROW_BLOCK, _ROW_BLOCK)
        qall = (
            jnp.dot(
                y_scr[rows, :], wq_ref[:], preferred_element_type=jnp.float32
            ) + bq_ref[:]
        ).astype(x.dtype)
        outs = []
        for h in range(num_heads):  # static unroll → static lane slices
            qh = qall[:, h * hd:(h + 1) * hd]
            kh = k_scr[:, h * hd:(h + 1) * hd]
            vh = v_scr[:, h * hd:(h + 1) * hd]
            s = jax.lax.dot_general(
                qh * jnp.asarray(scale, qh.dtype), kh,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + mask_ref[:]  # (Rb, Np); padded keys get -1e30
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.dot(
                p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
            ) / denom
            outs.append(o.astype(x.dtype))
        attn = jnp.concatenate(outs, axis=-1)  # (Rb, D)
        a = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
        a = a.astype(x.dtype) + bproj_ref[0]
        x2 = x_ref[0, rows, :] + a * ls_ref[0]
        y2 = _ln(x2, ln2_ref[0], ln2_ref[1])
        mid = jnp.dot(
            y2, wfc1_ref[:], preferred_element_type=jnp.float32
        ).astype(x.dtype) + bfc1_ref[0]
        mid = jax.nn.gelu(mid, approximate=True)
        m2 = jnp.dot(
            mid, wfc2_ref[:], preferred_element_type=jnp.float32
        ).astype(x.dtype) + bfc2_ref[0]
        out_ref[0, rows, :] = x2 + m2 * ls_ref[1]
        return 0

    jax.lax.fori_loop(0, n_rows, row_body, 0)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_block(
    x: jnp.ndarray,  # (B, N, D)
    blk: dict,  # one block's parameter pytree (models.vit layout)
    num_heads: int,
    n_valid: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Apply one transformer block with the fused kernel. bf16-oriented.
    LayerScale (DINOv2 'ls1'/'ls2' gammas) is applied when present."""
    B, N, D = x.shape
    Hd = blk["fc1"]["kernel"].shape[1]
    npad = -(-N // _ROW_BLOCK) * _ROW_BLOCK
    nv = N if n_valid is None else n_valid
    xp = jnp.pad(x, ((0, 0), (0, npad - N), (0, 0)))
    mask = jnp.where(jnp.arange(npad) < nv, 0.0, -1e30).astype(jnp.float32)[None]

    dt = x.dtype
    wqkv = blk["qkv"]["kernel"].astype(dt)  # (D, 3D)
    bqkv = blk["qkv"]["bias"].astype(dt)  # (3D,)

    def row2(p):
        return jnp.stack([p["scale"], p["bias"]]).astype(dt)

    if "ls1" in blk:
        ls = jnp.stack([blk["ls1"], blk["ls2"]]).astype(dt)
    else:
        ls = jnp.ones((2, D), dt)
    args = (
        mask, xp,
        wqkv[:, :D], wqkv[:, D : 2 * D], wqkv[:, 2 * D :],
        bqkv[:D][None], bqkv[D : 2 * D][None], bqkv[2 * D :][None],
        blk["proj"]["kernel"].astype(dt), blk["proj"]["bias"].astype(dt)[None],
        blk["fc1"]["kernel"].astype(dt), blk["fc1"]["bias"].astype(dt)[None],
        blk["fc2"]["kernel"].astype(dt), blk["fc2"]["bias"].astype(dt)[None],
        row2(blk["norm1"]), row2(blk["norm2"]), ls,
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
        ] + [full() for _ in range(15)],
        out_specs=pl.BlockSpec(
            (1, npad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((npad, D), dt)] * 3,
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
