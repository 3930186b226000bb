"""Multi-head self-attention: Pallas fused kernel on TPU, XLA elsewhere.

The ViT slice batches put ~4k patch tokens per slice through 12 attention
blocks — this is the FLOPs hot spot of feature extraction (reference
infer.py:173-177 runs the same math through PyTorch CUDA kernels). The TPU
path fuses QK^T → masked softmax → PV into one Pallas kernel per
(batch·head, q-block) so the (N×N) attention matrix never touches HBM.

Sequence lengths here are ≤ ~8k (token grids up to ~90×90), so each kernel
instance keeps full K/V for one head resident in VMEM (≤ ~2 MB at fp32)
and computes one q-block against it — simpler than an online-softmax
streaming loop and equally HBM-optimal at these sizes. Longer sequences
fall back to the XLA path, which XLA tiles itself.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Past this many tokens, full-K/V-in-VMEM stops fitting comfortably.
_PALLAS_MAX_SEQ = 16384
_Q_BLOCK = 512


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:  # pragma: no cover
        return False


def _fused_attention_kernel(q_ref, k_ref, v_ref, o_ref, *, hd: int):
    """One q-block vs full K/V for one (batch·head): fused softmax attention.

    The kernel is VPU-bound (every elementwise op walks the (Bq, Np) score
    tile), so per-tile passes are minimized (same scheme as
    ops/fused_block.py): the 1/√d·log2(e) scale is pre-folded into q so
    the exponential is a bare exp2; K is zero-padded so padded score
    columns are exactly 0 (no mask pass); V carries an all-ones valid-
    indicator lane at column ``hd`` (zero on padded rows), so the PV
    matmul emits the softmax numerator AND denominator together — no
    (Bq, Np) sum reduce on the VPU and exact padding handling for free
    (the PV output tile pads to 128 lanes regardless, so the extra
    columns cost no MXU cycles).
    """
    q = q_ref[0]  # (Bq, hd), pre-scaled into the exp2 domain
    k = k_ref[0]  # (Np, hd), zero rows beyond N
    v = v_ref[0]  # (Np, Wv): [:, :hd] values, [:, hd] indicator
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Bq, Np); padded columns are exactly 0
    # NOTE: padded columns clamp m at >= 0, so this softmax is not
    # shift-invariant for all-negative rows; valid scores < -126 (exp2
    # domain) would underflow the denominator. Out of range for real ViT
    # activations; the clamp keeps that case finite (0-output, not NaN).
    m = jnp.max(s, axis=-1, keepdims=True)  # ≥ 0 when padded
    p = jnp.exp2(s - m)
    o_ext = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )  # (Bq, Wv)
    denom = jnp.maximum(o_ext[:, hd:hd + 1], jnp.float32(1e-38))
    o = o_ext[:, :hd] * pl.reciprocal(denom, approx=False)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def _attention_pallas(q, k, v, num_heads, interpret=False):
    """q/k/v: (B, H, N, hd) → (B, H, N, hd)."""
    import math

    B, H, N, hd = q.shape
    scale = hd ** -0.5 * math.log2(math.e)
    # fp32 runs (parity mode) halve the q-block: full-length fp32 score
    # tiles at 512 rows exceed the 16 MB VMEM budget around N≈4k
    qb = _Q_BLOCK if q.dtype.itemsize < 4 else _Q_BLOCK // 2
    npad = -(-N // qb) * qb
    wv = -(-(hd + 1) // 128) * 128  # V width incl. indicator, lane-aligned

    def prep(x):
        x = x.reshape(B * H, N, hd)
        return jnp.pad(x, ((0, 0), (0, npad - N), (0, 0)))

    qp, kp = prep(q * jnp.asarray(scale, q.dtype)), prep(k)
    vp = prep(v)
    ind = jnp.broadcast_to(
        (jnp.arange(npad) < N).astype(v.dtype)[None, :, None],
        (B * H, npad, 1),
    )
    vp = jnp.concatenate(
        [vp, ind, jnp.zeros((B * H, npad, wv - hd - 1), v.dtype)], axis=-1
    )

    grid = (B * H, npad // qb)
    out = pl.pallas_call(
        functools.partial(_fused_attention_kernel, hd=hd),
        out_shape=jax.ShapeDtypeStruct((B * H, npad, hd), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, qb, hd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, npad, hd), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, npad, wv), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, qb, hd), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * npad * npad * hd,
            # q + k at hd lanes, widened V at wv lanes, output at hd lanes
            bytes_accessed=B * H * npad * (3 * hd + wv) * q.dtype.itemsize,
            transcendentals=B * H * npad * npad,
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :N].reshape(B, H, N, hd)


def _attention_xla(q, k, v, precision):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, precision=precision)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, precision=precision)


def multi_head_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    precision: str = "default",
    impl: str = "auto",
) -> jnp.ndarray:
    """Self-attention over a fused qkv projection.

    Args:
        qkv: (B, N, 3D) — the qkv linear output (DINO layout: reshaped as
             (B, N, 3, heads, hd); reference infer.py:189-193).
        impl: 'auto' | 'pallas' | 'xla'.

    Returns:
        (B, N, D) attention output (pre-proj).
    """
    B, N, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    parts = qkv.reshape(B, N, 3, num_heads, hd)
    q, k, v = (
        jnp.transpose(parts[:, :, i], (0, 2, 1, 3)) for i in range(3)
    )  # (B, H, N, hd)

    if impl == "auto":
        impl = "pallas" if (_on_tpu() and N <= _PALLAS_MAX_SEQ) else "xla"
    if impl == "pallas":
        out = _attention_pallas(q, k, v, num_heads)
    else:
        out = _attention_xla(q, k, v, precision)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, D)
