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
             per-head (D, hd) matmuls at hd=64; padded-token rows are
             then zeroed ONCE (they are LN1-bias rows, not zeros)
    stage 3: ONE pass over row blocks:
             q = y[rows]@Wq (full-width); per head (static unroll →
             static 64-col lane slices, which Mosaic allows): scores,
             fp32 softmax, PV; head outputs concatenated; then
             proj + residual + LN2 + MLP + residual → out rows.
The single row-block pass keeps the attention output in registers — no
(H, Np, hd) scratch round-trip. ``input_output_aliases`` updates the
residual stream in place (every row block is fully read before written).

Softmax is restructured to minimize VPU passes over the (Rb, Np) score
tile — the exposed non-MXU time of the kernel:
  - the 1/√d scale AND log2(e) are folded into Wq/bq on the host, so the
    kernel uses exp2 (the VPU-native exponential) with no per-tile scale
    pass;
  - key-padding masking costs nothing per tile: padded K/V rows are
    zeroed once in stage 2, making padded score columns exactly 0;
  - the softmax SUM never runs on the VPU: V is laid out per head with an
    all-ones indicator lane (stride 128 — the PV output tile pads to 128
    lanes anyway, so the extra column is MXU-free), and the PV matmul
    emits numerator and denominator together; padded keys drop out of the
    denominator exactly because their V rows (incl. indicator) are zero;
  - the denominator divide is a reciprocal-multiply on the (Rb, hd) head
    output, never on the (Rb, Np) tile.
The row-wise max subtraction is kept (numerical safety); since padded
columns contribute score 0, m ≥ 0 always.

Measured (ViT-S/8 geometry, (16, 4097, 384) bf16, 12 blocks, v5e):
81.7 ms vs 157.5 ms for the unfused XLA+Pallas-attention path (92 →
83.4 ms after the round-2 softmax restructure, → 81.7 with the
geometry-aware 384-row blocks; 79.7 ms with softmax_max=False — see
scripts/bench_block.py). The remaining gap to roofline is (a) the
hd=64 QK^T contraction, which runs at half MXU depth — head-packing
cannot recover it: any packing scheme needs the same MXU cycles, the
zero blocks of a block-diagonal operand occupy the array exactly as long
as the half-depth bubbles do — and (b) exposed VPU time of the max/exp2
chain (~20 ms over the ~57 ms MXU floor, only partially overlapped;
grid-level row-block pipelining measured neutral at RB=256 and harmful
at RB=384 — the VPU chain is data-dependent on its own row block).

Numerics: bf16 matmuls with fp32 LN statistics and fp32 softmax — the
same contract as the speed-mode XLA path. Deviation from an fp32 oracle
matches the XLA bf16 path's own (~1.9% max rel over 12 blocks, both) —
accumulation-order noise. Parity mode ('highest') keeps XLA.

The row-block size is chosen per geometry (see ``_pick_row_block``):
384 while the fp32 score tile fits the budget, else 256; 512-row tiles
trip a TPU runtime FailedPrecondition at Np≈4k (oversized VMEM working
set).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-block size: Np pads to a multiple of it, so it sets BOTH the VMEM
# score-tile height and the padded token count (4097 → 4224 at 384 vs
# 4352 at 256 — 3% less padding, ~6% less score work). Measured on the
# 12-block ViT-S stack: 384 → 81.8 ms vs 256 → 83.4 ms (79.7 ms with
# softmax_max=False — under the round-1 80 ms target); 128 and 512 are
# slower / trip a FailedPrecondition (oversized fp32 score tile) at
# Np≈4k. The per-call choice keeps 384 while the (rb, npad) fp32 tile
# stays within budget and falls back to 256 for longer sequences;
# VITTF_FUSED_ROW_BLOCK pins it for experiments.
_ROW_BLOCK_ENV = os.environ.get("VITTF_FUSED_ROW_BLOCK")
_ROW_BLOCK = int(_ROW_BLOCK_ENV) if _ROW_BLOCK_ENV else 256  # legacy alias
_LOG2E = math.log2(math.e)


def _pick_row_block(n_tokens: int) -> int:
    if _ROW_BLOCK_ENV:
        return int(_ROW_BLOCK_ENV)
    npad384 = -(-n_tokens // 384) * 384
    # ~8 MB fp32 score-tile budget (the 512-row failure was ~9 MB)
    return 384 if 384 * npad384 * 4 <= 8 * 2**20 else 256


def _ln(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * scale + bias


def _fused_block_kernel(
    x_ref,  # (1, Np, D)
    wq_ref, wk_ref,  # (D, D); wq pre-scaled by log2(e)/√hd
    bq_ref, bk_ref,  # (1, D); bq pre-scaled likewise
    wv_ref, bv_ref,  # (D, H·128), (1, H·128): per-head V + indicator col
    wproj_ref, bproj_ref,  # (D, D), (1, D)
    wfc1_ref, bfc1_ref,  # (D, Hd), (1, Hd)
    wfc2_ref, bfc2_ref,  # (Hd, D), (1, D)
    ln1_ref, ln2_ref,  # (2, D): row 0 scale, row 1 bias
    ls_ref,  # (2, D): LayerScale gammas (row 0 ls1, row 1 ls2; ones if none)
    out_ref,  # (1, Np, D)
    y_scr, k_scr, v_scr,  # VMEM (Np, D), (Np, D), (Np, H·128)
    *, num_heads: int, n_rows: int, n_pad: int, skip_max: bool = False,
    score_bf16: bool = False, row_block: int = 256,
):
    D = x_ref.shape[-1]
    hd = D // num_heads
    x = x_ref[0]
    Np = x.shape[0]
    HW = v_scr.shape[-1] // num_heads  # 128: head V lane stride

    y_scr[:] = _ln(x, ln1_ref[0], ln1_ref[1])
    y = y_scr[:]
    k_scr[:] = (
        jnp.dot(y, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[:]
    ).astype(y.dtype)
    # V is computed in an expanded (Np, H·128) layout: head h's values live
    # in lanes [h·128, h·128+hd), and lane h·128+hd is an all-ones valid
    # indicator (from the bias; its W column is zero). The PV matmul then
    # yields numerator AND softmax denominator in one product — no (Rb, Np)
    # sum reduce on the VPU, and padded keys drop out of the denominator
    # exactly because their rows are zeroed below.
    v_scr[:] = (
        jnp.dot(y, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[:]
    ).astype(y.dtype)
    if n_pad:
        # padded tokens are LN1-bias rows, not zeros — zero their K/V once
        # so (a) their score columns are exactly 0 (no per-tile mask pass)
        # and (b) their PV/denominator contribution is exactly 0
        k_scr[pl.ds(Np - n_pad, n_pad), :] = jnp.zeros(
            (n_pad, D), k_scr.dtype
        )
        v_scr[pl.ds(Np - n_pad, n_pad), :] = jnp.zeros(
            (n_pad, v_scr.shape[-1]), v_scr.dtype
        )

    def row_body(i, _):
        rows = pl.ds(i * row_block, row_block)
        _row_block_body(
            x_ref, wq_ref, wproj_ref, bproj_ref, wfc1_ref, bfc1_ref,
            wfc2_ref, bfc2_ref, bq_ref, ln2_ref, ls_ref, y_scr, k_scr,
            v_scr, out_ref.at[0, rows, :], rows, num_heads, skip_max,
            score_bf16,
        )
        return 0

    jax.lax.fori_loop(0, n_rows, row_body, 0)


def _row_block_body(
    x_ref, wq_ref, wproj_ref, bproj_ref, wfc1_ref, bfc1_ref, wfc2_ref,
    bfc2_ref, bq_ref, ln2_ref, ls_ref, y_scr, k_scr, v_scr, out_ref,
    rows, num_heads, skip_max=False, score_bf16=False,
):
    """Shared per-row-block math: q → per-head attention → proj → MLP.

    Writes the block's output rows into ``out_ref`` (a (Rb, D) view).

    ``skip_max`` drops the row-max subtraction: exp2 runs on raw scores.
    Exact softmax identity in real arithmetic; in fp32 it is safe while
    |score| < ~120 in the exp2 domain (real DINO logits are O(10)) and
    saves one full (Rb, Np) VPU reduce per head. Opt-in; overflow would
    surface as inf/0 outputs, never silently wrong values.

    ``score_bf16`` casts the QK^T score tile to bf16 before exp2 (the
    MXU accumulator must stay fp32 — Mosaic rejects bf16 acc), so exp2
    runs on a packed bf16 tile and the post-exp2 cast disappears.
    MEASURED NEUTRAL on the 12-block ViT-S stack (79.5 vs 80.0 ms with
    skip_max; 94.8 ms — a clear REGRESSION — with the max pass, whose
    bf16 row-reduce lowers poorly). Kept as an experiment knob only;
    not exposed in the block_impl grammar."""
    D = x_ref.shape[-1]
    hd = D // num_heads
    HW = v_scr.shape[-1] // num_heads
    dt = x_ref.dtype
    sdt = jnp.bfloat16 if score_bf16 else jnp.float32
    qall = (
        jnp.dot(
            y_scr[rows, :], wq_ref[:], preferred_element_type=jnp.float32
        ) + bq_ref[:]
    ).astype(dt)  # already in the exp2 domain (scale·log2e folded)
    outs = []
    for h in range(num_heads):  # static unroll → static lane slices
        qh = qall[:, h * hd:(h + 1) * hd]
        kh = k_scr[:, h * hd:(h + 1) * hd]
        vh = v_scr[:, h * HW:(h + 1) * HW]  # (Np, 128) incl. indicator
        s = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,  # Mosaic: acc must be 32-bit
        ).astype(sdt)  # (Rb, Np); padded key columns are exactly 0
        if skip_max:
            p = jnp.exp2(s)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)  # ≥ 0 when padded
            p = jnp.exp2(s - m)
        o_ext = jnp.dot(
            p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
        )  # (Rb, 128): [:, :hd] numerator, [:, hd] = Σ_valid p
        denom = jnp.maximum(o_ext[:, hd:hd + 1], jnp.float32(1e-38))
        o = o_ext[:, :hd] * pl.reciprocal(denom, approx=False)
        outs.append(o.astype(dt))
    attn = jnp.concatenate(outs, axis=-1)  # (Rb, D)
    a = jnp.dot(attn, wproj_ref[:], preferred_element_type=jnp.float32)
    a = a.astype(dt) + bproj_ref[0]
    x2 = x_ref[0, rows, :] + a * ls_ref[0]
    y2 = _ln(x2, ln2_ref[0], ln2_ref[1])
    mid = jnp.dot(
        y2, wfc1_ref[:], preferred_element_type=jnp.float32
    ).astype(dt) + bfc1_ref[0]
    mid = jax.nn.gelu(mid, approximate=True)
    m2 = jnp.dot(
        mid, wfc2_ref[:], preferred_element_type=jnp.float32
    ).astype(dt) + bfc2_ref[0]
    out_ref[...] = x2 + m2 * ls_ref[1]


def _fused_block_kernel_rows(
    x_ref,  # (1, Np, D) at (b, 0, 0): full residual stream, VMEM-resident
    wq_ref, wk_ref, bq_ref, bk_ref, wv_ref, bv_ref,
    wproj_ref, bproj_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
    ln1_ref, ln2_ref, ls_ref,
    out_ref,  # (1, ROW_BLOCK, D) at (b, i, 0)
    y_scr, k_scr, v_scr,  # persistent VMEM, filled at i == 0
    *, num_heads: int, n_pad: int, skip_max: bool = False,
    score_bf16: bool = False, row_block: int = 256,
):
    """Row-block-per-program variant: grid=(B, n_rows).

    The K/V stages run ONCE per batch element (first row-block program;
    VMEM scratch persists across the sequential grid) and each program
    handles one row block — Mosaic can then overlap the output DMA and
    the next program's prologue with the current VPU softmax tail, the
    grid-level pipelining lever named in docs/STATUS.md. Measured on the
    12-block ViT-S stack by scripts/bench_block.py (see --impl rows).
    """
    D = x_ref.shape[-1]
    Np = x_ref.shape[1]
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        x = x_ref[0]
        y_scr[:] = _ln(x, ln1_ref[0], ln1_ref[1])
        y = y_scr[:]
        k_scr[:] = (
            jnp.dot(y, wk_ref[:], preferred_element_type=jnp.float32)
            + bk_ref[:]
        ).astype(y.dtype)
        v_scr[:] = (
            jnp.dot(y, wv_ref[:], preferred_element_type=jnp.float32)
            + bv_ref[:]
        ).astype(y.dtype)
        if n_pad:
            k_scr[pl.ds(Np - n_pad, n_pad), :] = jnp.zeros(
                (n_pad, D), k_scr.dtype
            )
            v_scr[pl.ds(Np - n_pad, n_pad), :] = jnp.zeros(
                (n_pad, v_scr.shape[-1]), v_scr.dtype
            )

    rows = pl.ds(i * row_block, row_block)
    _row_block_body(
        x_ref, wq_ref, wproj_ref, bproj_ref, wfc1_ref, bfc1_ref, wfc2_ref,
        bfc2_ref, bq_ref, ln2_ref, ls_ref, y_scr, k_scr, v_scr,
        out_ref.at[0], rows, num_heads, skip_max, score_bf16,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "n_valid", "interpret", "impl", "softmax_max",
        "score_dtype",
    ),
)
def fused_block(
    x: jnp.ndarray,  # (B, N, D)
    blk: dict,  # one block's parameter pytree (models.vit layout)
    num_heads: int,
    n_valid: int | None = None,
    interpret: bool = False,
    impl: str = "loop",  # 'loop' (fori over row blocks) | 'rows' (grid)
    softmax_max: bool = True,  # False skips the row-max pass (see body)
    score_dtype: str = "fp32",  # 'bf16' halves the score tile (see body)
) -> jnp.ndarray:
    """Apply one transformer block with the fused kernel. bf16-oriented.
    LayerScale (DINOv2 'ls1'/'ls2' gammas) is applied when present."""
    B, N, D = x.shape
    hd = D // num_heads
    # the expanded-V layout gives each head a 128-lane stripe: hd value
    # lanes + 1 indicator lane. hd >= 128 would silently collide with the
    # next head's stripe — guard it (all DINO archs have hd = 64).
    if hd >= 128:
        raise ValueError(
            f"fused_block expanded-V layout requires head_dim < 128 "
            f"(got {hd}); use block_impl='xla' for this geometry"
        )
    Hd = blk["fc1"]["kernel"].shape[1]
    rb = _pick_row_block(N)
    npad = -(-N // rb) * rb
    nv = N if n_valid is None else n_valid
    xp = jnp.pad(x, ((0, 0), (0, npad - N), (0, 0)))

    dt = x.dtype
    # fold the attention scale AND log2(e) into Wq/bq: the kernel's scores
    # live in the exp2 domain with zero per-tile scaling passes
    qscale = jnp.asarray(hd ** -0.5 * _LOG2E, jnp.float32)
    wqkv = blk["qkv"]["kernel"].astype(jnp.float32)  # (D, 3D)
    bqkv = blk["qkv"]["bias"].astype(jnp.float32)  # (3D,)
    wq = (wqkv[:, :D] * qscale).astype(dt)
    bq = (bqkv[:D] * qscale).astype(dt)
    # expanded V layout (head stride 128): lanes [h·128, h·128+hd) carry
    # head h's V columns; lane h·128+hd is the all-ones valid indicator
    # (bias 1.0, zero weight column) that the PV matmul turns into the
    # softmax denominator — see the kernel docstring
    HW = 128
    wv = jnp.zeros((D, num_heads * HW), jnp.float32)
    bv = jnp.zeros((num_heads * HW,), jnp.float32)
    for h in range(num_heads):
        wv = wv.at[:, h * HW : h * HW + hd].set(
            wqkv[:, 2 * D + h * hd : 2 * D + (h + 1) * hd]
        )
        bv = bv.at[h * HW : h * HW + hd].set(
            bqkv[2 * D + h * hd : 2 * D + (h + 1) * hd]
        )
        bv = bv.at[h * HW + hd].set(1.0)

    def row2(p):
        return jnp.stack([p["scale"], p["bias"]]).astype(dt)

    if "ls1" in blk:
        ls = jnp.stack([blk["ls1"], blk["ls2"]]).astype(dt)
    else:
        ls = jnp.ones((2, D), dt)
    args = (
        xp,
        wq, wqkv[:, D : 2 * D].astype(dt),
        bq[None], bqkv[D : 2 * D].astype(dt)[None],
        wv.astype(dt), bv.astype(dt)[None],
        blk["proj"]["kernel"].astype(dt), blk["proj"]["bias"].astype(dt)[None],
        blk["fc1"]["kernel"].astype(dt), blk["fc1"]["bias"].astype(dt)[None],
        blk["fc2"]["kernel"].astype(dt), blk["fc2"]["bias"].astype(dt)[None],
        row2(blk["norm1"]), row2(blk["norm2"]), ls,
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    scratch = [
        pltpu.VMEM((npad, D), dt),  # y
        pltpu.VMEM((npad, D), dt),  # k
        pltpu.VMEM((npad, num_heads * HW), dt),  # expanded v
    ]
    cost = pl.CostEstimate(
        flops=2 * B * npad * D * (3 * D + D + 2 * Hd) + 4 * B * npad * npad * D,
        bytes_accessed=2 * B * npad * D * dt.itemsize,
        transcendentals=B * npad * npad,
    )
    params_cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if impl == "rows":
        # grid=(B, n_rows): one program per row block, K/V stages run once
        # per batch element into persistent scratch (see kernel docstring).
        # No in-place aliasing here: out blocks stream while the full x
        # block stays VMEM-resident across the row programs.
        out = pl.pallas_call(
            functools.partial(
                _fused_block_kernel_rows,
                num_heads=num_heads,
                n_pad=npad - nv,
                skip_max=not softmax_max,
                score_bf16=score_dtype == "bf16",
                row_block=rb,
            ),
            out_shape=jax.ShapeDtypeStruct((B, npad, D), dt),
            grid=(B, npad // rb),
            in_specs=[
                pl.BlockSpec(
                    (1, npad, D), lambda b, i: (b, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ] + [full() for _ in range(15)],
            out_specs=pl.BlockSpec(
                (1, rb, D), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=scratch,
            compiler_params=params_cp,
            interpret=interpret,
            cost_estimate=cost,
        )(*args)
        return out[:, :N]
    out = pl.pallas_call(
        functools.partial(
            _fused_block_kernel,
            num_heads=num_heads,
            n_rows=npad // rb,
            n_pad=npad - nv,
            skip_max=not softmax_max,
            score_bf16=score_dtype == "bf16",
            row_block=rb,
        ),
        out_shape=jax.ShapeDtypeStruct((B, npad, D), dt),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, npad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ] + [full() for _ in range(15)],
        out_specs=pl.BlockSpec(
            (1, npad, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=scratch,
        # the residual stream is updated in place (every row block is fully
        # read before it is written), saving one (Np, D) VMEM buffer pair
        input_output_aliases={0: 0},
        compiler_params=params_cp,
        interpret=interpret,
        cost_estimate=cost,
    )(*args)
    return out[:, :N]
