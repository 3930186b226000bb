"""Fused per-voxel similarity maps: the framework's interactive hot path.

The reference computes per-class similarity volumes with one big einsum
``'fwhd,caf->cawhd'`` followed by threshold → sharpen → mean
(predict_ntf.py:62-72), materializing a (C, A, W, H, D) tensor. On TPU this
becomes a tiled Pallas matmul over the flattened voxel axis with the
elementwise chain and the per-class annotation mean fused into the kernel:

    out[n, c] = Σ_a M[a, c] · g(feat[n, :] · q[a, :])        (mean-last)
    out[n, c] = g(Σ_a M[a, c] · feat[n, :] · q[a, :])        (mean-first)

where ``g(s) = where(s ≥ τ, s, 0) ** exponent`` and ``M`` holds 1/A_c in
class c's annotation rows. The (N, ΣA) score matrix lives only in VMEM one
(block_n × block_a) tile at a time — HBM traffic is O(N·F + N·C) instead of
O(N·ΣA). ``mean_first`` reproduces the reference's >1024-annotation fast
path (predict_ntf.py:62-63) which averages raw dots *before* the
nonlinearity.

The XLA path computes the same quantities with einsums (fine for small A,
used on CPU and as the parity oracle for the kernel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_THRESHOLD = 0.25  # predict_ntf.py:71
DEFAULT_EXPONENT = 2.5  # predict_ntf.py:71

_BLOCK_N = 1024
_BLOCK_A = 512


def _g(s, threshold, exponent):
    s = jnp.where(s >= threshold, s, 0.0)
    return s ** exponent


def class_mean_matrix(counts: list[int], total_padded: int) -> np.ndarray:
    """(ΣA_padded, C) matrix averaging annotation columns per class.

    Classes with zero annotations get an all-zero column (their similarity
    map is zero rather than crashing; GUI frontends may send empty classes
    mid-annotation).
    """
    C = len(counts)
    m = np.zeros((total_padded, C), dtype=np.float32)
    idx = 0
    for c, n in enumerate(counts):
        if n > 0:
            m[idx : idx + n, c] = 1.0 / n
        idx += n
    return m


def _similarity_kernel(
    f_ref, q_ref, m_ref, o_ref, *, threshold, exponent, mean_first, n_ablocks,
    precision, class_major,
):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    s = jnp.dot(
        f_ref[:], q_ref[:], preferred_element_type=jnp.float32,
        precision=precision,
    )  # (Bn, Ba)
    if not mean_first:
        s = _g(s, threshold, exponent)
    # the class-mean contraction is ~C/F of the kernel's FLOPs but dominates
    # the bf16 rounding error of the averaged maps — always run it fp32
    if class_major:
        # (C, Bn) accumulator: C rides the 8-sublane axis and Bn fills the
        # lanes, so the store tile is lane-dense (vs C≈5 of 128 lanes in
        # the (Bn, C) layout) AND downstream consumers get the (C, N)
        # volume order directly — no O(N·C) transpose after the kernel.
        o_ref[:] += jax.lax.dot_general(
            m_ref[:].astype(jnp.float32), s,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision="highest",
        )
    else:
        o_ref[:] += jnp.dot(
            s, m_ref[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision="highest",
        )

    if mean_first:
        @pl.when(j == n_ablocks - 1)
        def _():
            o_ref[:] = _g(o_ref[:], threshold, exponent)


@functools.partial(
    jax.jit,
    static_argnames=(
        "threshold", "exponent", "mean_first", "precision", "out_layout",
    ),
)
def similarity_pallas(
    feats: jnp.ndarray,  # (N, F)
    queries: jnp.ndarray,  # (A, F)
    class_mat: jnp.ndarray,  # (A, C)
    threshold: float = DEFAULT_THRESHOLD,
    exponent: float = DEFAULT_EXPONENT,
    mean_first: bool = False,
    precision: str = "default",
    out_layout: str = "nc",  # 'nc' → (N, C); 'cn' → (C, N) lane-dense
) -> jnp.ndarray:
    """Fused similarity maps on TPU. Returns (N, C) — or (C, N) — float32.

    ``precision='highest'`` runs the MXU dots in multi-pass fp32 for
    parity-grade artifacts (≈3× slower, still fused). ``out_layout='cn'``
    stores the accumulator class-major: the (C, BLOCK_N) tile fills all
    128 lanes (the (BLOCK_N, C) tile fills only C≈5) and matches the
    (C, W, H, D) order the similarity pipeline wants, removing its
    post-kernel transpose.
    """
    N, F = feats.shape
    A, C = class_mat.shape
    npad = -(-N // _BLOCK_N) * _BLOCK_N
    apad = -(-A // _BLOCK_A) * _BLOCK_A
    fpad = -(-F // 128) * 128

    feats = jnp.pad(feats, ((0, npad - N), (0, fpad - F)))
    qT = jnp.pad(queries, ((0, apad - A), (0, fpad - F))).T  # (Fp, Ap)
    # zero query rows ⇒ s = 0 ⇒ g(0) = 0 and M rows are zero: padding exact
    m = jnp.pad(class_mat, ((0, apad - A), (0, 0)))

    class_major = out_layout == "cn"
    n_ablocks = apad // _BLOCK_A
    grid = (npad // _BLOCK_N, n_ablocks)
    out = pl.pallas_call(
        functools.partial(
            _similarity_kernel,
            threshold=threshold,
            exponent=exponent,
            mean_first=mean_first,
            n_ablocks=n_ablocks,
            precision=None if precision == "default" else precision,
            class_major=class_major,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (C, npad) if class_major else (npad, C), jnp.float32
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (_BLOCK_N, fpad), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (fpad, _BLOCK_A), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_BLOCK_A, C), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (C, _BLOCK_N), lambda i, j: (0, i), memory_space=pltpu.VMEM
            )
            if class_major
            else pl.BlockSpec(
                (_BLOCK_N, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            )
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * npad * fpad * apad + 2 * npad * apad * C,
            bytes_accessed=npad * fpad * feats.dtype.itemsize + npad * C * 4,
            transcendentals=npad * apad,  # pow
        ),
    )(feats, qT, m)
    return out[:, :N] if class_major else out[:N]


def similarity_xla(
    feats: jnp.ndarray,
    queries: jnp.ndarray,
    class_mat: jnp.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
    exponent: float = DEFAULT_EXPONENT,
    mean_first: bool = False,
    precision: str = "highest",
    out_layout: str = "nc",
) -> jnp.ndarray:
    """XLA reference path; same contract as ``similarity_pallas``."""
    s = jnp.einsum(
        "nf,af->na", feats.astype(jnp.float32), queries.astype(jnp.float32),
        precision=precision,
    )
    eq = "na,ac->cn" if out_layout == "cn" else "na,ac->nc"
    if mean_first:
        return _g(
            jnp.einsum(eq, s, class_mat, precision=precision),
            threshold, exponent,
        )
    return jnp.einsum(
        eq, _g(s, threshold, exponent), class_mat, precision=precision
    )


def fused_similarity_m(
    feats_flat: jnp.ndarray,
    queries: jnp.ndarray,
    class_mat: jnp.ndarray,
    threshold: float = DEFAULT_THRESHOLD,
    exponent: float = DEFAULT_EXPONENT,
    mean_first: bool = False,
    impl: str = "auto",
    out_layout: str = "nc",
) -> jnp.ndarray:
    """Similarity maps with an explicit (A, C) class-mean matrix.

    Because the mean matrix is a runtime value, callers can pad the
    annotation axis to a bucket size and keep the jit cache warm while the
    user adds/removes annotations interactively.
    """
    if impl == "auto":
        on_tpu = jax.devices()[0].platform in ("tpu", "axon")
        impl = "pallas" if on_tpu else "xla"
    fn = similarity_pallas if impl == "pallas" else similarity_xla
    return fn(
        feats_flat, queries, class_mat, threshold, exponent, mean_first,
        out_layout=out_layout,
    )


def fused_similarity(
    feats_flat: jnp.ndarray,
    queries: jnp.ndarray,
    class_counts: list[int],
    threshold: float = DEFAULT_THRESHOLD,
    exponent: float = DEFAULT_EXPONENT,
    mean_first: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Similarity maps for concatenated per-class queries.

    Args:
        feats_flat: (N, F) flattened feature volume.
        queries: (ΣA, F) per-class annotation features, classes contiguous.
        class_counts: annotations per class (defines the mean matrix).

    Returns:
        (N, C) float32 per-class similarity.
    """
    m = jnp.asarray(class_mean_matrix(class_counts, queries.shape[0]))
    return fused_similarity_m(
        feats_flat, queries, m, threshold, exponent, mean_first, impl
    )
