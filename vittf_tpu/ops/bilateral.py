"""3D fast bilateral solver on a dense device-side bilateral grid.

The reference implements Barron & Poole's fast bilateral solver with
scipy.sparse CSR matrices built on the host from hashed 6-D bilateral
coordinates, and solves with scipy's preconditioned CG
(bilateral_solver3d.py:37-154). That design is host-bound and
sparsity-dependent — hostile to XLA's static shapes.

TPU-native redesign: for the grayscale references this pipeline feeds
(volumes expanded 1→3 channels, predict_ntf.py:92), the YUV chroma
coordinates are constant, so the occupied bilateral vertices live in a
dense 4-D lattice (x, y, z, luma) of static extent. Everything becomes
dense, static-shaped XLA:

- splat   = scatter-add of pixels onto the lattice
- blur    = central factor 2·dim plus ±1 shifts along the 4 axes
            (empty vertices hold 0 and so contribute nothing — exactly
            the sparse operator's behavior)
- slice   = gather
- solve   = matrix-free Jacobi-preconditioned CG
            (``jax.scipy.sparse.linalg.cg``), A(y) = λ(Dm − Dn·blur·Dn)y
            + diag(splat(c))·y, identity on empty vertices

This is *algebraically identical* to the reference's sparse formulation
restricted to occupied vertices (empty vertices are fixed at 0 and are
never sliced). The central blur factor stays 2·6 = 12: the reference's
6-D hash includes the two constant chroma dims, whose ±1 neighbors never
exist. Full-RGB references (non-constant chroma) are not supported by the
dense path; the 2D solver covers the RGB use case in the reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.ops.morphology import filter_sobel_separated
from vittf_tpu.utils.tensor import make_5d

GRID_PARAMS_DEFAULT = {  # reference bilateral_solver3d.py:156-160
    "sigma_luma": 4,
    "sigma_chroma": 4,
    "sigma_spatial": 24,
}
BS_PARAMS_DEFAULT = {  # reference bilateral_solver3d.py:162-167
    "lam": 256,
    "A_diag_min": 1e-5,
    "cg_tol": 1e-5,
    "cg_maxiter": 25,
}
_BLUR_DIM = 6  # the 3D reference hashes 6-D coords; central factor is 2·dim
_BLUR_DIM_2D = 5  # 2D reference: (x, y, luma, u, v)


def _grid_extents(shape, sigma_spatial, sigma_luma):
    spatial = tuple(int((s - 1) // sigma_spatial) + 1 for s in shape)
    luma = int(255.0 / sigma_luma) + 1
    return spatial + (luma,)


def _vertex_ids(shape, luma, sigma_spatial, sigma_luma):
    """Flat dense-lattice vertex id per pixel, any spatial rank."""
    ext = _grid_extents(shape, sigma_spatial, sigma_luma)
    vid = jnp.zeros((), jnp.int32)
    for ax, s in enumerate(shape):
        idx = (jnp.arange(s) / sigma_spatial).astype(jnp.int32)
        idx = idx.reshape((1,) * ax + (s,) + (1,) * (len(shape) - ax - 1))
        vid = vid * ext[ax] + idx
    il = (luma.astype(jnp.float32) / sigma_luma).astype(jnp.int32)
    vid = vid * ext[-1] + il
    return vid, ext


def _blocked_pixel_view(x: jnp.ndarray, ss: int, sp_ext, fill=0) -> jnp.ndarray:
    """(*shape) pixels → (n_cells, ss**rank), grouped by spatial lattice cell.

    The dense lattice's spatial cell of pixel i along any axis is i // ss,
    so pixels of one cell form an axis-aligned ss**rank block (the last
    block per axis may be partial — padded here with ``fill``). This view
    is what lets splat/slice run as blockwise reductions instead of
    scatter/gather (see ``bilateral_solve_gray``)."""
    r = x.ndim
    xp = jnp.pad(
        x,
        [(0, e * ss - s) for e, s in zip(sp_ext, x.shape)],
        constant_values=fill,
    )
    xb = xp.reshape(sum(([e, ss] for e in sp_ext), []))
    perm = [2 * i for i in range(r)] + [2 * i + 1 for i in range(r)]
    return xb.transpose(perm).reshape(int(np.prod(sp_ext)), ss**r)


def _unblock_pixel_view(xb: jnp.ndarray, ss: int, sp_ext, shape) -> jnp.ndarray:
    """Inverse of ``_blocked_pixel_view``: (n_cells, ss**rank) → (*shape)."""
    r = len(shape)
    xb = xb.reshape(tuple(sp_ext) + (ss,) * r)
    perm = sum(([i, r + i] for i in range(r)), [])
    xp = xb.transpose(perm).reshape(tuple(e * ss for e in sp_ext))
    return xp[tuple(slice(0, s) for s in shape)]


def _reblock3d_pallas(x: jnp.ndarray, ss: int, sp_ext, fill=0) -> jnp.ndarray:
    """Pallas pixel-blocking for rank 3: (Z, Y, X) -> (n_cells*ss, ss**2).

    The XLA ``_blocked_pixel_view`` lowering materializes a 6-D
    intermediate whose minor dim is ss (=7): TPU pads it to the (8, 128)
    tile -- an 18x layout expansion, 11.2 GB of temps at a 512**3 crop
    (measured via memory_analysis), which is what OOM'd headline-scale
    multi-class refinement. Here each (ss, ss, X) slab is read into VMEM
    once, transposed, and written out -- no bad-layout array ever touches
    HBM.

    LAYOUT: row r = cell*ss + dx holds the (dz, dy) plane of pixel-column
    dx of that cell (lanes = dz*ss + dy). This differs from the XLA
    view's (n_cells, ss**3) rows, because Mosaic cannot split the lane
    dim X into (NCX, ss); splat reduces over each cell's ss-row group +
    lanes (order-free), slice/unreblock use the same layout. Only
    ``_splat_pallas``/``_slice_pallas`` (with groups=ss) and
    ``_unreblock3d_pallas`` may consume this view."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Z, Y, X = x.shape
    NCZ, NCY, NCX = sp_ext
    n_cells = NCZ * NCY * NCX
    Xp = NCX * ss
    P = ss * ss

    # Mosaic block shapes must have their last two dims (8, 128)-divisible
    # or equal to the array dims; pad z/y to cell multiples (minor dims
    # untouched -- cheap) and split the leading dims so the per-program
    # block is (1, ss, 1, ss, X) with last dims equal to the array's.
    xp = jnp.pad(
        x, ((0, NCZ * ss - Z), (0, NCY * ss - Y), (0, 0)),
        constant_values=fill,
    ).reshape(NCZ, ss, NCY, ss, X)

    def kernel(x_ref, o_ref):
        v = x_ref[:].reshape(P, X)  # rows = dz*ss + dy, lanes = x
        if Xp != X:
            v = jnp.pad(v, ((0, 0), (0, Xp - X)), constant_values=fill)
        o_ref[:] = v.T.reshape(1, Xp, P)  # rows = x = cx*ss + dx

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NCZ * NCY, Xp, P), x.dtype),
        grid=(NCZ, NCY),
        in_specs=[
            pl.BlockSpec(
                (1, ss, 1, ss, X), lambda cz, cy: (cz, 0, cy, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, Xp, P), lambda cz, cy: (cz * NCY + cy, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(xp)
    # global row = ((cz*NCY + cy)*NCX + cx)*ss + dx = cell*ss + dx
    return out.reshape(n_cells * ss, P)


def _unreblock3d_pallas(xb: jnp.ndarray, ss: int, sp_ext, shape) -> jnp.ndarray:
    """Inverse of ``_reblock3d_pallas``: (n_cells*ss, ss**2) -> (*shape).

    Same rationale: the XLA inverse transpose pays the 18x padded-layout
    temp; here each (Xp, ss**2) row block becomes one (ss, ss, X) output
    slab via a single VMEM transpose."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Z, Y, X = shape
    NCZ, NCY, NCX = sp_ext
    Xp = NCX * ss
    P = ss * ss
    xb3 = xb.reshape(NCZ * NCY, Xp, P)

    def kernel(b_ref, o_ref):
        v = b_ref[:].reshape(Xp, P).T  # (ss**2, Xp)
        o_ref[:] = v[:, :X].reshape(1, ss, 1, ss, X)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((NCZ, ss, NCY, ss, X), xb.dtype),
        grid=(NCZ, NCY),
        in_specs=[
            pl.BlockSpec(
                (1, Xp, P), lambda cz, cy: (cz * NCY + cy, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, ss, 1, ss, X), lambda cz, cy: (cz, 0, cy, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )(xb3)
    return out.reshape(NCZ * ss, NCY * ss, X)[:Z, :Y]


def _pallas_cells_per_block(B_padded: int) -> int:
    """Cells per kernel program, bounded so the int32 + 2xf32 pixel
    blocks stay well under VMEM (<= ~3 MB of inputs per program).
    ``B_padded`` is pixels per cell at the LANE-PADDED width (lanes pad
    to 128)."""
    return max(8, min(256, (1 << 18) // max(B_padded, 1) * 8))


def _splat_pallas(
    il_b: jnp.ndarray,
    c_b: jnp.ndarray,
    tc_b: jnp.ndarray,
    L: int,
    groups: int = 1,
) -> jnp.ndarray:
    """One-pass splat: (n_cells*G, PB) luma bins + value planes ->
    (3, n_cells, L) [count, splat(c), splat(t*c)] per (cell, bin).

    The lax.scan form re-reads every pixel once per luma bin (L ~ 52
    passes over the crop -- 450 ms at a 512**3 crop); here each pixel
    block is read from HBM once and the L-bin histogram loop runs on
    VMEM-resident data. ``groups`` = rows per cell (ss for the rank-3
    reblock layout, 1 for the XLA blocked view). Algebraically identical
    to the scan/scatter impls (same per-(cell, bin) reduction)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, PB = il_b.shape
    G = groups
    n_cells = n_rows // G
    CB = _pallas_cells_per_block(G * (-(-PB // 128) * 128))
    # ragged grid, NO jnp.pad copies: padded copies of the pixel planes
    # would be GBs of pure transient traffic at headline crops. Mosaic
    # masks the last block's out-of-bounds stores, and its undefined
    # loaded rows only feed dropped outputs (cells never straddle blocks,
    # so every real cell's reduction sees only real rows).
    n_blocks = -(-n_cells // CB)

    def kernel(il_ref, c_ref, tc_ref, out_ref):
        il = il_ref[:]
        c = c_ref[:]
        tc = tc_ref[:]
        # Mosaic has no dynamic_update_slice; write bin l's column through
        # a lane-iota select instead
        lane = jax.lax.broadcasted_iota(jnp.int32, (3, CB, L), 2)

        def cellsum(x):  # (CB*G, PB) -> (CB,): fold each cell's G rows
            # staged reduction (3-D -> 2-D -> 1-D): the fused .sum((1, 2))
            # trips a Mosaic layout assertion (layout.h:320 crash)
            return x.reshape(CB, G, PB).sum(1).sum(-1)

        def body(l, acc):
            mask = (il == l).astype(jnp.float32)
            row = jnp.stack(
                [cellsum(mask), cellsum(c * mask), cellsum(tc * mask)]
            )  # (3, CB)
            return jnp.where(lane == l, row[:, :, None], acc)

        out_ref[:] = jax.lax.fori_loop(
            0, L, body, jnp.zeros((3, CB, L), jnp.float32)
        )

    pix_spec = pl.BlockSpec(
        (CB * G, PB), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, n_cells, L), jnp.float32),
        grid=(n_blocks,),
        in_specs=[pix_spec, pix_spec, pix_spec],
        out_specs=pl.BlockSpec(
            (3, CB, L), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
    )(il_b, c_b, tc_b)
    return out


def _slice_pallas(
    il_b: jnp.ndarray, yl: jnp.ndarray, L: int, groups: int = 1
) -> jnp.ndarray:
    """One-pass slice: out[row, p] = yl[row // G, il_b[row, p]].

    Same one-HBM-pass argument as ``_splat_pallas``; padded slots
    (bin -1) match no l and come back 0. Runs once per solve (after CG),
    and once per bistochastization when that moves pixel-side."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows, PB = il_b.shape
    G = groups
    n_cells = n_rows // G
    CB = _pallas_cells_per_block(G * (-(-PB // 128) * 128))
    n_blocks = -(-n_cells // CB)  # ragged grid, no pad copies -- see splat

    def kernel(il_ref, y_ref, out_ref):
        il = il_ref[:]
        # each cell's lattice row broadcast to its G pixel rows
        y = jnp.broadcast_to(
            y_ref[:].reshape(CB, 1, L), (CB, G, L)
        ).reshape(CB * G, L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (CB * G, L), 1)

        def body(l, acc):
            # bin l's column via a masked row-reduce (no dynamic_slice in
            # Mosaic): exactly one lane matches, so the sum IS the select
            sel = jnp.sum(
                jnp.where(lane == l, y, 0.0), axis=1, keepdims=True
            )
            return jnp.where(il == l, sel, acc)

        out_ref[:] = jax.lax.fori_loop(
            0, L, body, jnp.zeros((CB * G, PB), jnp.float32)
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_rows, PB), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(
                (CB * G, PB), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((CB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CB * G, PB), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(il_b, yl)
    return out


def _splat_fused3d_pallas(
    luma_p: jnp.ndarray,  # (NCZ, ss, NCY, ss, X) float — z/y padded
    t_p: jnp.ndarray,
    c_p: jnp.ndarray,
    sigma_luma: int,
    ss: int,
    sp_ext,
    L: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw pixels → (3, n_cells, L) [count, splat(c), splat(t·c)] in ONE
    kernel: luma binning, the t·c product, the rank-3 reblock transpose,
    and the L-bin histogram all happen on VMEM-resident slabs.

    The split pipeline (il/t·c XLA passes + 3 `_reblock3d_pallas` calls +
    `_splat_pallas`) pays ~7 extra full-crop HBM passes per solve just to
    materialize intermediates this kernel never lets leave the chip. The
    per-(cell, bin) reduction is identical to `_splat_pallas` with
    groups=ss (same staged sums, same lane-iota select), so results agree
    to fp32 summation order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCZ, NCY, NCX = sp_ext
    X = luma_p.shape[-1]
    Xp = NCX * ss
    P = ss * ss
    n_cells = NCZ * NCY * NCX
    sl = float(sigma_luma)

    def kernel(lu_ref, t_ref, c_ref, out_ref):
        lu = lu_ref[:].reshape(P, X)
        cv = c_ref[:].reshape(P, X)
        tc = (t_ref[:] * c_ref[:]).reshape(P, X)
        # same DIVISION as the scan/scatter paths: a reciprocal multiply
        # can flip knife-edge pixels into the neighboring bin
        il = (lu / sl).astype(jnp.int32)
        if Xp != X:  # lane-pad: bin −1 matches no l, values 0 add nothing
            il = jnp.pad(il, ((0, 0), (0, Xp - X)), constant_values=-1)
            cv = jnp.pad(cv, ((0, 0), (0, Xp - X)))
            tc = jnp.pad(tc, ((0, 0), (0, Xp - X)))
        ilT, cvT, tcT = il.T, cv.T, tc.T  # (Xp, P): rows = cx*ss + dx
        lane = jax.lax.broadcasted_iota(jnp.int32, (3, NCX, L), 2)

        def cellsum(x):  # (Xp, P) → (NCX,): staged (see _splat_pallas)
            return x.reshape(NCX, ss, P).sum(1).sum(-1)

        def body(l, acc):
            mask = (ilT == l).astype(jnp.float32)
            row = jnp.stack(
                [cellsum(mask), cellsum(cvT * mask), cellsum(tcT * mask)]
            )  # (3, NCX)
            return jnp.where(lane == l, row[:, :, None], acc)

        out_ref[:] = jax.lax.fori_loop(
            0, L, body, jnp.zeros((3, NCX, L), jnp.float32)
        ).reshape(3, 1, NCX, L)

    slab = pl.BlockSpec(
        (1, ss, 1, ss, X), lambda cz, cy: (cz, 0, cy, 0, 0),
        memory_space=pltpu.VMEM,
    )
    # the cell axis rides as (NCZ·NCY, NCX) so the block's LAST TWO dims
    # (NCX, L) equal the array dims — Mosaic requires sublane blocks be
    # 8-aligned or full, and NCX is arbitrary (20 at a 128³ organ crop)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, NCZ * NCY, NCX, L), jnp.float32),
        grid=(NCZ, NCY),
        in_specs=[slab, slab, slab],
        out_specs=pl.BlockSpec(
            (3, 1, NCX, L), lambda cz, cy: (0, cz * NCY + cy, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(luma_p, t_p, c_p)
    return out.reshape(3, n_cells, L)


def _slice_fused3d_pallas(
    luma_p: jnp.ndarray,  # (NCZ, ss, NCY, ss, X) float — z/y padded
    yl: jnp.ndarray,  # (n_cells, L)
    sigma_luma: int,
    ss: int,
    sp_ext,
    L: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Lattice → raw-layout pixels in ONE kernel: luma binning, the
    per-bin select, and the inverse reblock transpose stay in VMEM;
    returns the padded (NCZ, ss, NCY, ss, X) pixel volume (caller slices
    off the z/y pad). Replaces `_slice_pallas` + `_unreblock3d_pallas`
    plus the blocked-il input those needed."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCZ, NCY, NCX = sp_ext
    X = luma_p.shape[-1]
    Xp = NCX * ss
    P = ss * ss
    sl = float(sigma_luma)

    def kernel(lu_ref, y_ref, out_ref):
        il = (lu_ref[:].reshape(P, X) / sl).astype(jnp.int32)
        if Xp != X:
            il = jnp.pad(il, ((0, 0), (0, Xp - X)), constant_values=-1)
        ilT = il.T  # (Xp, P)
        # each cell's lattice row broadcast to its ss pixel rows
        y = jnp.broadcast_to(
            y_ref[:].reshape(NCX, 1, L), (NCX, ss, L)
        ).reshape(Xp, L)  # y_ref block is (1, NCX, L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (Xp, L), 1)

        def body(l, acc):
            sel = jnp.sum(jnp.where(lane == l, y, 0.0), axis=1, keepdims=True)
            return jnp.where(ilT == l, sel, acc)

        outT = jax.lax.fori_loop(
            0, L, body, jnp.zeros((Xp, P), jnp.float32)
        )
        out_ref[:] = outT.T[:, :X].reshape(1, ss, 1, ss, X)

    # yl rides as (NCZ·NCY, NCX, L) for the same sublane-alignment
    # reason as the splat's output: NCX is arbitrary, so it must not be
    # the block's second-to-last dim with a partial block
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(luma_p.shape, jnp.float32),
        grid=(NCZ, NCY),
        in_specs=[
            pl.BlockSpec(
                (1, ss, 1, ss, X), lambda cz, cy: (cz, 0, cy, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, NCX, L), lambda cz, cy: (cz * NCY + cy, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ss, 1, ss, X), lambda cz, cy: (cz, 0, cy, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(luma_p, yl.reshape(NCZ * NCY, NCX, L))


def _pad5d_fill(x: jnp.ndarray, ss: int, sp_ext, fill) -> jnp.ndarray:
    """(Z, Y, X) → (NCZ, ss, NCY, ss, X): z/y padded to cell multiples
    (no-op copies elided by XLA when divisible) in the 5-D slab view the
    fused kernels block on. The fill matters for splat counts: luma pads
    with −2·sigma_luma so its in-kernel bin is negative (int32 cast
    truncates toward zero, so any fill in (−sigma_luma, 0) would land in
    bin 0!), value planes pad with 0."""
    Z, Y, X = x.shape
    NCZ, NCY, _ = sp_ext
    return jnp.pad(
        x, ((0, NCZ * ss - Z), (0, NCY * ss - Y), (0, 0)),
        constant_values=fill,
    ).reshape(NCZ, ss, NCY, ss, X)


def _blur_pallas4d(
    y: jnp.ndarray, blur_dim: int, interpret: bool = False
) -> jnp.ndarray:
    """One-HBM-pass dense lattice blur for rank-4 (Z, Y, X, L) grids.

    The XLA ``_blur`` lowering pays 8 pad+add passes over the lattice
    (each materializing on the ~2.7× lane/sublane-padded (X, L) layout)
    per call — and the solve calls it ~35 times (10 bistochastization +
    ≤25 CG A-applies), which is what keeps whole-grid 512³ refinement
    seconds-long. Here each z-plane is read once (plus its two neighbor
    planes as halos via clamped block index maps); all six in-plane ±1
    shifts happen on the VMEM-resident tile with zero-pad boundaries —
    bit-identical semantics to ``_blur``'s pads. Z edges are masked by
    program id (the clamped halo read is discarded)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Z, Y, X, L = y.shape

    def kernel(vm_ref, v0_ref, vp_ref, o_ref):
        v0 = v0_ref[0]  # (Y, X, L)
        out = 2.0 * blur_dim * v0
        out = out + jnp.pad(v0[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
        out = out + jnp.pad(v0[:, :, : L - 1], ((0, 0), (0, 0), (1, 0)))
        out = out + jnp.pad(v0[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
        out = out + jnp.pad(v0[:, : X - 1, :], ((0, 0), (1, 0), (0, 0)))
        out = out + jnp.pad(v0[1:], ((0, 1), (0, 0), (0, 0)))
        out = out + jnp.pad(v0[: Y - 1], ((1, 0), (0, 0), (0, 0)))
        z = pl.program_id(0)
        out = out + jnp.where(z > 0, vm_ref[0], 0.0)
        out = out + jnp.where(z < Z - 1, vp_ref[0], 0.0)
        o_ref[:] = out[None]

    plane = lambda im: pl.BlockSpec(  # noqa: E731
        (1, Y, X, L), im, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(y.shape, jnp.float32),
        grid=(Z,),
        in_specs=[
            plane(lambda z: (jnp.maximum(z - 1, 0), 0, 0, 0)),
            plane(lambda z: (z, 0, 0, 0)),
            plane(lambda z: (jnp.minimum(z + 1, Z - 1), 0, 0, 0)),
        ],
        out_specs=plane(lambda z: (z, 0, 0, 0)),
        interpret=interpret,
    )(y, y, y)


def _sumpool2(x: jnp.ndarray, ext_c) -> jnp.ndarray:
    """2× sum-pool every axis of a lattice array (zero-pad ragged edges).

    Restriction operator of the coarse-to-fine solve: because pixel→cell
    and luma→bin indices compose exactly under σ-doubling
    (p // ss // 2 == p // (2·ss); (luma // sl) // 2 == luma // (2·sl)),
    the σ-doubled problem's splat values are EXACTLY the 2× sum-pool of
    the fine splat — no second pixel pass. Zero pad = empty vertices."""
    for ax, ec in enumerate(ext_c):
        e = x.shape[ax]
        if e < 2 * ec:
            x = jnp.pad(
                x, [(0, 2 * ec - e) if a == ax else (0, 0)
                    for a in range(x.ndim)],
            )
        x = x.reshape(
            x.shape[:ax] + (ec, 2) + x.shape[ax + 1:]
        ).sum(axis=ax + 1)
    return x


def _prolong2(y: jnp.ndarray, ext_f) -> jnp.ndarray:
    """Nearest (piecewise-constant) 2× prolongation, cropped to the fine
    extents — the exact adjoint map of ``_sumpool2``'s index folding:
    fine vertex (i, …, l) reads coarse vertex (i//2, …, l//2)."""
    for ax in range(y.ndim):
        y = jnp.repeat(y, 2, axis=ax)
    return y[tuple(slice(0, e) for e in ext_f)]


def _lattice_solve(
    m: jnp.ndarray,  # (nverts,) splat(1)
    w_splat: jnp.ndarray,  # (nverts,) splat(c)
    b: jnp.ndarray,  # (nverts,) splat(t·c)
    ext,
    lam: float,
    A_diag_min: float,
    cg_tol: float,
    cg_maxiter: int,
    bistoch_iters: int,
    blur_dim: int,
    y0: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Lattice-side bilateral solve: bistochastization + Jacobi-PCG on
    A(y) = λ(Dm − Dn·blur·Dn)y + diag(splat(c))·y (reference
    bilateral_solver3d.py:107-154). Shared by the direct solve and both
    levels of the coarse-to-fine path; ``y0`` overrides the b/w_splat
    warm start (the coarse-to-fine prolongation)."""

    def blur_flat(y):
        return _blur(y.reshape(ext), blur_dim).reshape(-1)

    occupied = m > 0
    n = occupied.astype(jnp.float32)

    def bi_body(_, n):
        bn = blur_flat(n)
        return jnp.where(
            occupied, jnp.sqrt(n * m / jnp.where(bn > 0, bn, 1.0)), 0.0
        )

    n = jax.lax.fori_loop(0, bistoch_iters, bi_body, n)
    m_b = n * blur_flat(n)

    if y0 is None:
        y0 = jnp.where(
            w_splat > 0, b / jnp.where(w_splat > 0, w_splat, 1.0), 0.0
        )

    def A(y):
        smooth = m_b * y - n * blur_flat(n * y)
        out = lam * smooth + w_splat * y
        return jnp.where(occupied, out, y)  # identity on empty vertices

    a_diag = lam * (m_b - 2.0 * blur_dim * n * n) + w_splat
    a_diag = jnp.where(occupied, jnp.maximum(a_diag, A_diag_min), 1.0)

    def precond(y):
        return y / a_diag

    yhat, _ = jax.scipy.sparse.linalg.cg(
        A, b, x0=y0, tol=cg_tol, maxiter=cg_maxiter, M=precond
    )
    return yhat


def _blur(y: jnp.ndarray, blur_dim: int = _BLUR_DIM) -> jnp.ndarray:
    """Dense bilateral-grid blur: 2·dim·y + Σ_axes (shift+1 + shift−1)."""
    out = 2.0 * blur_dim * y
    for ax in range(y.ndim):
        out = out + jnp.pad(
            jax.lax.slice_in_dim(y, 1, y.shape[ax], axis=ax),
            [(0, 1) if a == ax else (0, 0) for a in range(y.ndim)],
        )
        out = out + jnp.pad(
            jax.lax.slice_in_dim(y, 0, y.shape[ax] - 1, axis=ax),
            [(1, 0) if a == ax else (0, 0) for a in range(y.ndim)],
        )
    return out


@functools.partial(
    jax.jit,
    static_argnames=("sigma_spatial", "sigma_luma", "lam", "A_diag_min",
                     "cg_tol", "cg_maxiter", "bistoch_iters", "blur_dim",
                     "pixel_impl", "coarse_to_fine", "fine_maxiter"),
)
def bilateral_solve_gray(
    target: jnp.ndarray,  # (*spatial) float — 2D or 3D
    luma: jnp.ndarray,  # (*spatial) float in [0, 255]
    confidence: jnp.ndarray,  # (*spatial) float
    sigma_spatial: int = 24,
    sigma_luma: int = 4,
    lam: float = 256.0,
    A_diag_min: float = 1e-5,
    cg_tol: float = 1e-5,
    cg_maxiter: int = 25,
    bistoch_iters: int = 10,
    blur_dim: int = _BLUR_DIM,
    pixel_impl: str = "auto",
    coarse_to_fine: bool = False,
    fine_maxiter: int = 10,
) -> jnp.ndarray:
    """Solve the bilateral-regularized least squares for one channel.

    ``pixel_impl`` picks the pixel↔lattice transfer lowering:

    - ``'auto'`` (default): ``'pallas'`` on TPU (for the block geometries
      the kernels handle), ``'scan'`` elsewhere.
    - ``'pallas'``: FUSED one-kernel splat/slice — luma binning, the t·c
      product, the rank-3 reblock transpose, and the L-bin histogram/
      select all run on VMEM-resident slabs, so the only full-crop HBM
      traffic is reading the three raw planes (plus the z/y cell pad
      when the crop is ragged). 3D only.
    - ``'pallas_reblock'``: the split form — `_reblock3d_pallas` blocked
      views feeding `_splat_pallas`/`_slice_pallas` (one HBM pass per
      stage; ~7 more full-crop passes than the fused kernel for its
      intermediates). Used automatically for non-rank-3 pallas calls;
      kept as an on-chip witness for the fused kernels.
    - ``'pallas_interpret'``: the fused kernels in Pallas interpret mode
      (CPU) — the suite's Mosaic-path numerics witness.
    - ``'scan'``: the lattice is REGULAR, so splat is a blockwise
      value-weighted luma histogram and slice a blockwise luma-bin
      select — both lowered as a ``lax.scan`` over the L luma bins with
      (3, cells, ss**r)-blocked elementwise work. No scatter, no gather,
      no giant one-hot temp; measured 9.1 → 1.8 ms per splat and 7.8 →
      1.5 ms per slice on a 96³ crop (v5e). CPU/parity default.
    - ``'scatter'``: the direct scatter-add/gather form (the reference's
      sparse formulation transcribed to the dense lattice). Kept as the
      independent parity witness — tests assert the impls agree.

    All are algebraically identical to the reference's hashed-sparse
    solver restricted to occupied vertices (bilateral_solver3d.py:37-154);
    fp32 summation order differs between impls.
    """
    shape = target.shape
    ext = _grid_extents(shape, sigma_spatial, sigma_luma)
    nverts = int(np.prod(ext))
    sp_ext, L = ext[:-1], ext[-1]
    ss = sigma_spatial
    n_cells = int(np.prod(sp_ext))

    t = target.reshape(-1).astype(jnp.float32)
    c = confidence.reshape(-1).astype(jnp.float32)

    if pixel_impl == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        pixel_impl = (
            "pallas"
            if on_tpu and ss ** len(shape) <= 2048 and L <= 512
            else "scan"
        )

    if pixel_impl in ("pallas", "pallas_interpret") and len(shape) == 3:
        # fused single-kernel lowering: binning, t·c, reblock transpose,
        # histogram/select all on VMEM-resident slabs — the split path
        # below pays ~7 extra full-crop HBM passes for its intermediates
        interp = pixel_impl == "pallas_interpret"
        lu_p = _pad5d_fill(
            luma.astype(jnp.float32), ss, sp_ext, -2.0 * sigma_luma
        )
        m, w_splat, b = _splat_fused3d_pallas(
            lu_p,
            _pad5d_fill(target.astype(jnp.float32), ss, sp_ext, 0),
            _pad5d_fill(confidence.astype(jnp.float32), ss, sp_ext, 0),
            sigma_luma, ss, sp_ext, L, interpret=interp,
        ).reshape(3, nverts)

        def slice_(y_vert):
            out = _slice_fused3d_pallas(
                lu_p, y_vert.reshape(n_cells, L), sigma_luma, ss, sp_ext,
                L, interpret=interp,
            )
            NCZ, NCY, NCX = sp_ext
            out = out.reshape(NCZ * ss, NCY * ss, shape[2])
            return out[: shape[0], : shape[1]].reshape(-1)

    elif pixel_impl == "pallas_reblock" or (
        pixel_impl == "pallas" and len(shape) != 3
    ):
        rank3 = len(shape) == 3
        # rank 3 blocks/unblocks in Pallas (the XLA lowering's 6-D
        # intermediate costs an 18× padded-layout temp — 11.2 GB at a
        # 512³ crop); other ranks are small and keep the XLA view
        G = ss if rank3 else 1
        reblock = (
            (lambda x, fill=0: _reblock3d_pallas(x, ss, sp_ext, fill=fill))
            if rank3
            else (lambda x, fill=0: _blocked_pixel_view(x, ss, sp_ext, fill=fill))
        )
        il_b = reblock(
            (luma.astype(jnp.float32) / sigma_luma).astype(jnp.int32),
            fill=-1,
        )
        m, w_splat, b = _splat_pallas(
            il_b,
            reblock(c.reshape(shape)),
            reblock((t * c).reshape(shape)),
            L, groups=G,
        ).reshape(3, nverts)

        def slice_(y_vert):
            out = _slice_pallas(il_b, y_vert.reshape(n_cells, L), L, groups=G)
            if rank3:
                return _unreblock3d_pallas(out, ss, sp_ext, shape).reshape(-1)
            return _unblock_pixel_view(out, ss, sp_ext, shape).reshape(-1)

    elif pixel_impl == "scan":
        # luma bin per pixel, blocked by spatial cell; padded block slots
        # get bin −1 so they match no l ∈ [0, L) and contribute nothing
        il_b = _blocked_pixel_view(
            (luma.astype(jnp.float32) / sigma_luma).astype(jnp.int32),
            ss, sp_ext, fill=-1,
        )
        # materialize the blocked view ONCE: without the barrier XLA
        # fuses the pad+transpose into the bin scans' bodies and re-runs
        # it every iteration (traced: 2×~2.2 ms × L bins — 10× the rest
        # of the solve at a 128³ crop)
        il_b = jax.lax.optimization_barrier(il_b)

        def splat3(t, c):
            """splat(1), splat(c), splat(t·c) in one bin scan → (3, nverts).

            splat(1) is just the per-(cell, bin) pixel count — the mask's
            own popcount — so only the two value planes are materialized
            and scanned."""
            vals = jnp.stack([
                _blocked_pixel_view(c.reshape(shape), ss, sp_ext),
                _blocked_pixel_view((t * c).reshape(shape), ss, sp_ext),
            ])  # (2, cells, ss**r)
            vals = jax.lax.optimization_barrier(vals)  # see il_b above

            def bin_body(_, l):
                # multiply+reduce, NOT einsum/dot_general: a dot inside
                # the scan makes XLA re-copy the loop-invariant blocked
                # operands into the dot's layout EVERY iteration (traced:
                # 2×~2.2 ms × L copies, 10× the whole solve). The
                # elementwise form fuses with the mask compute.
                mask = (il_b == l).astype(jnp.float32)
                return _, jnp.concatenate(
                    [mask.sum(-1)[None], (vals * mask[None]).sum(-1)]
                )

            _, per_bin = jax.lax.scan(bin_body, None, jnp.arange(L))
            # (L, 3, cells) → (3, cells, L) → flat vertex order
            # (spatial-major, luma last — the _vertex_ids layout)
            return per_bin.transpose(1, 2, 0).reshape(3, nverts)

        def slice_(y_vert):
            yl = y_vert.reshape(n_cells, L)

            def bin_body(acc, l):
                sel = jax.lax.dynamic_slice_in_dim(yl, l, 1, axis=1)
                return jnp.where(il_b == l, sel, acc), None

            out, _ = jax.lax.scan(
                bin_body, jnp.zeros_like(il_b, jnp.float32), jnp.arange(L)
            )
            return _unblock_pixel_view(out, ss, sp_ext, shape).reshape(-1)

        m, w_splat, b = splat3(t, c)
    else:
        vid, _ = _vertex_ids(shape, luma, sigma_spatial, sigma_luma)
        vid_flat = vid.reshape(-1)

        def splat(x_pix):
            return jnp.zeros((nverts,), jnp.float32).at[vid_flat].add(x_pix)

        def slice_(y_vert):
            return y_vert[vid_flat]

        m = splat(jnp.ones_like(t))
        w_splat = splat(c)
        b = splat(t * c)

    solve_kw = dict(
        lam=lam, A_diag_min=A_diag_min, cg_tol=cg_tol,
        bistoch_iters=bistoch_iters, blur_dim=blur_dim,
    )
    if coarse_to_fine and all(e >= 2 for e in ext):
        # 2-level solve: the σ-doubled coarse problem (1/2**rank+1 the
        # vertices) is built by sum-pooling the fine splat (exact — the
        # index maps compose, see _sumpool2), solved to cg_maxiter, and
        # its solution prolongated into the fine CG's x0. The fine
        # problem (splat, bistochastization, operator) is IDENTICAL to
        # the direct solve's; only the CG start and iteration count
        # differ, so deviation vs coarse_to_fine=False is pure CG
        # convergence (bounded in tests/test_bilateral.py).
        ext_c = _grid_extents(shape, 2 * sigma_spatial, 2 * sigma_luma)
        mc, wc, bc = (
            _sumpool2(v.reshape(ext), ext_c).reshape(-1)
            for v in (m, w_splat, b)
        )
        yc = _lattice_solve(
            mc, wc, bc, ext_c, cg_maxiter=cg_maxiter, **solve_kw
        )
        y0 = _prolong2(yc.reshape(ext_c), ext).reshape(-1)
        # the coarse solution is only meaningful on occupied fine
        # vertices; empty ones are identity rows — keep them at 0
        y0 = jnp.where(m > 0, y0, 0.0)
        yhat = _lattice_solve(
            m, w_splat, b, ext, cg_maxiter=fine_maxiter, y0=y0, **solve_kw
        )
    else:
        yhat = _lattice_solve(
            m, w_splat, b, ext, cg_maxiter=cg_maxiter, **solve_kw
        )
    out = slice_(yhat).reshape(shape)
    return jnp.nan_to_num(out)


def bilateral_filter_gray(
    x: jnp.ndarray,
    luma: jnp.ndarray,
    sigma_spatial: int,
    sigma_luma: int,
    blur_dim: int = _BLUR_DIM,
) -> jnp.ndarray:
    """Plain bilateral filter slice(blur(splat(x)))/slice(blur(splat(1)))
    (reference BilateralGrid.filter, :101-104). Used as the parity oracle
    for the grid operators (no CG iteration noise)."""
    shape = x.shape
    vid, ext = _vertex_ids(shape, luma, sigma_spatial, sigma_luma)
    vid_flat = vid.reshape(-1)
    nverts = int(np.prod(ext))

    def filt(v):
        grid = jnp.zeros((nverts,), jnp.float32).at[vid_flat].add(v)
        return _blur(grid.reshape(ext), blur_dim).reshape(-1)[vid_flat]

    xf = x.reshape(-1).astype(jnp.float32)
    return (filt(xf) / filt(jnp.ones_like(xf))).reshape(shape)


def apply_bilateral_solver2d(
    t: jnp.ndarray,
    r: jnp.ndarray,
    c: jnp.ndarray | None = None,
    grid_params: dict | None = None,
    bs_params: dict | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """2D bilateral solver + island post-filter (reference bilateral_solver.py).

    Args:
        t: target (1, W, H) or (W, H) float in [0, 1]
        r: grayscale reference (1, W, H) or (W, H), value range [0, 255]
        c: optional confidence; defaults to constant 0.999 (reference :189)

    Returns:
        (binary, solved): the fill-holes + largest-foreground-island binary
        mask (reference keeps the 2nd-largest label — background label 0
        being the largest) and the raw solved float map.
    """
    from vittf_tpu.ops.connected import largest_component_2d
    from vittf_tpu.ops.morphology import binary_fill_holes

    gp = {**GRID_PARAMS_DEFAULT, **(grid_params or {})}
    bs = {**BS_PARAMS_DEFAULT, **(bs_params or {})}
    t = jnp.asarray(t).reshape(t.shape[-2:]).astype(jnp.float32)
    r = jnp.asarray(r).reshape(t.shape)
    if c is None:
        c = jnp.full(t.shape, 0.999, jnp.float32)
    else:
        c = jnp.asarray(c).reshape(t.shape).astype(jnp.float32)
    out = bilateral_solve_gray(
        t, r.astype(jnp.float32), c,
        sigma_spatial=int(gp["sigma_spatial"]),
        sigma_luma=int(gp["sigma_luma"]),
        lam=float(bs["lam"]),
        A_diag_min=float(bs["A_diag_min"]),
        cg_tol=float(bs["cg_tol"]),
        cg_maxiter=int(bs["cg_maxiter"]),
        blur_dim=_BLUR_DIM_2D,
    )
    filled = binary_fill_holes(out > 0.5)
    binary = largest_component_2d(filled)
    # reference fallback: all-ones mask when no foreground island exists
    binary = jnp.where(jnp.any(filled), binary, jnp.ones_like(binary))
    return binary.astype(jnp.float32), out


def apply_bilateral_solver3d(
    t: jnp.ndarray,
    r: jnp.ndarray,
    c: jnp.ndarray | None = None,
    grid_params: dict | None = None,
    bs_params: dict | None = None,
) -> jnp.ndarray:
    """Reference-signature entry point (bilateral_solver3d.py:211-245).

    Args:
        t: target (1, W, H, D) or (W, H, D) float in [0, 1]
        r: reference image (3, W, H, D) uint8 [0, 255] (grayscale content —
           all channels equal; the dense grid uses its luma)
        c: optional confidence (1, W, H, D); defaults to the inverted Sobel
           magnitude of r[0]/255 (reference :229-238)

    Returns:
        (W, H, D) float32 solved target.
    """
    gp = {**GRID_PARAMS_DEFAULT, **(grid_params or {})}
    bs = {**BS_PARAMS_DEFAULT, **(bs_params or {})}
    t = jnp.asarray(t).reshape(t.shape[-3:]).astype(jnp.float32)
    r = jnp.asarray(r)
    if c is None:
        sob = filter_sobel_separated(make_5d(r[0].astype(jnp.float32) / 255.0))
        sob = sob.reshape(t.shape)
        c = sob.max() - sob
    else:
        c = jnp.asarray(c).reshape(t.shape).astype(jnp.float32)
    # luma of a grayscale RGB via the reference's RGB→YUV: Y = I exactly
    luma = r[0].astype(jnp.float32)
    return bilateral_solve_gray(
        t, luma, c,
        sigma_spatial=int(gp["sigma_spatial"]),
        sigma_luma=int(gp["sigma_luma"]),
        lam=float(bs["lam"]),
        A_diag_min=float(bs["A_diag_min"]),
        cg_tol=float(bs["cg_tol"]),
        cg_maxiter=int(bs["cg_maxiter"]),
    )
