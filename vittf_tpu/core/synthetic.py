"""Synthetic SDF volume fixtures (spheres / tori, filled & shell).

TPU-native port of the semantics of reference create_synthetic_volumes.py:
the only cluster-free test fixture in the reference. Volumes are fp16,
labels uint8, on a symmetric [-1, 1] lattice with ``indexing='xy'`` grid
order (create_synthetic_volumes.py:54-55).
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _position_grid(size: int) -> jnp.ndarray:
    ls = jnp.linspace(-1.0, 1.0, size)
    # torch.meshgrid(..., indexing='xy') swaps the first two axes relative
    # to 'ij' (create_synthetic_volumes.py:55).
    gx, gy, gz = jnp.meshgrid(ls, ls, ls, indexing="xy")
    return jnp.stack([gx, gy, gz], axis=-1)


def sdf_sphere(pos: jnp.ndarray, r: float) -> jnp.ndarray:
    """Signed distance to a sphere of radius ``r`` (reference :8-9)."""
    return jnp.linalg.norm(pos, axis=-1) - r


def sphere_thickness(pos, r, t):
    """Shell of thickness ``t`` around the sphere surface (reference :11-12)."""
    return (jnp.abs(sdf_sphere(pos, r)) < t).astype(jnp.float32)


def sphere_filled(pos, r):
    """Filled sphere (reference :14-15)."""
    return (sdf_sphere(pos, r) <= 0).astype(jnp.float32)


def sdf_torus(pos: jnp.ndarray, r1: float, r2: float) -> jnp.ndarray:
    """Signed distance to a torus (major r1, minor r2) (reference :17-19)."""
    q = jnp.linalg.norm(pos[..., :2], axis=-1) - r1
    return jnp.linalg.norm(
        jnp.concatenate([q[..., None], pos[..., 2:]], axis=-1), axis=-1
    ) - r2


def torus_thickness(pos, r1, r2, t):
    return (jnp.abs(sdf_torus(pos, r1, r2)) < t).astype(jnp.float32)


def torus_filled(pos, r1, r2):
    return (sdf_torus(pos, r1, r2) <= 0).astype(jnp.float32)


def make_synthetic_volumes(
    size: int = 128, noise: float = 0.0, seed: int = 0
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Build the four reference fixtures: sphere/torus × thick/filled.

    Returns {name: (volume fp16, label uint8)} matching the shapes, dtypes
    and label rule (vol > 0.5) of create_synthetic_volumes.py:39-69.
    """
    pos = _position_grid(size)
    vols = {
        "sphere_thick": sphere_thickness(pos, 0.5, 0.05),
        "sphere_filled": sphere_filled(pos, 0.5),
        "torus_thick": torus_thickness(pos, 0.5, 0.2, 0.05),
        "torus_filled": torus_filled(pos, 0.5, 0.2),
    }
    out = {}
    key = jax.random.PRNGKey(seed)
    for name, vol in vols.items():
        label = (vol > 0.5).astype(jnp.uint8)
        if noise > 0.0:
            key, sub = jax.random.split(key)
            vol = jnp.clip(
                vol + jax.random.uniform(sub, vol.shape) * noise, 0.0, 1.0
            )
        out[name] = (
            np.asarray(vol, dtype=np.float16),
            np.asarray(label, dtype=np.uint8),
        )
    return out


def make_multiclass_volume(
    size: int = 128, noise: float = 0.05, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Multi-class CT-like synthetic volume with ground-truth labels.

    Extends the reference's single-class SDF fixtures
    (create_synthetic_volumes.py) to a labeled multi-organ phantom for
    quality experiments (full-sweep vs fast-mode IoU): three disjoint SDF
    shapes with distinct intensity bands — the property real CT organs
    have that makes the frozen-ViT features separable — over a noisy
    background.

        class 1  filled sphere   intensity ~0.90
        class 2  filled torus    intensity ~0.60
        class 3  sphere shell    intensity ~0.35
        class 0  background      intensity ~noise

    Returns (volume float32 (size³), labels uint8 (size³)).

    Evaluated host-side with separable broadcasting (position axes are
    independent: grid[i,j,k] = (ls[j], ls[i], ls[k]) in the reference's
    'xy' meshgrid convention, create_synthetic_volumes.py:55) — no full
    (size³, 3) position grid (12 GB at 1024³) and no per-voxel sqrt
    (sphere/shell compare squared distances; the torus' one sqrt lives on
    a (size, size) xy-plane and broadcasts over z).
    """
    ls = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    vol = np.zeros((size, size, size), np.float32)
    labels = np.zeros((size, size, size), np.uint8)

    def sq(c, axis):
        d = (ls - np.float32(c)) ** 2
        shape = [1, 1, 1]
        shape[axis] = size
        return d.reshape(shape)

    def sphere_d2(c):
        # x = ls[j] (axis 1), y = ls[i] (axis 0), z = ls[k] (axis 2)
        return sq(c[0], 1) + sq(c[1], 0) + sq(c[2], 2)

    # class 1: filled sphere — d² ≤ r²
    m1 = sphere_d2([-0.45, -0.45, -0.35]) <= np.float32(0.32**2)
    # class 2: filled torus — (|xy|-r1)² + z² ≤ r2²; the xy-norm is a
    # (size, size) plane broadcast over z
    q = np.sqrt(sq(0.40, 1) + sq(0.35, 0)) - np.float32(0.35)  # (size,size,1)
    m2 = q * q + sq(0.15, 2) <= np.float32(0.13**2)
    # class 3: sphere shell — (r-t)² < d² < (r+t)²
    d2 = sphere_d2([0.35, -0.45, -0.30])
    m3 = (d2 > np.float32((0.28 - 0.07) ** 2)) & (d2 < np.float32((0.28 + 0.07) ** 2))

    for i, (mask, intensity) in enumerate(
        [(m1, 0.90), (m2, 0.60), (m3, 0.35)], start=1
    ):
        vol[mask] = intensity
        labels[mask] = i
    if noise > 0.0:
        rng = np.random.default_rng(seed)
        chunk = max(1, min(size, 2**27 // max(size * size, 1)))
        for z0 in range(0, size, chunk):
            z1 = min(z0 + chunk, size)
            np.clip(
                vol[z0:z1]
                + rng.random((z1 - z0, size, size)).astype(np.float32) * noise,
                0.0, 1.0, out=vol[z0:z1],
            )
    return vol, labels


def make_hard_phantom(
    size: int = 128,
    noise: float = 0.05,
    seed: int = 0,
    bias: float = 0.12,
) -> tuple[np.ndarray, np.ndarray]:
    """Anatomy-like HARD phantom: the regime the easy SDF phantom can't emulate.

    The easy ``make_multiclass_volume`` gives disjoint organs with
    well-separated intensity bands — every committed quality delta
    inherits that easiness (VERDICT r4 weak #6). This phantom builds the
    failure modes real CT segmentation has (the reference's 0.981 IoU
    operating regime, plot_performance.py:64, create_synthetic_volumes.py
    is the seed):

    - **nested / touching structures**: liver-like ellipsoid inside a
      soft-tissue body; two kidney-like spheres TOUCHING the liver
      surface; a lesion nested INSIDE the liver
    - **graded contrast**: body/liver/kidney/lesion intensities all live
      within ~0.1 of each other, and body+liver intensities ramp
      spatially, so no global threshold separates any pair
    - **partial-volume boundaries**: intensities blend across ~1.5-voxel
      SDF-bands instead of hard steps
    - **smooth multiplicative bias field**: low-frequency cosine product
      with seed-random phases (MRI shading / CT cupping analog)
    - **low-dose noise**: additive uniform noise like the easy phantom

        class 1  body (soft tissue)  I ≈ 0.40 + 0.04·y
        class 2  liver               I ≈ 0.55 + 0.06·x̂ (ramp over extent)
        class 3  kidneys (touching)  I ≈ 0.50
        class 4  bone (spine rod)    I ≈ 0.95  (the one easy class)
        class 5  lesion (in liver)   I ≈ 0.47
        class 0  air background      I ≈ 0.05

    Returns (volume float32 (size³), labels uint8 (size³)). Evaluated in
    y-slabs so no more than a few (chunk, size, size) fp32 temps exist at
    once (1024³-safe, like ``make_multiclass_volume``).
    """
    ls = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    vol = np.empty((size, size, size), np.float32)
    labels = np.zeros((size, size, size), np.uint8)
    rng = np.random.default_rng(seed)
    ph = rng.uniform(0.0, 2.0 * np.pi, 6).astype(np.float32)
    # partial-volume half-width: ~1.5 voxels of SDF distance
    w = np.float32(1.5 * 2.0 / size)

    chunk = max(1, min(size, 2**26 // max(size * size, 1)))
    for i0 in range(0, size, chunk):
        i1 = min(i0 + chunk, size)
        # 'xy' meshgrid convention (create_synthetic_volumes.py:55):
        # y = ls[i] (axis 0), x = ls[j] (axis 1), z = ls[k] (axis 2)
        y = ls[i0:i1].reshape(-1, 1, 1)
        x = ls.reshape(1, -1, 1)
        z = ls.reshape(1, 1, -1)

        def ellipsoid_sdf(c, r):
            q = np.sqrt(
                ((x - c[0]) / r[0]) ** 2
                + ((y - c[1]) / r[1]) ** 2
                + ((z - c[2]) / r[2]) ** 2
            )
            return (q - 1.0) * np.float32(min(r))

        def sphere_sdf(c, r):
            return (
                np.sqrt(
                    (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2
                )
                - np.float32(r)
            )

        # structures painted back-to-front; later structures overwrite
        structures = [
            # (sdf, intensity, label)
            (ellipsoid_sdf((0.0, 0.0, 0.0), (0.80, 0.68, 0.88)),
             0.40 + 0.04 * y, 1),
            (ellipsoid_sdf((-0.22, -0.08, -0.05), (0.40, 0.30, 0.36)),
             0.55 + 0.06 * (x + 0.22) / 0.40, 2),
            # kidneys touch the liver surface (y- and z-extremes)
            (np.minimum(sphere_sdf((-0.22, 0.35, -0.05), 0.15),
                        sphere_sdf((-0.22, -0.08, 0.44), 0.15)),
             np.float32(0.50), 3),
            # spine rod: radial cylinder SDF capped along y
            (np.maximum(
                np.sqrt((x - 0.42) ** 2 + (z - 0.0) ** 2) - np.float32(0.10),
                np.abs(y) - np.float32(0.70),
            ), np.float32(0.95), 4),
            # lesion nested inside the liver, ~0.07 below liver intensity
            (sphere_sdf((-0.30, -0.12, -0.10), 0.09), np.float32(0.47), 5),
        ]
        slab = np.full((i1 - i0, size, size), 0.05, np.float32)
        lab_slab = np.zeros((i1 - i0, size, size), np.uint8)
        for sdf, intensity, lab in structures:
            alpha = np.clip(0.5 - sdf / (2.0 * w), 0.0, 1.0)
            slab = slab * (1.0 - alpha) + intensity * alpha
            lab_slab[sdf < 0] = lab
        if bias > 0.0:
            b = (
                1.0
                + bias * np.cos(1.3 * x + ph[0]) * np.cos(1.1 * y + ph[1])
                * np.cos(0.9 * z + ph[2])
                + 0.5 * bias * np.cos(2.1 * x + ph[3]) * np.cos(1.7 * z + ph[4])
            )
            slab = slab * b.astype(np.float32)
        vol[i0:i1] = slab
        labels[i0:i1] = lab_slab
    if noise > 0.0:
        for i0 in range(0, size, chunk):
            i1 = min(i0 + chunk, size)
            np.clip(
                vol[i0:i1]
                + rng.random((i1 - i0, size, size)).astype(np.float32) * noise,
                0.0, 1.0, out=vol[i0:i1],
            )
    return vol, labels


PHANTOMS = {
    "easy": make_multiclass_volume,
    "hard": make_hard_phantom,
}


def write_synthetic_volumes(
    outdir: str | Path, size: int = 128, noise: float = 0.0, use_pt: bool = False
) -> list[Path]:
    """CLI-equivalent of the reference generator: writes ``{name}.npy`` +
    ``{name}_label.npy`` (or ``.pt``) into ``outdir``."""
    from vittf_tpu.core.io import save_array

    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    suffix = ".pt" if use_pt else ".npy"
    written = []
    for name, (vol, label) in make_synthetic_volumes(size, noise).items():
        written.append(save_array(outdir / f"{name}{suffix}", vol))
        written.append(save_array(outdir / f"{name}_label{suffix}", label))
    return written
