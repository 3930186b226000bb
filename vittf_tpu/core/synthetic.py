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
