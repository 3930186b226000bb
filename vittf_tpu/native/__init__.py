"""ctypes bindings for the native runtime library (native/vittf_native.cpp).

The library is compiled on demand with g++ (cached next to the source);
every entry point has a pure-Python/JAX fallback, so the framework works
without a toolchain — the native path is the fast host-side route for
data-dependent work (connected components on big masks, sparse bilateral
grid construction for RGB references).
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "native" / "vittf_native.cpp"
_LIB = _SRC.parent / "libvittf_native.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None
    i8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.cc3d_label.restype = ctypes.c_int32
    lib.cc3d_label.argtypes = [i8p, ctypes.c_int32, ctypes.c_int32,
                               ctypes.c_int32, i32p]
    lib.cc3d_largest.restype = ctypes.c_int64
    lib.cc3d_largest.argtypes = [i8p, ctypes.c_int32, ctypes.c_int32,
                                 ctypes.c_int32, i8p]
    lib.bilateral_grid_build.restype = ctypes.c_int32
    lib.bilateral_grid_build.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int32, i32p, ctypes.c_int32, i32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def cc3d_label(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """(W, H, D) bool/uint8 → (int32 labels 1..n, n). Native or scipy-free
    Python fallback via the device implementation."""
    lib = get_lib()
    mask = np.ascontiguousarray(np.asarray(mask).astype(np.uint8))
    W, H, D = mask.shape
    if lib is not None:
        labels = np.zeros(mask.shape, np.int32)
        n = lib.cc3d_label(
            _as_ptr(mask, ctypes.c_uint8), W, H, D,
            _as_ptr(labels, ctypes.c_int32),
        )
        return labels, int(n)
    # fallback: device label propagation, then compact the ids
    import jax.numpy as jnp

    from vittf_tpu.ops.connected import connected_components

    raw = np.asarray(connected_components(jnp.asarray(mask > 0)))
    uniq = np.unique(raw[raw > 0])
    remap = np.zeros(raw.max() + 1, np.int32)
    remap[uniq] = np.arange(1, len(uniq) + 1, dtype=np.int32)
    return remap[raw], len(uniq)


def cc3d_largest(mask: np.ndarray) -> np.ndarray:
    """Largest 6-connected island of a 3D mask (bool out)."""
    lib = get_lib()
    mask = np.ascontiguousarray(np.asarray(mask).astype(np.uint8))
    if lib is not None:
        out = np.zeros(mask.shape, np.uint8)
        W, H, D = mask.shape
        lib.cc3d_largest(
            _as_ptr(mask, ctypes.c_uint8), W, H, D, _as_ptr(out, ctypes.c_uint8)
        )
        return out.astype(bool)
    import jax.numpy as jnp

    from vittf_tpu.ops.connected import largest_component

    # fetch as uint8: bool device→host transfers hang on some TPU transports
    out = largest_component(jnp.asarray(mask > 0)).astype(jnp.uint8)
    return np.asarray(out).astype(bool)


def bilateral_grid_build(
    coords: np.ndarray, max_vertices: int | None = None
) -> tuple[np.ndarray, np.ndarray, int]:
    """Hash (npix, dim) int coords to unique vertices + blur neighbors.

    Returns (vertex_of_pixel (npix,), neighbors (nverts, dim, 2) with -1
    for absent, nverts). Coordinate values must be in [0, 1024) — the
    native key packs dim≤6 fields of 10 bits each.
    """
    coords = np.ascontiguousarray(np.asarray(coords, np.int32))
    if coords.size and (coords.min() < 0 or coords.max() >= 1024):
        raise ValueError("bilateral_grid_build coords must be in [0, 1024)")
    npix, dim = coords.shape
    if max_vertices is None:
        max_vertices = npix
    lib = get_lib()
    if lib is not None:
        vop = np.zeros(npix, np.int32)
        neighbors = np.full((max_vertices, dim, 2), -1, np.int32)
        n = lib.bilateral_grid_build(
            _as_ptr(coords, ctypes.c_int32), npix, dim,
            _as_ptr(vop, ctypes.c_int32), max_vertices,
            _as_ptr(neighbors, ctypes.c_int32),
        )
        if n < 0:
            raise ValueError("max_vertices too small")
        return vop, neighbors[:n], int(n)
    # numpy fallback
    uniq, inverse = np.unique(coords, axis=0, return_inverse=True)
    lookup = {tuple(c): i for i, c in enumerate(uniq)}
    nverts = len(uniq)
    neighbors = np.full((nverts, dim, 2), -1, np.int32)
    for v, c in enumerate(uniq):
        for d in range(dim):
            for off_i, off in enumerate((-1, 1)):
                nb = list(c)
                nb[d] += off
                neighbors[v, d, off_i] = lookup.get(tuple(nb), -1)
    return inverse.astype(np.int32), neighbors, nverts
