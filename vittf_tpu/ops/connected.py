"""3D connected components + largest-island filtering on device.

Replaces the reference's cc_torch CUDA extension
(tests/test_connected_components.py:5,28). Labeling is min-label
propagation with pointer jumping inside a bounded ``lax.while_loop`` —
each iteration alternates a 6-neighbor min-propagation step with a
pointer-jump (``label[label]``), giving O(log d) convergence in the island
diameter d. All shapes static; the loop exits early at a fixed point.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def connected_components(mask: jnp.ndarray, max_iter: int = 64) -> jnp.ndarray:
    """Label face-connected components of a 2D/3D boolean mask
    (6-connectivity in 3D, 4-connectivity in 2D — scipy.ndimage.label's
    default cross structure).

    Returns int32 labels: 0 where mask is false, otherwise a component id
    (1 + flat index of the component's minimal voxel). Matching component
    *partition* (not numbering) with scipy.ndimage.label.
    """
    mask = jnp.asarray(mask).astype(bool)
    shape = mask.shape
    nd = mask.ndim
    n = int(np.prod(shape))
    flat_ids = jnp.arange(1, n + 1, dtype=jnp.int32).reshape(shape)
    big = jnp.int32(n + 2)
    labels0 = jnp.where(mask, flat_ids, big)

    def neighbor_min(lab):
        m = lab
        for ax in range(nd):
            fwd = jnp.roll(lab, 1, axis=ax).at[
                tuple(slice(None) if a != ax else 0 for a in range(nd))
            ].set(big)
            bwd = jnp.roll(lab, -1, axis=ax).at[
                tuple(slice(None) if a != ax else -1 for a in range(nd))
            ].set(big)
            m = jnp.minimum(m, jnp.minimum(fwd, bwd))
        return jnp.where(mask, m, big)

    def pointer_jump(lab):
        # labels hold 1+flat-index of some voxel in the same component;
        # replace with that voxel's own current label (path halving)
        flat = lab.reshape(-1)
        src = jnp.clip(flat - 1, 0, n - 1)
        jumped = jnp.where(flat <= n, flat.take(src), flat)
        return jnp.where(mask, jumped.reshape(shape), big)

    def cond(state):
        lab, changed, it = state
        return changed & (it < max_iter)

    def body(state):
        lab, _, it = state
        nxt = pointer_jump(neighbor_min(lab))
        return nxt, jnp.any(nxt != lab), it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels0, jnp.bool_(True), 0)
    )
    return jnp.where(mask, labels, 0).astype(jnp.int32)


def component_sizes(labels: jnp.ndarray) -> jnp.ndarray:
    """Voxel count per label id (flat, length = numel + 2)."""
    n = labels.size
    return jnp.zeros((n + 2,), jnp.int32).at[labels.reshape(-1)].add(
        jnp.where(labels.reshape(-1) > 0, 1, 0)
    )


def largest_component(
    mask: jnp.ndarray, max_iter: int = 64, impl: str = "auto"
) -> jnp.ndarray:
    """Keep only the largest connected component of ``mask``.

    Equivalent of the reference's cc_torch largest-island filter
    (tests/test_connected_components.py:26-53).

    ``impl``:
    - ``'native'``: the C++ two-pass union-find (one D2H of the uint8
      mask). Measured: 0.05 s at 128³ / 5.7 s at 512³ vs 2 s / a TPU
      worker crash for the device loop — host union-find is simply the
      right algorithm for arbitrary-shape components.
    - ``'device'``: min-label propagation + pointer jumping in a bounded
      while_loop. Stays correct to 256³ (~20 s) but its 16.7M-index
      gathers are watchdog-fatal at 512³; meant for small masks and for
      traced (inside-jit) callers that can't leave the device.
    - ``'auto'``: native for concrete 3D masks when the library is
      built; device otherwise (2D masks, tracers, no toolchain).
    """
    if impl == "auto":
        concrete = not isinstance(mask, jax.core.Tracer)
        if concrete and mask.ndim in (2, 3) and _native_available():
            impl = "native"
        else:
            impl = "device"
    if impl == "native":
        from vittf_tpu.native import cc3d_largest

        # bool D2H hangs on the axon relay — fetch as uint8
        host = np.asarray(
            jnp.asarray(mask).astype(jnp.uint8)
            if isinstance(mask, jnp.ndarray)
            else np.asarray(mask, np.uint8)
        )
        if host.ndim == 2:  # 6-conn on a depth-1 volume == 4-conn in 2D
            return jnp.asarray(cc3d_largest(host[None]).astype(np.uint8)[0]) > 0
        return jnp.asarray(cc3d_largest(host).astype(np.uint8)) > 0
    labels = connected_components(mask, max_iter=max_iter)
    sizes = component_sizes(labels)
    sizes = sizes.at[0].set(0)  # background doesn't compete
    best = jnp.argmax(sizes)
    return labels == best


def _native_available() -> bool:
    try:
        from vittf_tpu.native import available

        return available()
    except Exception:
        return False


def largest_component_2d(mask: jnp.ndarray, max_iter: int = 64) -> jnp.ndarray:
    """Largest 4-connected component of a 2D mask (used by the 2D solver's
    island post-filter, reference bilateral_solver.py:199-207). 'auto'
    maps 2D masks onto the native path as depth-1 volumes; the tracer
    check inside keeps jit-embedded callers on the device loop."""
    return largest_component(mask, max_iter=max_iter)


def filter_similarity_largest_island(
    sim_u8: jnp.ndarray, threshold: int = 69, max_iter: int = 64,
    impl: str = "auto",
) -> jnp.ndarray:
    """Threshold a uint8 similarity map, keep the largest island, zero the
    rest (semantics of tests/test_connected_components.py:26-61)."""
    keep = largest_component(sim_u8 > threshold, max_iter=max_iter, impl=impl)
    return jnp.where(keep, sim_u8, 0).astype(jnp.uint8)
