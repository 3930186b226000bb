"""Batched multi-class BLS refinement (pipeline/refine.py round 3).

The interactive BLS path refines all classes in one vmapped dispatch over
a common bucketed crop box; for a single class that box is identical to
the single-class bucketed box, so the outputs must agree. Multi-class
runs are validated for contract (uint8, shape, refined support) and
against per-class solves given the same boxes.
"""
import jax.numpy as jnp
import numpy as np

from vittf_tpu.pipeline.ntf import compute_similarities, quantize_uint8_torch
from vittf_tpu.pipeline.refine import (
    _boxes_device,
    refine_similarities_batched,
    refine_similarity,
)


def _blob_sims(rng, C, shape, supports):
    sims = np.zeros((C,) + shape, np.float32)
    for c, (lo, hi) in enumerate(supports):
        sl = tuple(slice(l, h) for l, h in zip(lo, hi))
        sims[(c,) + sl] = 0.5 + 0.4 * rng.random(
            tuple(h - l for l, h in zip(lo, hi))
        )
    return jnp.asarray(sims)


def test_boxes_device_matches_host_bounding_box(rng):
    from vittf_tpu.ops.crop import bounding_box

    sims = _blob_sims(
        rng, 3, (12, 14, 10),
        [((2, 3, 1), (7, 9, 6)), ((0, 0, 0), (4, 4, 4)), ((5, 5, 5), (12, 14, 10))],
    )
    boxes, nonempty = _boxes_device(sims, 0.1)
    boxes = np.asarray(boxes)
    assert np.asarray(nonempty).all()
    for c in range(3):
        mi, ma = bounding_box(sims[c] > 0.1, pad=0)
        np.testing.assert_array_equal(boxes[c, 0], mi)
        np.testing.assert_array_equal(boxes[c, 1], ma)


def test_boxes_device_empty_class_full_volume(rng):
    sims = jnp.zeros((2, 8, 8, 8))
    boxes, nonempty = _boxes_device(sims, 0.1)
    boxes = np.asarray(boxes)
    np.testing.assert_array_equal(boxes[:, 0], 0)
    np.testing.assert_array_equal(boxes[:, 1], 8)
    assert not np.asarray(nonempty).any()


def test_batched_empty_class_does_not_couple_others(rng):
    """An empty class (mid-annotation GUI state) must not inflate the
    shared crop box: the non-empty class's refined map must match what it
    gets refined alone (code-review r3 finding #1)."""
    shape = (16, 16, 16)
    vol = rng.random((32, 32, 32)).astype(np.float32)
    blob = _blob_sims(rng, 1, shape, [((3, 4, 2), (11, 12, 9))])
    both = jnp.concatenate([blob, jnp.zeros((1,) + shape, jnp.float32)])

    solo = np.asarray(
        refine_similarities_batched(blob, jnp.asarray(vol), shape, shape_bucket=4)
    )[0]
    mixed = refine_similarities_batched(
        both, jnp.asarray(vol), shape, shape_bucket=4
    )
    got = np.asarray(mixed)[0]
    np.testing.assert_array_equal(got, solo)
    # the empty class comes back all-zero, not NaN-contaminated
    assert np.asarray(mixed)[1].max() == 0


def test_batched_all_empty_returns_zero_maps(rng):
    shape = (12, 12, 12)
    vol = rng.random((24, 24, 24)).astype(np.float32)
    out = refine_similarities_batched(
        jnp.zeros((3,) + shape, jnp.float32), jnp.asarray(vol), shape,
        shape_bucket=4,
    )
    assert out.shape == (3,) + shape and out.dtype == jnp.uint8
    assert np.asarray(out).max() == 0


def test_batched_matches_single_class_bucketed(rng):
    """C=1: the common box degenerates to the single-class bucketed box, so
    batched refinement must equal the per-class path (to uint8 rounding)."""
    shape = (16, 16, 16)
    vol = rng.random((32, 32, 32)).astype(np.float32)
    sims = _blob_sims(rng, 1, shape, [((3, 4, 2), (11, 12, 9))])

    want_f = refine_similarity(sims[0], jnp.asarray(vol), shape, shape_bucket=4)
    want = np.asarray(quantize_uint8_torch(255.0 / (0.99 * want_f.max()) * want_f))
    got = np.asarray(
        refine_similarities_batched(sims, jnp.asarray(vol), shape, shape_bucket=4)
    )[0]
    # identical boxes + solves; uint8 rounding can differ by 1 at quantize
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_batched_multiclass_contract(rng):
    shape = (16, 16, 16)
    vol = rng.random((32, 32, 32)).astype(np.float32)
    sims = _blob_sims(
        rng, 3, shape,
        [((1, 1, 1), (6, 6, 6)), ((8, 8, 8), (15, 15, 15)), ((4, 4, 4), (12, 12, 12))],
    )
    out = refine_similarities_batched(sims, jnp.asarray(vol), shape, shape_bucket=4)
    assert out.shape == (3,) + shape
    assert out.dtype == jnp.uint8
    # each refined map keeps mass near its class's support
    o = np.asarray(out)
    assert o[0, :7, :7, :7].max() > 0
    assert o[1, 8:, 8:, 8:].max() > 0


def test_compute_similarities_bucketed_uses_batched_path(rng):
    """bilateral_solver=True + bls_shape_bucket routes through the batched
    refinement and still returns the per-class uint8 dict contract."""
    vol = jnp.asarray(rng.random((24, 24, 24)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((6, 12, 12, 12)).astype(np.float32) * 0.2)
    ann = {
        "a": rng.integers(0, 24, (12, 3)),
        "b": rng.integers(0, 24, (8, 3)),
    }
    out = compute_similarities(
        vol, feats, ann, bilateral_solver=True, impl="xla",
        bls_shape_bucket=4,
    )
    assert set(out) == {"a", "b"}
    for v in out.values():
        assert v.shape == (12, 12, 12) and v.dtype == jnp.uint8


def test_speculative_second_frame_matches_classic(rng):
    """Frame 1 (classic) seeds the sticky extent; frame 2 with the same
    boxes runs the speculative single-dispatch path with the SAME crop
    extent, so its output must be bit-identical to the classic result."""
    from vittf_tpu.pipeline import refine

    shape = (16, 16, 16)
    vol = jnp.asarray(rng.random((32, 32, 32)).astype(np.float32))
    sims = _blob_sims(
        rng, 2, shape, [((2, 3, 1), (9, 10, 7)), ((6, 6, 6), (13, 14, 12))]
    )
    want = np.asarray(
        refine_similarities_batched(
            sims, vol, shape, shape_bucket=4, speculative=False
        )
    )
    refine._STICKY_EXT.clear()
    first = np.asarray(
        refine_similarities_batched(
            sims, vol, shape, shape_bucket=4, speculative=True
        )
    )
    np.testing.assert_array_equal(first, want)  # classic seeds sticky
    assert refine._STICKY_EXT  # sticky recorded
    second = np.asarray(
        refine_similarities_batched(
            sims, vol, shape, shape_bucket=4, speculative=True
        )
    )
    np.testing.assert_array_equal(second, want)


def test_speculative_fallback_when_extent_outgrown(rng):
    """A sticky extent smaller than the frame's padded boxes must be
    detected on device and fall back to the exact classic path."""
    from vittf_tpu.pipeline import refine

    shape = (16, 16, 16)
    vol = jnp.asarray(rng.random((32, 32, 32)).astype(np.float32))
    sims = _blob_sims(rng, 2, shape, [((1, 1, 1), (14, 14, 14)),
                                      ((2, 2, 2), (10, 10, 10))])
    want = np.asarray(
        refine_similarities_batched(
            sims, vol, shape, shape_bucket=4, speculative=False
        )
    )
    refine._STICKY_EXT.clear()
    refine._STICKY_EXT[(2, shape, 4)] = (4, 4, 4)  # deliberately too small
    got = np.asarray(
        refine_similarities_batched(
            sims, vol, shape, shape_bucket=4, speculative=True
        )
    )
    np.testing.assert_array_equal(got, want)
    # the failed frame still re-seeds the sticky from its actual boxes
    assert refine._STICKY_EXT[(2, shape, 4)] == (16, 16, 16)


def test_speculative_all_empty_keeps_sticky_and_returns_zeros(rng):
    from vittf_tpu.pipeline import refine

    shape = (12, 12, 12)
    vol = jnp.asarray(rng.random((24, 24, 24)).astype(np.float32))
    refine._STICKY_EXT[(3, shape, 4)] = (8, 8, 8)
    out = refine_similarities_batched(
        jnp.zeros((3,) + shape, jnp.float32), vol, shape, shape_bucket=4,
        speculative=True,
    )
    assert np.asarray(out).max() == 0
    assert refine._STICKY_EXT[(3, shape, 4)] == (8, 8, 8)
