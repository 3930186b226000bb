"""Host-streamed extraction (pipeline/streamed.py) must exactly match the
device-resident path: the chunked accumulator chaining preserves the
batch-ordered fp32 sum, so results agree to allclose tolerance on every
mode (full pool, fast subsample, single-axis, uint8 compact dtype)."""
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_vit import TINY, _make_pair
from vittf_tpu.pipeline.features import ExtractConfig, extract_features
from vittf_tpu.pipeline.streamed import extract_features_streamed


@pytest.fixture(scope="module")
def model_pair():
    return _make_pair(TINY, seed=9)


def _cfg(**kw):
    base = dict(
        feature_output_size=4, slice_along="all", batch_size=2,
        precision="highest", attn_impl="xla",
    )
    base.update(kw)
    return ExtractConfig(**base)


@pytest.mark.parametrize("chunk_batches", [1, 2, 3])
def test_streamed_matches_resident_full(model_pair, rng, chunk_batches):
    _, params = model_pair
    vol = rng.random((12, 16, 20)).astype(np.float32)
    cfg = _cfg()
    want = extract_features(jnp.asarray(vol), params, TINY, cfg)["k"]
    got = extract_features_streamed(
        vol, params, TINY, cfg, chunk_batches=chunk_batches
    )["k"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_streamed_matches_resident_fast(model_pair, rng):
    _, params = model_pair
    vol = rng.random((16, 16, 16)).astype(np.float32)
    cfg = _cfg(slice_subsample=True)
    want = extract_features(jnp.asarray(vol), params, TINY, cfg)["k"]
    got = extract_features_streamed(vol, params, TINY, cfg, chunk_batches=2)["k"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_streamed_single_axis_no_pool(model_pair, rng):
    """Single-axis reference semantics (full slice-axis resolution)."""
    _, params = model_pair
    vol = rng.random((12, 16, 12)).astype(np.float32)
    cfg = _cfg(slice_along="y")
    want = extract_features(jnp.asarray(vol), params, TINY, cfg)["k"]
    got = extract_features_streamed(vol, params, TINY, cfg, chunk_batches=3)["k"]
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_streamed_uint8_compact(model_pair, rng):
    """uint8 volumes stream compact and match the resident compact path."""
    _, params = model_pair
    vol = (rng.random((12, 12, 12)) * 255).astype(np.uint8)
    cfg = _cfg()
    want = extract_features(jnp.asarray(vol), params, TINY, cfg)["k"]
    got = extract_features_streamed(vol, params, TINY, cfg)["k"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )
