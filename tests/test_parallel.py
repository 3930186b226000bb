"""Multi-device tests on the virtual 8-CPU mesh: sharded extraction and
similarity must match the single-device paths exactly; TP shardings must
compile and execute."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_vit import TINY, _make_pair
from vittf_tpu.ops.similarity import class_mean_matrix, similarity_xla
from vittf_tpu.parallel.extract import extract_features_sharded, similarity_sharded
from vittf_tpu.parallel.mesh import make_mesh, shard_params
from vittf_tpu.pipeline.features import ExtractConfig, extract_features


@pytest.fixture(scope="module")
def model_pair():
    return _make_pair(TINY, seed=3)


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"dcn": 1, "data": 4, "model": 2}
    mesh = make_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    with pytest.raises(ValueError):
        make_mesh(data=16, model=2)


def test_sharded_extraction_matches_single_device(model_pair, rng):
    _, params = model_pair
    vol = rng.random((12, 16, 20)).astype(np.float32)
    cfg = ExtractConfig(
        feature_output_size=4, slice_along="all", batch_size=2,
        precision="highest", attn_impl="xla",
    )
    want = extract_features(jnp.asarray(vol), params, TINY, cfg)["k"]
    mesh = make_mesh(data=4)
    got = extract_features_sharded(jnp.asarray(vol), params, TINY, cfg, mesh)["k"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sharded_similarity_matches_single_device(rng):
    N, F_dim = 777, 16  # deliberately not divisible by 8
    counts = [5, 9]
    feats = (rng.standard_normal((N, F_dim)) * 0.3).astype(np.float32)
    qf = (rng.standard_normal((sum(counts), F_dim)) * 0.3).astype(np.float32)
    m = jnp.asarray(class_mean_matrix(counts, sum(counts)))
    want = np.asarray(similarity_xla(jnp.asarray(feats), jnp.asarray(qf), m))
    mesh = make_mesh(data=8)
    got = np.asarray(
        similarity_sharded(jnp.asarray(feats), jnp.asarray(qf), m, mesh, impl="xla")
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_fused_all_axes_matches_single_device(model_pair, rng):
    """Cubic 'all' sweeps take the fused single-dispatch 3-axis scan in the
    sharded path too (round-3: parity with pipeline._extract_all_axes_fused);
    must match the single-device result."""
    from vittf_tpu.parallel import extract as px

    _, params = model_pair
    vol = rng.random((16, 16, 16)).astype(np.float32)
    cfg = ExtractConfig(
        feature_output_size=4, slice_along="all", batch_size=2,
        precision="highest", attn_impl="xla",
    )
    assert px._fused_all_applicable(jnp.asarray(vol), cfg)
    want = extract_features(jnp.asarray(vol), params, TINY, cfg)["k"]
    got = extract_features_sharded(
        jnp.asarray(vol), params, TINY, cfg, make_mesh(data=4)
    )["k"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_sharded_fused_fast_mode_matches_single_device(model_pair, rng):
    """Fast mode (slice_subsample) through the fused sharded sweep, with a
    batch count NOT divisible by the mesh (exercises zero-weight padding)."""
    _, params = model_pair
    vol = rng.random((12, 12, 12)).astype(np.float32)
    cfg = ExtractConfig(
        feature_output_size=4, slice_along="all", batch_size=2,
        precision="highest", attn_impl="xla", slice_subsample=True,
    )
    want = extract_features(jnp.asarray(vol), params, TINY, cfg)["k"]
    got = extract_features_sharded(
        jnp.asarray(vol), params, TINY, cfg, make_mesh(data=8)
    )["k"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_sharded_extraction_with_slice_subsample(model_pair, rng):
    """The fast mode must also be exact under DP sharding."""
    _, params = model_pair
    vol = rng.random((16, 16, 16)).astype(np.float32)
    cfg = ExtractConfig(
        feature_output_size=4, slice_along="z", batch_size=2,
        precision="highest", attn_impl="xla", slice_subsample=True,
        pool_slice_axis=True,  # subsampling applies to the pooled path
    )
    want = extract_features(jnp.asarray(vol), params, TINY, cfg)["k"]
    got = extract_features_sharded(
        jnp.asarray(vol), params, TINY, cfg, make_mesh(data=2)
    )["k"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_sharded_similarity_mean_first(rng):
    from vittf_tpu.ops.similarity import similarity_xla

    N, F_dim = 512, 8
    counts = [1500]
    feats = (rng.standard_normal((N, F_dim)) * 0.2).astype(np.float32)
    qf = (rng.standard_normal((sum(counts), F_dim)) * 0.1).astype(np.float32)
    m = jnp.asarray(class_mean_matrix(counts, sum(counts)))
    want = np.asarray(
        similarity_xla(jnp.asarray(feats), jnp.asarray(qf), m, mean_first=True)
    )
    got = np.asarray(
        similarity_sharded(
            jnp.asarray(feats), jnp.asarray(qf), m, make_mesh(data=4),
            mean_first=True, impl="xla",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_tensor_parallel_vit_forward(model_pair, rng):
    """GSPMD TP: params sharded over 'model', forward matches replicated."""
    from vittf_tpu.models.vit import vit_forward

    _, params = model_pair
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    want_tokens, want_qkv = vit_forward(
        params, jnp.asarray(x), TINY, precision="highest", attn_impl="xla"
    )
    mesh = make_mesh(data=2, model=4)
    params_tp = shard_params(params, mesh)
    got_tokens, got_qkv = vit_forward(
        params_tp, jnp.asarray(x), TINY, precision="highest", attn_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got_tokens), np.asarray(want_tokens), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_qkv), np.asarray(want_qkv), rtol=1e-4, atol=1e-4
    )
