"""Golden-artifact regression tests.

Deterministic tiny-model artifacts (features, similarities, prediction)
generated on CPU at fp32-parity settings and committed under
``tests/golden/``. Any refactor that shifts the pipeline's numerics —
resize index rules, grid-sample semantics, quantization, fusion — trips
these before it ships. Regenerate intentionally with:

    python tests/test_golden.py --regenerate
"""
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = Path(__file__).parent / "golden"


def _build_artifacts():
    from tests.test_vit import TINY, _make_pair
    from vittf_tpu.pipeline.features import ExtractConfig, extract_features
    from vittf_tpu.pipeline.ntf import compute_similarities, fuse_predictions

    _, params = _make_pair(TINY, seed=11)
    rng = np.random.default_rng(123)
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = extract_features(
        jnp.asarray(vol), params, TINY,
        ExtractConfig(feature_output_size=4, slice_along="all", batch_size=4,
                      precision="highest", attn_impl="xla"),
    )["k"]
    annotations = {
        "a": rng.integers(0, 16, (7, 3)).astype(np.int64),
        "b": rng.integers(0, 16, (5, 3)).astype(np.int64),
    }
    sims = compute_similarities(
        jnp.asarray(vol), feats, annotations, impl="xla"
    )
    pred = fuse_predictions(sims, [0.2, 0.2])
    return {
        "features": np.asarray(feats, np.float32),
        "sim_a": np.asarray(sims["a"]),
        "sim_b": np.asarray(sims["b"]),
        "pred": np.asarray(pred),
        "annotations_a": annotations["a"],
        "annotations_b": annotations["b"],
    }


def _build_bls_artifacts():
    from vittf_tpu.pipeline.refine import refine_similarity

    rng = np.random.default_rng(77)
    vol = rng.random((20, 20, 20)).astype(np.float32)
    sim = np.zeros((10, 10, 10), np.float32)
    sim[2:8, 3:9, 2:7] = rng.random((6, 6, 5)).astype(np.float32)
    refined = refine_similarity(jnp.asarray(sim), jnp.asarray(vol), (10, 10, 10))
    return {"refined": np.asarray(refined, np.float32)}


def test_golden_bls_stable():
    golden_path = GOLDEN_DIR / "bls_refined.npz"
    if not golden_path.exists():
        pytest.skip("golden file missing — run with --regenerate")
    golden = np.load(golden_path)
    got = _build_bls_artifacts()
    # CG on CPU is deterministic; tolerance guards fp reassociation only
    np.testing.assert_allclose(
        got["refined"], golden["refined"], rtol=1e-5, atol=1e-6
    )


def test_golden_artifacts_stable():
    golden_path = GOLDEN_DIR / "tiny_pipeline.npz"
    if not golden_path.exists():
        pytest.skip("golden file missing — run with --regenerate")
    golden = np.load(golden_path)
    got = _build_artifacts()
    np.testing.assert_array_equal(got["annotations_a"], golden["annotations_a"])
    np.testing.assert_allclose(
        got["features"], golden["features"], rtol=1e-5, atol=1e-6
    )
    # quantized artifacts are bit-defined
    np.testing.assert_array_equal(got["sim_a"], golden["sim_a"])
    np.testing.assert_array_equal(got["sim_b"], golden["sim_b"])
    np.testing.assert_array_equal(got["pred"], golden["pred"])


if __name__ == "__main__":
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    if "--regenerate" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        GOLDEN_DIR.mkdir(exist_ok=True)
        np.savez_compressed(GOLDEN_DIR / "tiny_pipeline.npz", **_build_artifacts())
        np.savez_compressed(GOLDEN_DIR / "bls_refined.npz", **_build_bls_artifacts())
        print(f"Wrote goldens into {GOLDEN_DIR}")
