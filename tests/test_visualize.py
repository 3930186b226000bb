import numpy as np

from vittf_tpu.pipeline.visualize import (
    plot_pca_features,
    plot_segmentation_slices,
    plot_similarity_matrix,
)


def test_similarity_matrix_plot(tmp_path, rng):
    feats = rng.standard_normal((4, 16))
    out = plot_similarity_matrix(feats, ["bg", "a", "b", "c"], tmp_path / "m.png")
    assert out.exists() and out.stat().st_size > 1000


def test_segmentation_slices_plot(tmp_path, rng):
    vol = rng.random((12, 16, 16))
    seg = (rng.random((12, 16, 16)) > 0.7).astype(np.int32) * 2
    out = plot_segmentation_slices(vol, seg, tmp_path / "s.png")
    assert out.exists() and out.stat().st_size > 1000


def test_pca_features_plot(tmp_path, rng):
    fv = rng.standard_normal((8, 6, 10, 10)).astype(np.float32)
    out = plot_pca_features(fv, tmp_path / "p.png")
    assert out.exists() and out.stat().st_size > 1000
