"""Fast-mode quality experiment machinery (pipeline/quality.py).

Full-scale IoU numbers are measured on TPU (scripts/fastmode_quality.py →
docs/FASTMODE.md); here the experiment runs end-to-end at tiny scale on
the CPU mesh to keep it green in-suite.
"""
import jax
import numpy as np

from vittf_tpu.core.synthetic import make_multiclass_volume
from vittf_tpu.models.vit import ViTConfig, init_vit_params
from vittf_tpu.pipeline.features import ExtractConfig
from vittf_tpu.pipeline.quality import fastmode_quality_experiment, ntf_predict


def test_multiclass_volume_has_three_disjoint_classes():
    vol, labels = make_multiclass_volume(48, noise=0.05)
    assert vol.shape == labels.shape == (48, 48, 48)
    present = set(np.unique(labels).tolist())
    assert present == {0, 1, 2, 3}
    # intensity bands are ordered: class1 > class2 > class3 > background
    means = [float(vol[labels == c].mean()) for c in (1, 2, 3, 0)]
    assert means[0] > means[1] > means[2] > means[3]


def test_fastmode_experiment_runs_and_reports():
    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4, img_size=32)
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    ex_cfg = ExtractConfig(
        feature_output_size=8, slice_along="all", batch_size=8, attn_impl="xla"
    )
    r = fastmode_quality_experiment(
        32, params, cfg, ex_cfg, n_annotations=32, seed=0
    )
    for mode in ("full", "fast"):
        assert 0.0 <= r[mode]["mIoU_fg"] <= 1.0
        assert set(r[mode]["iou"]) == set(r["classes"])
        assert r[mode]["extract_s"] > 0
    # At this tiny scale (2-layer random ViT, 8³ feature grid) absolute
    # quality is limited — the bright sphere is the resolvable target;
    # the full-scale numbers live in docs/FASTMODE.md. The modes must
    # track each other: the subsample picks slices the pooling already
    # weights highest, so quality should not collapse.
    assert r["full"]["iou"]["ntf1"] > 0.15
    assert r["fast"]["iou"]["ntf1"] > 0.15
    assert abs(r["iou_delta"]) < 0.2


def test_ntf_predict_pred_at_volume_resolution():
    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4, img_size=32)
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    ex_cfg = ExtractConfig(
        feature_output_size=8, slice_along="all", batch_size=8, attn_impl="xla"
    )
    vol, labels = make_multiclass_volume(32)
    from vittf_tpu.pipeline.annotations import annotations_from_labels

    ann = annotations_from_labels(labels, 16, "uniform", rng=np.random.default_rng(0))
    pred, times = ntf_predict(vol, params, cfg, ex_cfg, ann)
    assert pred.shape == vol.shape
    assert pred.max() <= len(ann)


def test_refinement_experiment_runs_and_reports():
    """Tiny-scale smoke of the refinement-uplift A/B: four cells, each a
    valid IoU table on identical features + annotations."""
    from vittf_tpu.pipeline.quality import refinement_quality_experiment

    r = refinement_quality_experiment(
        32, fos=16, phantom="easy", seed=0, n_annotations=32,
        train_iterations=30,
        oracle_kw={"model_features": (4, 8), "model_linear": (8,),
                   "train_size": 32},
    )
    for cell in ("base", "bls", "island", "bls_island"):
        assert 0.0 <= r[cell]["mIoU_fg"] <= 1.0
        assert set(r[cell]["iou"]) == {"c1", "c2", "c3"}
    for k in ("bls_uplift", "island_uplift", "stack_uplift"):
        assert -1.0 <= r[k] <= 1.0
    assert r["phantom"] == "easy"


def test_hard_phantom_through_quality_harness():
    """The hard phantom threads through the fast-mode experiment."""
    import jax as _jax

    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4, img_size=32)
    params = init_vit_params(cfg, _jax.random.PRNGKey(0))
    ex_cfg = ExtractConfig(
        feature_output_size=8, slice_along="all", batch_size=8, attn_impl="xla"
    )
    r = fastmode_quality_experiment(
        32, params, cfg, ex_cfg, n_annotations=24, seed=0, phantom="hard"
    )
    assert r["phantom"] == "hard"
    assert len(r["classes"]) == 5  # body/liver/kidney/bone/lesion
    for mode in ("full", "fast"):
        assert 0.0 <= r[mode]["mIoU_fg"] <= 1.0


def test_grid_ceiling_non_divisible_size():
    """size % fos != 0 pools the covered corner instead of crashing."""
    from vittf_tpu.pipeline.quality import grid_ceiling_miou

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 3, (50, 50, 50)).astype(np.uint8)
    out = grid_ceiling_miou(labels, 16)  # 50 % 16 != 0
    assert 0.0 <= out["mIoU_fg"] <= 1.0
    # fos larger than the volume clamps to one cell per voxel
    out2 = grid_ceiling_miou(labels[:4, :4, :4], 16)
    assert out2["mIoU_fg"] == 1.0  # identity grid is a perfect predictor
