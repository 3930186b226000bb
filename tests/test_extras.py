"""Tests: mlp feature capture, tiling, reporting, clip conversion."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_vit import TINY, TorchDinoViT, _make_pair
from vittf_tpu.pipeline.features import ExtractConfig, extract_features
from vittf_tpu.pipeline.reporting import (
    accumulate_metrics,
    extract_num,
    plot_iou_vs_annotations,
    summarize_userstudy,
)
from vittf_tpu.pipeline.tiling import (
    extract_tiles,
    get_tile_locations,
    stitch_tiles,
)


def test_mlp_feature_capture_matches_torch_hook(rng):
    """capture='mlp' must equal the torch MLP-module output (the
    infer_clip.py hook target)."""
    import torch

    from vittf_tpu.models.vit import vit_forward

    tmodel, params = _make_pair(TINY, seed=5)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)

    captured = []
    tmodel.blocks[-1].mlp.register_forward_hook(
        lambda m, i, o: captured.append(o)
    )
    with torch.no_grad():
        tmodel(torch.from_numpy(x))
    want = captured[0].numpy()

    _, got = vit_forward(
        params, jnp.asarray(x), TINY, precision="highest", attn_impl="xla",
        capture="mlp",
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_extract_features_mlp_source():
    # the thirds-split requires embed_dim % 3 == 0 (same constraint as the
    # reference's .view on the hooked tensor); BLIP's 768 satisfies it
    from vittf_tpu.models.vit import ViTConfig, init_vit_params

    rng = np.random.default_rng(0)
    cfg36 = ViTConfig(4, 36, 2, 4, img_size=16)
    params = init_vit_params(cfg36, jax.random.PRNGKey(0))
    vol = rng.random((12, 16, 20)).astype(np.float32)
    cfg = ExtractConfig(
        feature_output_size=4, slice_along="z", batch_size=4,
        precision="highest", attn_impl="xla", feature_source="mlp",
        pool_slice_axis=True,
    )
    out = extract_features(jnp.asarray(vol), params, cfg36, cfg)["k"]
    assert out.shape == (12, 3, 4, 5)  # 36/3 = 12 dims per key


def test_vit_capture_needs_valid_source():
    from vittf_tpu.models.vit import vit_forward

    _, params = _make_pair(TINY, seed=5)
    x = jnp.zeros((1, 3, 16, 16))
    tokens, cap = vit_forward(
        params, x, TINY, attn_impl="xla", capture="qkv"
    )
    assert cap.shape[-1] == 3 * TINY.embed_dim


# ---------- tiling ----------

def test_tile_locations_cover_volume():
    locs = get_tile_locations((20, 20, 20), (8, 8, 8), (2, 2, 2))
    assert locs.shape[-2:] == (2, 3)
    cover = np.zeros((20, 20, 20), bool)
    for s, e in locs:
        assert (e - s == 8).all()
        assert (s >= 0).all() and (e <= 20).all()
        cover[s[0]:e[0], s[1]:e[1], s[2]:e[2]] = True
    assert cover.all()


def test_tile_locations_none_axis():
    locs = get_tile_locations((10, 20, 30), (None, 16, 16), (0, 4, 4))
    assert all(e[0] - s[0] == 10 for s, e in locs)


def test_tile_roundtrip(rng):
    vol = jnp.asarray(rng.random((16, 16, 16)).astype(np.float32))
    locs = get_tile_locations(vol.shape, (8, 8, 8), (4, 4, 4))
    tiles = extract_tiles(vol, locs)
    out = stitch_tiles(tiles, locs, vol.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vol), rtol=1e-6)


# ---------- reporting ----------

def _fake_metrics(tmp_path, name, miou):
    m = {
        "mAcc": 0.9,
        "iou": {"a": miou, "b": miou + 0.05},
        "confusion_matrix": {"a": [[1, 0], [0, 1]]},
        "fit_time": 1.0,
    }
    p = tmp_path / name
    with open(p, "w") as f:
        json.dump(m, f)
    return p


def test_accumulate_metrics(tmp_path):
    f1 = _fake_metrics(tmp_path, "m1.json", 0.5)
    f2 = _fake_metrics(tmp_path, "m2.json", 0.7)
    acc = accumulate_metrics([f1, f2])
    assert acc["iou"]["a"] == pytest.approx(0.6)
    assert acc["mAcc"] == pytest.approx(0.9)
    assert "confusion_matrix" not in acc


def test_extract_num():
    assert extract_num("rf_metrics512both.json") == 512
    assert extract_num("svm_metrics0.01uniform.json") == 0.01


def test_plot_iou_vs_annotations(tmp_path):
    series = {"Random Forests": {8: 0.3, 64: 0.4, 512: 0.45}}
    out = plot_iou_vs_annotations(series, tmp_path / "iou.png")
    assert out.exists() and out.stat().st_size > 1000


def test_summarize_userstudy(tmp_path):
    recs = []
    for u in range(3):
        rec = {
            "lung": {
                "accuracy": 0.95,
                "iou": [0.9, 0.8 + 0.01 * u],
                "annotation_time": 30 + u,
                "num_annotations": 5,
            }
        }
        p = tmp_path / f"user{u}.json"
        with open(p, "w") as f:
            json.dump(rec, f)
        recs.append(p)
    s = summarize_userstudy(recs, tmp_path / "out", classes=("lung",))
    assert s["iou"]["lung"]["n"] == 3
    # binary metrics use the foreground entry (index 1)
    assert s["iou"]["lung"]["mean"] == pytest.approx(0.81)
    assert (tmp_path / "out" / "summary.json").exists()


def test_clip_conversion_path(rng):
    """convert_visual_encoder handles the visual_encoder.* prefix."""
    import torch

    from vittf_tpu.models.clip import convert_visual_encoder
    from vittf_tpu.models.vit import ViTConfig

    cfg = ViTConfig(4, 32, 2, 4, img_size=16)
    tmodel = TorchDinoViT(cfg)
    sd = {f"visual_encoder.{k}": v for k, v in tmodel.state_dict().items()}
    params = convert_visual_encoder(sd, cfg)
    assert len(params["blocks"]) == 2
    assert params["patch_embed"]["kernel"].shape == (4, 4, 3, 32)
