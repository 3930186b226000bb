"""CLI end-to-end tests: the full reference command pipeline on synthetic data."""
import json

import numpy as np
import pytest

from vittf_tpu.cli import convert as cli_convert
from vittf_tpu.cli import infer as cli_infer
from vittf_tpu.cli import predict_ntf as cli_predict_ntf
from vittf_tpu.cli import predict_svm_rf as cli_svm_rf
from vittf_tpu.cli import synth as cli_synth


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    """synth → infer → an ArtifactDir ready for prediction."""
    d = tmp_path_factory.mktemp("vols")
    assert cli_synth.main([str(d), "--size", "16"]) == 0
    # artifact-dir layout for the predictors
    vol = np.load(d / "sphere_filled.npy").astype(np.float32)
    np.save(d / "volume.npy", vol)
    np.save(d / "labels.npy", np.load(d / "sphere_filled_label.npy"))
    rc = cli_infer.main(
        [
            "--data-path", str(d / "volume.npy"),
            "--feature-output-size", "8",
            "--batch-size", "4",
            "--precision", "highest",
        ]
    )
    assert rc == 0
    return d


def test_synth_wrote_all_fixtures(data_dir):
    for name in ["sphere_thick", "sphere_filled", "torus_thick", "torus_filled"]:
        assert (data_dir / f"{name}.npy").exists()
        assert (data_dir / f"{name}_label.npy").exists()


def test_infer_features_artifact(data_dir):
    feats = [p for p in data_dir.iterdir() if "features" in p.name]
    assert len(feats) == 1
    data = np.load(feats[0], allow_pickle=True)[()]
    assert set(data) == {"k"}
    assert data["k"].dtype == np.float16
    assert data["k"].shape == (384, 8, 8, 8)


def test_infer_streamed_matches_resident(data_dir, tmp_path):
    """--streamed must write the same feature artifact as the resident
    path (fp16 store quantizes both identically)."""
    out = tmp_path / "feats_streamed.npy"
    rc = cli_infer.main(
        [
            "--data-path", str(data_dir / "volume.npy"),
            "--cache-path", str(out),
            "--feature-output-size", "8",
            "--batch-size", "4",
            "--precision", "highest",
            "--streamed", "--chunk-batches", "2",
        ]
    )
    assert rc == 0
    resident = [p for p in data_dir.iterdir() if "features" in p.name][0]
    want = np.load(resident, allow_pickle=True)[()]["k"]
    got = np.load(out, allow_pickle=True)[()]["k"]
    np.testing.assert_allclose(
        got.astype(np.float32), want.astype(np.float32), rtol=2e-3, atol=2e-4
    )


def test_infer_refuses_overwrite(data_dir, capsys):
    with pytest.raises(SystemExit):
        cli_infer.main(
            ["--data-path", str(data_dir / "volume.npy"),
             "--feature-output-size", "8"]
        )


def test_predict_ntf_cli(data_dir):
    rc = cli_predict_ntf.main(
        ["--data", str(data_dir), "--num-samples", "32",
         "--sampling-mode", "uniform", "--impl", "xla"]
    )
    assert rc == 0
    preds = list(data_dir.glob("ntf_pred*.npy"))
    assert preds, list(data_dir.iterdir())
    pred = np.load(preds[0])
    assert pred.shape == (8, 8, 8)  # half of 16³
    metrics = json.loads(next(data_dir.glob("ntf_metrics*.json")).read_text())
    assert "mIoU" in metrics and "fit_time" in metrics


def test_predict_ntf_cli_with_bilateral_solver(data_dir):
    """The full predict flow including the BLS branch (surface sampling →
    fused similarity → crop → dense-grid solve → fusion → metrics)."""
    rc = cli_predict_ntf.main(
        ["--data", str(data_dir), "--num-samples", "24",
         "--sampling-mode", "both", "--impl", "xla", "--bilateral-solver"]
    )
    assert rc == 0
    preds = [p for p in data_dir.glob("ntf_pred*bls.npy")]
    assert preds
    metrics = json.loads(
        next(data_dir.glob("ntf_metrics*bls.json")).read_text()
    )
    assert "mIoU" in metrics


def test_predict_ntf_cli_largest_island(data_dir):
    """--largest-island applies the cc post-filter to every class's
    similarity map before fusion (reference cc_torch filter,
    tests/test_connected_components.py:26-61): each surviving class mask
    in the fused prediction must be one connected component."""
    rc = cli_predict_ntf.main(
        ["--data", str(data_dir), "--num-samples", "32",
         "--sampling-mode", "uniform", "--impl", "xla", "--largest-island"]
    )
    assert rc == 0
    preds = [p for p in data_dir.glob("ntf_pred*isl.npy")]
    assert preds, list(data_dir.iterdir())
    metrics = json.loads(
        next(data_dir.glob("ntf_metrics*isl.json")).read_text()
    )
    assert "mIoU" in metrics


def test_predict_svm_rf_cli(data_dir):
    rc = cli_svm_rf.main(
        ["--data", str(data_dir), "--num-samples", "24",
         "--sampling-mode", "uniform", "--rf-estimators", "8", "--no-svm"]
    )
    assert rc == 0
    assert list(data_dir.glob("rf_pred*.npy"))
    metrics = json.loads(next(data_dir.glob("rf_metrics*.json")).read_text())
    assert metrics["mAcc"] > 0.5


def test_convert_resize_and_halfz(tmp_path, rng):
    vol = rng.random((8, 8, 16)).astype(np.float32)
    np.save(tmp_path / "v.npy", vol)
    rc = cli_convert.main(
        ["resize", "--data", str(tmp_path / "v.npy"),
         "--resolution", "0.5", "0.5", "0.5"]
    )
    assert rc == 0
    out = np.load(tmp_path / "v_resized.npy")
    assert out.shape == (4, 4, 8)
    rc = cli_convert.main(["halfz", "--data", str(tmp_path / "v.npy")])
    assert rc == 0
    assert np.load(tmp_path / "v_halfZ.npy").shape == (8, 8, 8)


def test_convert_raw(tmp_path, rng):
    raw = (rng.random((4, 5, 6)) * 255).astype(np.uint8)
    raw.tofile(tmp_path / "x.raw")
    rc = cli_convert.main(
        ["raw", "--data", str(tmp_path / "x.raw"), "--shape", "4", "5", "6"]
    )
    assert rc == 0
    np.testing.assert_array_equal(np.load(tmp_path / "x.npy"), raw)


def test_infer_with_torch_weights(tmp_path, rng):
    """--weights PATH loads a torch DINO state_dict through the converter."""
    import torch

    from tests.test_vit import TINY, TorchDinoViT

    # a ViT-S/8-shaped checkpoint would be slow on CPU; monkey-free path:
    # save a tiny-arch state_dict and load it with a matching arch by
    # calling the converter path the CLI uses
    tmodel = TorchDinoViT(TINY)
    ckpt = tmp_path / "dino.pth"
    torch.save(tmodel.state_dict(), ckpt)
    from vittf_tpu.models.dino import load_dino_checkpoint

    params = load_dino_checkpoint(ckpt, TINY)
    assert len(params["blocks"]) == TINY.depth
    # teacher-wrapped checkpoints (DINO training snapshots)
    torch.save(
        {"teacher": {f"backbone.{k}": v for k, v in tmodel.state_dict().items()}},
        tmp_path / "teacher.pth",
    )
    params2 = load_dino_checkpoint(tmp_path / "teacher.pth", TINY)
    np.testing.assert_allclose(
        np.asarray(params2["pos_embed"]), np.asarray(params["pos_embed"])
    )


def test_predict_ntf_load_sims(data_dir):
    """--load-sims consumes a similarities.npy artifact instead of
    recomputing (predict_ntf.py:181-183)."""
    import jax.numpy as jnp

    from vittf_tpu.core.io import save_similarities

    rng = np.random.default_rng(1)
    sims = {
        f"c{i}": (rng.random((8, 8, 8)) * 255).astype(np.uint8) for i in range(2)
    }
    save_similarities(data_dir / "similarities.npy", sims)
    rc = cli_predict_ntf.main(
        ["--data", str(data_dir), "--load-sims", "--num-samples", "4",
         "--sampling-mode", "uniform"]
    )
    assert rc == 0


def test_svm_rf_exclude_bg(rng):
    from vittf_tpu.pipeline.annotations import sample_uniform
    from vittf_tpu.pipeline.baselines import run_svm_rf

    lab = np.zeros((12, 12, 12), np.uint8)
    lab[2:6, 2:6, 2:6] = 1
    lab[7:11, 7:11, 7:11] = 2
    vol = ((lab == 1) * 0.9 + (lab == 2) * 0.3 + rng.random(lab.shape) * 0.02)
    ann = {
        "ntf1": sample_uniform(lab == 1, 20, rng=rng),
        "ntf2": sample_uniform(lab == 2, 20, rng=rng),
    }
    res = run_svm_rf(
        vol.astype(np.float32), ann, labels=lab, rf_estimators=8,
        run_svm=False, exclude_bg=True,
    )
    pred = res["rf"]["pred"]
    assert (pred[lab == 0] == 0).all()  # background untouched
    assert res["rf"]["metrics"]["mAcc"] > 0.8  # 2-class problem, labels -1


def test_convert_weights_cli(tmp_path):
    import torch

    from tests.test_vit import TINY, TorchDinoViT
    from vittf_tpu.cli import convert_weights

    tmodel = TorchDinoViT(TINY)
    ckpt = tmp_path / "w.pth"
    torch.save(tmodel.state_dict(), ckpt)
    # tiny arch isn't registered; exercise through the registry with a
    # monkeypatched entry
    from vittf_tpu.models import dino

    dino.ALL_ARCHS["tiny-test"] = TINY
    try:
        rc = convert_weights.main(
            [str(ckpt), str(tmp_path / "w.npz"), "--arch", "tiny-test"]
        )
    finally:
        dino.ALL_ARCHS.pop("tiny-test")
    assert rc == 0
    from vittf_tpu.models.serialization import load_params_npz

    params = load_params_npz(tmp_path / "w.npz")
    assert len(params["blocks"]) == TINY.depth


def test_params_npz_roundtrip(tmp_path):
    import jax

    from vittf_tpu.models.serialization import load_params_npz, save_params_npz
    from vittf_tpu.models.vit import ViTConfig, init_vit_params

    cfg = ViTConfig(4, 32, 2, 4, img_size=16)
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    save_params_npz(tmp_path / "p.npz", params)
    restored = load_params_npz(tmp_path / "p.npz")
    assert len(restored["blocks"]) == 2
    chex_equal = jax.tree.all(
        jax.tree.map(lambda a, b: bool((a == b).all()), params, restored)
    )
    assert chex_equal


def test_orbax_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from vittf_tpu.models.serialization import restore_checkpoint, save_checkpoint

    state = {"w": jnp.arange(6.0).reshape(2, 3), "step": jnp.asarray(7)}
    save_checkpoint(tmp_path / "ckpt", state, step=7)
    restored = restore_checkpoint(tmp_path / "ckpt", state)
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(state["w"]))


def test_infer_uint8_feature_artifact(data_dir, tmp_path):
    """--feature-dtype uint8 writes the compact quantized artifact;
    load_features dequantizes it and the NTF predictor runs off it."""
    from vittf_tpu.core.io import load_features

    out = tmp_path / "feats_u8.npy"
    rc = cli_infer.main(
        [
            "--data-path", str(data_dir / "volume.npy"),
            "--cache-path", str(out),
            "--feature-output-size", "8",
            "--batch-size", "4",
            "--precision", "highest",
            "--feature-dtype", "uint8",
        ]
    )
    assert rc == 0
    payload = np.load(out, allow_pickle=True)[()]
    assert payload["k"].dtype == np.uint8 and "__quant__" in payload
    feats = load_features(out)
    assert feats.dtype == np.float32 and feats.shape == (384, 8, 8, 8)
    # ~half the fp16 artifact (one fp16 artifact already exists from the
    # fixture's infer run)
    fp16 = next(p for p in data_dir.iterdir() if "features" in p.name)
    assert out.stat().st_size < 0.6 * fp16.stat().st_size
