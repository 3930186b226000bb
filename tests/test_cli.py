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
