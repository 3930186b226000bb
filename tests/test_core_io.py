"""Artifact-contract tests: load/save parity with the reference file formats."""
import numpy as np
import torch

from vittf_tpu.core.io import (
    ArtifactDir,
    load_annotations,
    load_features,
    load_volume,
    save_array,
    save_features,
    save_similarities,
)
from vittf_tpu.core.synthetic import make_synthetic_volumes, write_synthetic_volumes


def test_load_volume_npy_plain(tmp_path, rng):
    vol = rng.random((8, 9, 10)).astype(np.float16)
    np.save(tmp_path / "v.npy", vol)
    got = load_volume(tmp_path / "v.npy")
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, vol.astype(np.float32))


def test_load_volume_npy_object_dict(tmp_path, rng):
    vol = rng.random((4, 5, 6)).astype(np.float32)
    np.save(tmp_path / "v.npy", {"vol": vol, "extra": 1})
    np.testing.assert_allclose(load_volume(tmp_path / "v.npy"), vol)


def test_load_volume_pt(tmp_path, rng):
    vol = torch.rand(5, 6, 7)
    torch.save({"vol": vol}, tmp_path / "v.pt")
    np.testing.assert_allclose(load_volume(tmp_path / "v.pt"), vol.numpy())


def test_features_roundtrip_npy_and_pt(tmp_path, rng):
    feats = rng.standard_normal((16, 4, 5, 6)).astype(np.float32)
    save_features(tmp_path / "x_features64.npy", {"k": feats})
    save_features(tmp_path / "x_features64.pt", {"k": feats})
    for suffix in (".npy", ".pt"):
        got = load_features(tmp_path / f"x_features64{suffix}")
        np.testing.assert_allclose(got, feats.astype(np.float16), rtol=1e-3)


def test_annotations_roundtrip(tmp_path, rng):
    ann = {
        "liver": rng.integers(0, 64, (17, 3)).astype(np.int64),
        "bone": rng.integers(0, 64, (5, 3)).astype(np.int64),
    }
    np.save(tmp_path / "annotations.npy", ann)
    got = load_annotations(tmp_path / "annotations.npy")
    assert set(got) == {"liver", "bone"}
    np.testing.assert_array_equal(got["liver"], ann["liver"])


def test_artifact_dir_selects_largest_features(tmp_path, rng):
    np.save(tmp_path / "volume.npy", rng.random((4, 4, 4)).astype(np.float32))
    save_features(tmp_path / "a_features32.npy", {"k": rng.random((4, 2, 2, 2))})
    save_features(tmp_path / "a_features64.npy", {"k": rng.random((4, 4, 4, 4))})
    save_features(tmp_path / "a_features_pred.npy", {"k": rng.random((9, 9, 9, 9))})
    d = ArtifactDir(tmp_path)
    assert d.features_path().name == "a_features64.npy"
    assert d.features().shape == (4, 4, 4, 4)
    assert d.labels() is None


def test_similarities_contract(tmp_path, rng):
    sims = {"liver": (rng.random((8, 8, 8)) * 255).astype(np.uint8)}
    save_similarities(tmp_path / "similarities.npy", sims)
    got = ArtifactDir(tmp_path).similarities()
    np.testing.assert_array_equal(got["liver"], sims["liver"])


def test_synthetic_volumes_semantics():
    vols = make_synthetic_volumes(size=32)
    assert set(vols) == {"sphere_thick", "sphere_filled", "torus_thick", "torus_filled"}
    vol, label = vols["sphere_filled"]
    assert vol.dtype == np.float16 and label.dtype == np.uint8
    assert vol.shape == (32, 32, 32)
    # a filled sphere of radius .5 in [-1,1]^3 covers ~ (4/3 pi .125)/8 ≈ 6.5%
    frac = label.mean()
    assert 0.04 < frac < 0.09
    # center voxel inside, corner outside
    assert label[16, 16, 16] == 1 and label[0, 0, 0] == 0


def test_write_synthetic_volumes(tmp_path):
    written = write_synthetic_volumes(tmp_path, size=16)
    assert len(written) == 8
    vol = load_volume(tmp_path / "torus_filled.npy")
    assert vol.shape == (16, 16, 16)


def test_load_volume_preserve_dtype(tmp_path):
    import numpy as np

    from vittf_tpu.core.io import load_volume

    vol_u8 = np.random.default_rng(0).integers(0, 256, (6, 7, 8)).astype(np.uint8)
    p = tmp_path / "v.npy"
    np.save(p, vol_u8)
    # parity default: fp32 (reference infer.py load_data .float())
    assert load_volume(p).dtype == np.float32
    kept = load_volume(p, preserve_dtype=True)
    assert kept.dtype == np.uint8
    np.testing.assert_array_equal(kept, vol_u8)
    # float64 always becomes fp32, preserve or not
    np.save(p, vol_u8.astype(np.float64))
    assert load_volume(p, preserve_dtype=True).dtype == np.float32
