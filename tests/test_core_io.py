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


def test_hard_phantom_semantics():
    """The hard phantom must actually be hard: nested/touching structures,
    graded overlapping intensities, partial-volume boundaries."""
    from vittf_tpu.core.synthetic import make_hard_phantom

    vol, lab = make_hard_phantom(64, seed=0)
    assert vol.dtype == np.float32 and lab.dtype == np.uint8
    assert set(np.unique(lab)) == {0, 1, 2, 3, 4, 5}
    # deterministic per seed, different across seeds (bias-field phases)
    v2, l2 = make_hard_phantom(64, seed=0)
    np.testing.assert_array_equal(vol, v2)
    v3, _ = make_hard_phantom(64, seed=1)
    assert not np.array_equal(vol, v3)
    # kidneys TOUCH the liver: a liver voxel has a kidney 6-neighbor
    liver, kidney = lab == 2, lab == 3
    touch = False
    for ax in range(3):
        a = np.swapaxes(liver, 0, ax)
        b = np.swapaxes(kidney, 0, ax)
        touch |= bool((a[1:] & b[:-1]).any() or (a[:-1] & b[1:]).any())
    assert touch
    # lesion nested inside the liver region (all 6-neighbors liver/lesion)
    lesion = lab == 5
    assert lesion.any()
    grown = lesion.copy()
    for ax in range(3):
        g = np.swapaxes(grown, 0, ax)
        g[1:] |= np.swapaxes(lesion, 0, ax)[:-1]
        g[:-1] |= np.swapaxes(lesion, 0, ax)[1:]
    assert set(np.unique(lab[grown])) <= {2, 5}
    # graded contrast: liver/kidney/lesion means within 0.1 of each other
    means = [float(vol[lab == c].mean()) for c in (2, 3, 5)]
    assert max(means) - min(means) < 0.1
    # partial volume: boundary voxels take intermediate intensities —
    # the volume is not a step function (many distinct in-between values)
    inner = vol[(vol > 0.2) & (vol < 0.4)]
    assert inner.size > 100


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


def test_uint8_feature_artifact_roundtrip(tmp_path, rng):
    """dtype='uint8' stores per-channel codes + scale/offset; load_features
    dequantizes transparently, per-value error <= scale/2 per channel.
    Works for both .npy and .pt payloads; artifact is ~2x smaller than
    fp16 (reference stores half, infer.py:134, 337-340)."""
    feats = (rng.standard_normal((16, 6, 6, 6)) * 3.0).astype(np.float32)
    for suffix in (".npy", ".pt"):
        p = tmp_path / f"feats{suffix}"
        save_features(p, {"k": feats}, dtype="uint8")
        out = load_features(p)
        assert out.dtype == np.float32 and out.shape == feats.shape
        span = np.ptp(feats.reshape(16, -1), axis=1)
        tol = (span / 255.0 / 2.0 + 1e-6).reshape(-1, 1, 1, 1)
        assert np.all(np.abs(out - feats) <= tol)
    fp16 = tmp_path / "f16.npy"
    save_features(fp16, {"k": feats})
    u8 = tmp_path / "u8.npy"
    save_features(u8, {"k": feats}, dtype="uint8")
    assert u8.stat().st_size < 0.6 * fp16.stat().st_size


def test_uint8_feature_artifact_similarity_deviation(tmp_path, rng):
    """The compact artifact must not perturb the similarity maps it feeds:
    uint8-roundtripped features yield per-class uint8 similarity maps
    within a small deviation of the fp16-roundtripped ones."""
    import jax.numpy as jnp

    from vittf_tpu.pipeline.ntf import compute_similarities

    feats = rng.standard_normal((32, 8, 8, 8)).astype(np.float32)
    vol = rng.random((16, 16, 16)).astype(np.float32)
    ann = {
        "a": rng.integers(0, 16, (24, 3)),
        "b": rng.integers(0, 16, (16, 3)),
    }
    maps = {}
    for name, dtype in (("fp16", np.float16), ("u8", "uint8")):
        p = tmp_path / f"{name}.npy"
        save_features(p, {"k": feats}, dtype=dtype)
        loaded = jnp.asarray(load_features(p))
        sims = compute_similarities(vol, loaded, ann, impl="xla")
        maps[name] = {k: np.asarray(v).astype(np.int32) for k, v in sims.items()}
    for k in maps["fp16"]:
        diff = np.abs(maps["fp16"][k] - maps["u8"][k])
        # circular mod-256 distance: the top-1% wraparound (reference
        # torch-cast parity, quantize_uint8_torch) flips 255<->0 under
        # tiny perturbations, which is a 1-step circular move
        diff = np.minimum(diff, 256 - diff)
        assert diff.mean() < 1.0, diff.mean()
        assert diff.max() <= 16, diff.max()


def test_uint8_quantize_device_matches_host(rng):
    """quantize_features_u8 on a jax array (device path, quantizes before
    the D2H fetch) must match the host-numpy path bit-exactly."""
    import jax.numpy as jnp

    from vittf_tpu.core.io import quantize_features_u8

    feats = (rng.standard_normal((8, 5, 5, 5)) * 2.0).astype(np.float32)
    qh, sh, oh = quantize_features_u8(feats)
    qd, sd, od = quantize_features_u8(jnp.asarray(feats))
    np.testing.assert_array_equal(qh, qd)
    np.testing.assert_allclose(sh, sd, rtol=1e-6)
    np.testing.assert_allclose(oh, od, rtol=1e-6)
