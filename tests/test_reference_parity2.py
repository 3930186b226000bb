"""TRUE reference-code parity, wave 2: synthetic fixtures, trainers' math
(PAWS loss, receptive-field gather, 3D CNN), SVM feature composition and
the surface-sampling shell — all run through the reference's own functions.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference checkout not available"
)

if REF.exists():
    sys.path.insert(0, str(REF))
    sys.path.insert(0, str(REF / "old"))
    from tests.conftest import install_icecream_stub

    install_icecream_stub()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402


def test_synthetic_volumes_vs_reference():
    """SDF fixtures must be bit-comparable to the reference generator."""
    import create_synthetic_volumes as ref_synth

    from vittf_tpu.core.synthetic import make_synthetic_volumes

    size = 32
    ls = torch.linspace(-1, 1, size)
    pos = torch.stack(torch.meshgrid(ls, ls, ls, indexing="xy"), dim=-1)
    want = {
        "sphere_thick": ref_synth.sphere_thickness(pos, 0.5, 0.05),
        "sphere_filled": ref_synth.sphere_filled(pos, 0.5),
        "torus_thick": ref_synth.torus_thickness(pos, 0.5, 0.2, 0.05),
        "torus_filled": ref_synth.torus_filled(pos, 0.5, 0.2),
    }
    got = make_synthetic_volumes(size=size, noise=0.0)
    for name, (vol, label) in got.items():
        np.testing.assert_array_equal(
            vol, want[name].numpy().astype(np.float16), err_msg=name
        )
        np.testing.assert_array_equal(
            label, (want[name] > 0.5).numpy().astype(np.uint8), err_msg=name
        )


def test_paws_loss_vs_reference(rng):
    import paws as ref_paws

    from vittf_tpu.train.losses import paws_loss, sharpen, snn

    B, M, C, Fd = 6, 9, 3, 8
    av = rng.standard_normal((B, Fd)).astype(np.float32)
    tv = rng.standard_normal((B, Fd)).astype(np.float32)
    sup = rng.standard_normal((M, Fd)).astype(np.float32)
    lab = np.eye(C)[rng.integers(0, C, M)].astype(np.float32)
    clas = rng.standard_normal((B + M, C)).astype(np.float32)

    want = ref_paws.paws_loss(
        torch.from_numpy(av.copy()), torch.from_numpy(sup.copy()),
        torch.from_numpy(lab.copy()), torch.from_numpy(tv.copy()),
        torch.from_numpy(sup.copy()), torch.from_numpy(lab.copy()),
        clas_pred=None,
    )
    got = paws_loss(
        jnp.asarray(av), jnp.asarray(sup), jnp.asarray(lab),
        jnp.asarray(tv), jnp.asarray(sup), jnp.asarray(lab),
    )
    assert abs(float(got[0]) - float(want[0])) < 1e-4
    assert abs(float(got[1]) - float(want[1])) < 1e-4
    # snn / sharpen primitives
    np.testing.assert_allclose(
        np.asarray(snn(jnp.asarray(av), jnp.asarray(sup), jnp.asarray(lab))),
        ref_paws.snn(torch.from_numpy(av.copy()), torch.from_numpy(sup.copy()),
                     torch.from_numpy(lab.copy())).numpy(),
        rtol=1e-5, atol=1e-6,
    )
    p = np.abs(rng.random((5, C))).astype(np.float32)
    p = p / p.sum(1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(sharpen(jnp.asarray(p), 0.25)),
        ref_paws.sharpen(torch.from_numpy(p.copy()), 0.25).numpy(),
        rtol=1e-5, atol=1e-6,
    )


def test_gather_vs_reference(rng):
    import semisparseconv as ref_ssc

    from vittf_tpu.train.gather import gather_receptive_fields

    vol = rng.random((2, 10, 11, 12)).astype(np.float32)
    centers = np.stack(
        [rng.integers(0, s, 15) for s in (10, 11, 12)], axis=-1
    ).astype(np.int64)
    for ks in (3, 5):
        want2 = ref_ssc.gather_receiptive_fields2(
            torch.from_numpy(vol.copy()), torch.from_numpy(centers.copy()), ks=ks
        ).numpy()
        got = np.asarray(
            gather_receptive_fields(jnp.asarray(vol), jnp.asarray(centers), ks=ks)
        )
        np.testing.assert_allclose(got, want2)


def test_compose_features_vs_reference(rng):
    import predict_svm_rf as ref_svm

    from vittf_tpu.pipeline.baselines import compose_features, sample_train_data

    vol = (rng.random((8, 9, 10)) + 0.1).astype(np.float32)
    want = ref_svm.compose_features(torch.from_numpy(vol.copy())).numpy()
    got = np.asarray(compose_features(jnp.asarray(vol)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # sampled training data (labels = sorted-class index, the live branch)
    ann = {
        "b_cls": torch.from_numpy(rng.integers(0, 8, (5, 3)).astype(np.int64)),
        "a_cls": torch.from_numpy(rng.integers(0, 8, (7, 3)).astype(np.int64)),
    }
    want_X, want_y = ref_svm.sample_train_data(
        torch.from_numpy(want.copy()), None, ann
    )
    got_X, got_y = sample_train_data(
        jnp.asarray(got), {k: v.numpy() for k, v in ann.items()}
    )
    np.testing.assert_allclose(got_X, want_X, rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got_y, want_y)


def test_surface_shell_vs_reference():
    """The deterministic erosion-shell construction inside the reference's
    sample_surface (compare_feat_sampling.py:19-25)."""
    from scipy.ndimage import binary_erosion as ref_erosion
    from scipy.ndimage import generate_binary_structure as ref_gbs

    from vittf_tpu.pipeline.annotations import surface_shell

    z, y, x = np.mgrid[:20, :20, :20]
    mask = (z - 10) ** 2 + (y - 10) ** 2 + (x - 10) ** 2 < 49
    stel1 = ref_gbs(rank=3, connectivity=4)
    stel2 = ref_gbs(rank=3, connectivity=1)
    outer = ref_erosion(mask, stel1)
    inner = ref_erosion(outer, stel2)
    want = np.logical_xor(inner, outer)
    got = surface_shell(mask, dist_from_surface=4)
    np.testing.assert_array_equal(got, want)


def test_feature_extractor_vs_reference_model(rng):
    """Load identical weights into the reference's FeatureExtractor and
    ours; outputs must match."""
    import models as ref_models

    from vittf_tpu.models.cnn3d import (
        FeatureExtractorConfig,
        feature_extractor_forward,
        init_feature_extractor,
    )

    cfg = FeatureExtractorConfig(1, (8, 16), (16, 16))
    params = init_feature_extractor(cfg, jax.random.PRNGKey(5))
    rmodel = ref_models.FeatureExtractor(
        in_dim=1, n_features=[8, 16], n_linear=[16, 16]
    )
    with torch.no_grad():
        conv_layers = list(rmodel.convs) + list(rmodel.lins)
        my_layers = params["convs"] + params["lins"]
        for tl, p in zip(conv_layers, my_layers):
            conv = tl[0]
            norm = tl[1]
            conv.weight.copy_(
                torch.from_numpy(np.asarray(p["conv"]["kernel"])).permute(4, 3, 0, 1, 2)
            )
            conv.bias.copy_(torch.from_numpy(np.asarray(p["conv"]["bias"])))
            norm.weight.copy_(torch.from_numpy(np.asarray(p["norm"]["scale"])))
            norm.bias.copy_(torch.from_numpy(np.asarray(p["norm"]["bias"])))
        rmodel.last.weight.copy_(
            torch.from_numpy(np.asarray(params["last"]["kernel"])).permute(4, 3, 0, 1, 2)
        )
        rmodel.last.bias.copy_(torch.from_numpy(np.asarray(params["last"]["bias"])))

    x = rng.standard_normal((2, 1, 9, 9, 9)).astype(np.float32)
    with torch.no_grad():
        want = rmodel(torch.from_numpy(x.copy())).numpy()
    got = np.asarray(
        feature_extractor_forward(params, jnp.asarray(x), cfg, "highest")
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
