import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vittf_tpu.utils.tensor import (
    imagenet_normalize,
    make_3d,
    make_4d,
    make_5d,
    make_nd,
    norm_mean_std,
    norm_minmax,
)


def test_make_nd_shapes():
    t = jnp.ones((4, 5))
    assert make_3d(t).shape == (1, 4, 5)
    assert make_4d(t).shape == (1, 1, 4, 5)
    assert make_5d(t).shape == (1, 1, 1, 4, 5)
    assert make_nd(t, 2).shape == (4, 5)


def test_make_nd_raises_on_reduce():
    with pytest.raises(ValueError):
        make_nd(jnp.ones((1, 2, 3)), 2)


def test_norm_minmax(rng):
    x = rng.standard_normal((3, 4, 5)).astype(np.float32)
    got = np.asarray(norm_minmax(jnp.asarray(x)))
    t = torch.from_numpy(x)
    want = ((t - t.min()) / (t.max() - t.min())).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    assert got.min() == 0.0 and got.max() == 1.0


def test_norm_mean_std_matches_torch(rng):
    x = rng.standard_normal((64,)).astype(np.float32) * 3 + 7
    got = np.asarray(norm_mean_std(jnp.asarray(x), mu=1.5, std=2.0))
    t = torch.from_numpy(x)
    want = ((t - t.mean()) * 2.0 / t.std() + 1.5).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_imagenet_normalize_matches_torch(rng):
    # torchvision normalize semantics: (x - mean[c]) / std[c] per channel
    x = rng.random((2, 3, 8, 8)).astype(np.float32)
    got = np.asarray(imagenet_normalize(jnp.asarray(x)))
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    want = ((torch.from_numpy(x) - mean) / std).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
