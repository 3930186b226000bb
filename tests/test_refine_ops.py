"""Parity tests: crop, morphology, connected components vs scipy/torch."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.ndimage as ndi
import torch
import torch.nn.functional as F

from vittf_tpu.ops.connected import (
    connected_components,
    filter_similarity_largest_island,
    largest_component,
)
from vittf_tpu.ops.crop import crop_pad, write_crop_into
from vittf_tpu.ops.morphology import (
    binary_erosion,
    binary_fill_holes,
    filter_gauss_separated,
    filter_sobel_separated,
    generate_binary_structure,
)


# ---------- crop ----------

def test_crop_pad_matches_torch_reference(rng):
    sim = rng.random((9, 11, 13)).astype(np.float32)
    sim[sim < 0.85] = 0.0
    vol = rng.random((9, 11, 13)).astype(np.float32)
    (csim, cvol), (mi, ma) = crop_pad([jnp.asarray(sim), jnp.asarray(vol)], thresh=0.1, pad=2)

    tsim = torch.from_numpy(sim)
    nz = torch.nonzero(tsim > 0.1)
    tmi = torch.clamp(nz.min(dim=0).values[-3:] - 2, 0, None)
    tma = torch.clamp(
        nz.max(dim=0).values[-3:] + 2 + 1, None, torch.tensor(tsim.shape[-3:])
    )
    np.testing.assert_array_equal(np.asarray(mi), tmi.numpy())
    np.testing.assert_array_equal(np.asarray(ma), tma.numpy())
    want = tsim[tmi[0]:tma[0], tmi[1]:tma[1], tmi[2]:tma[2]].numpy()
    np.testing.assert_array_equal(np.asarray(csim), want)


def test_write_crop_roundtrip(rng):
    sim = rng.random((8, 8, 8)).astype(np.float32)
    crop, mima = crop_pad(jnp.asarray(sim), thresh=0.5, pad=1)
    out = write_crop_into(jnp.asarray(sim), crop * 2, mima)
    mi, ma = mima
    np.testing.assert_allclose(
        np.asarray(out)[mi[0]:ma[0], mi[1]:ma[1], mi[2]:ma[2]],
        np.asarray(crop) * 2,
    )


# ---------- morphology ----------

def test_sobel_matches_torch_conv3d(rng):
    x = rng.random((1, 1, 6, 7, 8)).astype(np.float32)
    got = np.asarray(filter_sobel_separated(jnp.asarray(x)))
    win = torch.tensor([-0.5, 0.0, 0.5])[None, None, None, None]
    t = torch.from_numpy(x)
    out = F.conv3d(t, win, padding=(0, 0, 1)) ** 2
    out += F.conv3d(t, win.transpose(3, 4), padding=(0, 1, 0)) ** 2
    out += F.conv3d(t, win.transpose(2, 4), padding=(1, 0, 0)) ** 2
    np.testing.assert_allclose(got, out.sqrt().numpy(), rtol=1e-5, atol=1e-6)


def test_gauss_matches_torch_conv3d(rng):
    x = rng.random((1, 1, 5, 6, 7)).astype(np.float32)
    got = np.asarray(filter_gauss_separated(jnp.asarray(x)))
    win = torch.tensor([0.25, 0.5, 0.25])[None, None, None, None]
    t = torch.from_numpy(x)
    out = F.conv3d(t, win, padding=(0, 0, 1))
    out = F.conv3d(out, win.transpose(3, 4), padding=(0, 1, 0))
    out = F.conv3d(out, win.transpose(2, 4), padding=(1, 0, 0))
    np.testing.assert_allclose(got, out.numpy(), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("connectivity", [1, 2, 3, 4])
def test_binary_erosion_vs_scipy(rng, connectivity):
    mask = rng.random((10, 12, 9)) > 0.35
    stel = generate_binary_structure(3, connectivity)
    np.testing.assert_array_equal(stel, ndi.generate_binary_structure(3, connectivity))
    got = np.asarray(binary_erosion(jnp.asarray(mask), stel))
    want = ndi.binary_erosion(mask, stel)
    np.testing.assert_array_equal(got, want)


def test_surface_shell_semantics(rng):
    """The reference surface sampler's double-erosion XOR shell
    (compare_feat_sampling.py:19-25)."""
    z, y, x = np.mgrid[:16, :16, :16]
    mask = (z - 8) ** 2 + (y - 8) ** 2 + (x - 8) ** 2 < 36
    stel1 = generate_binary_structure(3, 4)
    stel2 = generate_binary_structure(3, 1)
    outer = np.asarray(binary_erosion(jnp.asarray(mask), stel1))
    inner = np.asarray(binary_erosion(jnp.asarray(outer), stel2))
    got = np.logical_xor(inner, outer)
    souter = ndi.binary_erosion(mask, stel1)
    sinner = ndi.binary_erosion(souter, stel2)
    np.testing.assert_array_equal(got, np.logical_xor(sinner, souter))
    assert got.sum() > 0


def test_fill_holes_vs_scipy_2d_and_3d(rng):
    # 3D hollow sphere
    z, y, x = np.mgrid[:14, :14, :14]
    r2 = (z - 7) ** 2 + (y - 7) ** 2 + (x - 7) ** 2
    shell = (r2 < 30) & (r2 > 12)
    got = np.asarray(binary_fill_holes(jnp.asarray(shell)))
    np.testing.assert_array_equal(got, ndi.binary_fill_holes(shell))
    # random 2D
    m2 = rng.random((20, 20)) > 0.4
    got2 = np.asarray(binary_fill_holes(jnp.asarray(m2)))
    np.testing.assert_array_equal(got2, ndi.binary_fill_holes(m2))


# ---------- connected components ----------

def _partition_equal(got_labels, scipy_labels):
    """Same partition regardless of numbering."""
    got = np.asarray(got_labels).reshape(-1)
    want = np.asarray(scipy_labels).reshape(-1)
    assert (got > 0).sum() == (want > 0).sum()
    # mapping must be one-to-one both ways on foreground
    fg = want > 0
    pairs = set(zip(got[fg].tolist(), want[fg].tolist()))
    assert len(pairs) == len(set(p[0] for p in pairs)) == len(set(p[1] for p in pairs))


def test_connected_components_vs_scipy(rng):
    mask = rng.random((12, 13, 11)) > 0.7
    got = connected_components(jnp.asarray(mask))
    want, _ = ndi.label(mask, structure=ndi.generate_binary_structure(3, 1))
    _partition_equal(got, want)


def test_connected_components_spiral():
    """Elongated component exercising pointer jumping."""
    mask = np.zeros((4, 30, 30), bool)
    mask[1, 1, 1:29] = True
    mask[1, 1:29, 28] = True
    mask[1, 28, 5:28] = True
    mask[3, 0, 0] = True  # separate island
    got = connected_components(jnp.asarray(mask))
    want, nw = ndi.label(mask, structure=ndi.generate_binary_structure(3, 1))
    assert nw == 2
    _partition_equal(got, want)


def test_largest_component_filter(rng):
    mask = np.zeros((10, 10, 10), bool)
    mask[1:5, 1:5, 1:5] = True  # 64 voxels
    mask[7:9, 7:9, 7:9] = True  # 8 voxels
    got = np.asarray(largest_component(jnp.asarray(mask)))
    assert got.sum() == 64 and got[2, 2, 2] and not got[7, 7, 7]


def test_filter_similarity_largest_island(rng):
    sim = np.zeros((8, 8, 8), np.uint8)
    sim[0:3, 0:3, 0:3] = 200
    sim[6:8, 6:8, 6:8] = 180
    sim[4, 4, 4] = 50  # below threshold 69
    out = np.asarray(filter_similarity_largest_island(jnp.asarray(sim)))
    assert out[1, 1, 1] == 200
    assert out[7, 7, 7] == 0  # smaller island removed
    assert out[4, 4, 4] == 0  # below threshold removed


def test_refine_batched_class_chunking_matches_unchunked(monkeypatch):
    """A tiny VITTF_BLS_CHUNK_VOXELS forces the chunked path; results must
    match the single-dispatch batch (same per-class math; ±1 uint8 step
    for batch-size-dependent fusion differences)."""
    import os

    import jax.numpy as jnp

    from vittf_tpu.pipeline.refine import refine_similarities_batched

    rng = np.random.default_rng(8)
    sim_shape = (16, 16, 16)
    vol = rng.random((32, 32, 32)).astype(np.float32)
    sims = np.zeros((5,) + sim_shape, np.float32)
    for c in range(5):
        sims[c, 2:12, 3:13, 2:10] = rng.random((10, 10, 8), np.float32)
    full = np.asarray(
        refine_similarities_batched(jnp.asarray(sims), vol, sim_shape)
    )
    monkeypatch.setenv("VITTF_BLS_CHUNK_VOXELS", "1")  # chunk = 1 class
    chunked = np.asarray(
        refine_similarities_batched(jnp.asarray(sims), vol, sim_shape)
    )
    assert chunked.shape == full.shape and chunked.dtype == full.dtype
    assert np.abs(chunked.astype(np.int16) - full.astype(np.int16)).max() <= 1
    # chunk = 2 classes (budget = 2 crops) → 5 classes pad to 6, tail
    # chunk carries one zero class
    monkeypatch.setenv("VITTF_BLS_CHUNK_VOXELS", "8192")
    chunked2 = np.asarray(
        refine_similarities_batched(jnp.asarray(sims), vol, sim_shape)
    )
    assert np.abs(chunked2.astype(np.int16) - full.astype(np.int16)).max() <= 1


def test_largest_component_native_matches_device(rng):
    """impl='native' (C++ union-find) and impl='device' (label-prop loop)
    agree on 3D masks; 'auto' picks one of them and agrees too."""
    from vittf_tpu.native import available

    if not available():
        import pytest

        pytest.skip("native library unavailable")
    mask = rng.random((24, 20, 16)) > 0.7
    dev = np.asarray(largest_component(jnp.asarray(mask), impl="device"))
    nat = np.asarray(largest_component(jnp.asarray(mask), impl="native"))
    auto = np.asarray(largest_component(jnp.asarray(mask)))
    np.testing.assert_array_equal(dev, nat)
    np.testing.assert_array_equal(auto, nat)


def test_largest_component_2d_native_matches_device(rng):
    """2D masks ride the native path as depth-1 volumes (6-conn == 4-conn)."""
    from vittf_tpu.native import available

    if not available():
        pytest.skip("native library unavailable")
    mask = rng.random((30, 26)) > 0.7
    dev = np.asarray(largest_component(jnp.asarray(mask), impl="device"))
    nat = np.asarray(largest_component(jnp.asarray(mask), impl="native"))
    np.testing.assert_array_equal(dev, nat)
