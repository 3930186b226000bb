"""Similarity engine parity tests vs torch replicas of predict_ntf.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vittf_tpu.ops.similarity import (
    class_mean_matrix,
    fused_similarity,
    similarity_pallas,
    similarity_xla,
)
from vittf_tpu.pipeline.ntf import (
    compute_similarities,
    fuse_predictions,
    quantize_uint8_torch,
)


def _torch_sims_from_qf(features_t, qf, counts, mean_first):
    # einsum 'fwhd,caf->cawhd' semantics, per predict_ntf.py:62-72
    if mean_first:
        sims = torch.einsum("fwhd,af->whd", features_t, qf) / qf.shape[0]
        sims = sims[None]
        out = torch.where(sims >= 0.25, sims, torch.zeros(1)) ** 2.5
        return out  # (1, W, H, D); mean over singleton annotation dim implicit
    outs = []
    idx = 0
    for n in counts:
        q = qf[idx : idx + n]
        idx += n
        s = torch.einsum("fwhd,af->awhd", features_t, q)
        s = torch.where(s >= 0.25, s, torch.zeros(1)) ** 2.5
        outs.append(s.mean(dim=0))
    return torch.stack(outs)


@pytest.mark.parametrize("mean_first", [False, True])
def test_similarity_xla_vs_torch(rng, mean_first):
    N, F_dim = 200, 16
    counts = [7] if mean_first else [7, 5, 3]
    A = sum(counts)
    feats = rng.standard_normal((N, F_dim)).astype(np.float32) * 0.3
    qf = rng.standard_normal((A, F_dim)).astype(np.float32) * 0.3
    m = jnp.asarray(class_mean_matrix(counts, A))
    got = np.asarray(
        similarity_xla(jnp.asarray(feats), jnp.asarray(qf), m, mean_first=mean_first)
    )
    # torch oracle on flattened "volume"
    ft = torch.from_numpy(feats.T.reshape(F_dim, N, 1, 1))
    want = (
        _torch_sims_from_qf(ft, torch.from_numpy(qf), counts, mean_first)
        .reshape(len(counts), N)
        .T.numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mean_first", [False, True])
def test_similarity_pallas_interpret_vs_xla(rng, mean_first):
    """Pallas kernel (interpret mode on CPU) must match the XLA path."""
    N, F_dim = 300, 24
    counts = [1500] if mean_first else [9, 4]
    A = sum(counts)
    feats = (rng.standard_normal((N, F_dim)) * 0.3).astype(np.float32)
    qf = (rng.standard_normal((A, F_dim)) * 0.1).astype(np.float32)
    m = jnp.asarray(class_mean_matrix(counts, A))
    want = np.asarray(
        similarity_xla(jnp.asarray(feats), jnp.asarray(qf), m, mean_first=mean_first)
    )
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            similarity_pallas(
                jnp.asarray(feats), jnp.asarray(qf), m, mean_first=mean_first
            )
        )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mean_first", [False, True])
def test_similarity_class_major_layout(rng, mean_first):
    """out_layout='cn' (lane-dense class-major store) must equal the 'nc'
    result transposed — XLA path exactly, Pallas interpret to tolerance."""
    N, F_dim = 280, 16
    counts = [1500] if mean_first else [5, 7, 3]
    A = sum(counts)
    feats = (rng.standard_normal((N, F_dim)) * 0.3).astype(np.float32)
    qf = (rng.standard_normal((A, F_dim)) * 0.1).astype(np.float32)
    m = jnp.asarray(class_mean_matrix(counts, A))
    want = np.asarray(
        similarity_xla(jnp.asarray(feats), jnp.asarray(qf), m, mean_first=mean_first)
    ).T
    got_x = np.asarray(
        similarity_xla(
            jnp.asarray(feats), jnp.asarray(qf), m, mean_first=mean_first,
            out_layout="cn",
        )
    )
    assert got_x.shape == (len(counts), N)
    np.testing.assert_allclose(got_x, want, rtol=1e-5, atol=1e-6)

    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got_p = np.asarray(
            similarity_pallas(
                jnp.asarray(feats), jnp.asarray(qf), m, mean_first=mean_first,
                out_layout="cn",
            )
        )
    np.testing.assert_allclose(got_p, want, rtol=1e-4, atol=1e-5)


def test_empty_class_does_not_crash(rng):
    """A zero-annotation class (mid-annotation GUI state) yields an all-zero
    column instead of a ZeroDivisionError."""
    m = class_mean_matrix([3, 0, 2], 5)
    assert m.shape == (5, 3)
    assert (m[:, 1] == 0).all()
    sims = compute_similarities(
        jnp.asarray(rng.random((8, 8, 8)).astype(np.float32)),
        jnp.asarray(rng.standard_normal((4, 4, 4, 4)).astype(np.float32)),
        {"a": rng.integers(0, 8, (3, 3)), "empty": np.zeros((0, 3), np.int64)},
        impl="xla",
    )
    assert set(sims) == {"a", "empty"}
    assert np.asarray(sims["a"]).shape == (4, 4, 4)


def test_torch_uint8_cast_semantics():
    """Confirm the reference's float→uint8 wraparound that we replicate."""
    vals = torch.tensor([0.0, 0.9, 1.2, 254.9, 255.1, 257.6, 511.9])
    want = vals.to(torch.uint8).numpy()
    got = np.asarray(quantize_uint8_torch(jnp.asarray(vals.numpy())))
    np.testing.assert_array_equal(got, want)


def test_compute_similarities_end_to_end(rng):
    """Full no-BLS path vs a torch replica of predict_ntf.py:24-101."""
    W, H, D = 12, 14, 16
    F_dim = 8
    Wf, Hf, Df = 6, 7, 8
    volume = rng.random((W, H, D)).astype(np.float32)
    features = (rng.standard_normal((F_dim, Wf, Hf, Df)) * 0.4).astype(np.float32)
    annotations = {
        "liver": rng.integers(0, min(W, H, D), (9, 3)).astype(np.int64),
        "bone": rng.integers(0, min(W, H, D), (4, 3)).astype(np.int64),
    }
    got = compute_similarities(
        jnp.asarray(volume), jnp.asarray(features), annotations, impl="xla"
    )

    # ---- torch replica ----
    ft = torch.from_numpy(features)
    abs_coords = torch.from_numpy(
        np.concatenate(list(annotations.values())).astype(np.float32)
    )
    extent = torch.tensor([[W, H, D]], dtype=torch.float32)
    rel = (abs_coords + 0.5) / extent * 2.0 - 1.0
    grid = rel.flip(-1)[None, None, :, None, :]
    qf = (
        F.grid_sample(ft[None], grid, mode="bilinear", align_corners=False)
        .squeeze(-1)
        .permute(0, 2, 3, 1)[0, 0]
    )  # (ΣA, F)
    counts = [9, 4]
    sims = _torch_sims_from_qf(ft, qf, counts, mean_first=False)
    sim_shape = (W // 2, H // 2, D // 2)
    for c, name in enumerate(annotations):
        sim = sims[c]
        quant = 0.99 * sim.max()
        sim_u8 = (255.0 / quant * sim).to(torch.uint8)
        sim_u8 = (
            F.interpolate(
                sim_u8[None, None].float(), size=sim_shape, mode="nearest"
            )
            .squeeze()
            .to(torch.uint8)
        )
        want = sim_u8.numpy()
        np.testing.assert_array_equal(np.asarray(got[name]), want)


def test_compute_similarities_with_bilateral_solver(rng):
    """BLS branch smoke test: shapes, dtype, finiteness (full parity of the
    solver itself is covered by tests/test_bilateral.py)."""
    W, H, D = 16, 16, 16
    volume = rng.random((W, H, D)).astype(np.float32)
    features = (rng.standard_normal((6, 8, 8, 8)) * 0.5).astype(np.float32)
    annotations = {"liver": rng.integers(0, 16, (6, 3)).astype(np.int64)}
    got = compute_similarities(
        jnp.asarray(volume), jnp.asarray(features), annotations,
        bilateral_solver=True, impl="xla",
    )
    sim = np.asarray(got["liver"])
    assert sim.shape == (8, 8, 8) and sim.dtype == np.uint8


def test_fuse_predictions_semantics(rng):
    sims = {
        n: jnp.asarray(rng.integers(0, 256, (6, 6, 6), dtype=np.uint8))
        for n in ["liver", "bladder", "lung", "kidney", "bone"]
    }
    got = np.asarray(fuse_predictions(sims))
    # torch replica (predict_ntf.py:205-215)
    tsims = torch.stack([torch.from_numpy(np.asarray(v)) for v in sims.values()])
    pred = torch.zeros_like(tsims[0])
    pred_vals = torch.zeros_like(tsims[0])
    ths = [0.486, 0.264, 0.236, 0.68, 0.291]
    for i, sim in enumerate(tsims):
        mask = (sim > int(ths[i] * 255)) & (sim > pred_vals)
        pred[mask] = i + 1
        pred_vals[mask] = sim[mask]
    np.testing.assert_array_equal(got, pred.numpy().astype(np.uint8))


def test_fuse_predictions_host_matches_device(rng):
    """The serve loop fuses predictions on HOST from cached uint8 maps
    (zero D2H per frame); it must be bit-identical to the device fuse,
    including the >5-class threshold padding and max-sim tie-breaks."""
    from vittf_tpu.pipeline.ntf import fuse_predictions_host

    for n_cls in (2, 5, 7):
        sims_np = {
            f"c{i}": rng.integers(0, 256, (6, 6, 6), dtype=np.uint8)
            for i in range(n_cls)
        }
        # force exact ties so the first-class-wins order is exercised
        sims_np["c1"][:2] = sims_np["c0"][:2]
        sims_dev = {k: jnp.asarray(v) for k, v in sims_np.items()}
        np.testing.assert_array_equal(
            fuse_predictions_host(sims_np),
            np.asarray(fuse_predictions(sims_dev)),
        )
