"""Tests for the sampling-strategy comparison flow (C13 __main__ parity)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from vittf_tpu.pipeline.compare_sampling import (
    compare_sampling_strategies,
    normalize_features,
    quantize_quantile_u8,
    sampling_similarity_map,
)


def test_similarity_map_matches_torch_reference(rng):
    """Mean of squared dots + quantile quantization vs a torch replica of
    compare_feat_sampling.py:71-83."""
    F_dim, W, H, D = 8, 6, 7, 8
    feats = (rng.standard_normal((F_dim, W, H, D)) * 0.5).astype(np.float32)
    coords = np.stack(
        [rng.integers(0, s, 13) for s in (W, H, D)], axis=-1
    ).astype(np.float32)

    fn = normalize_features(jnp.asarray(feats))
    got = sampling_similarity_map(fn, coords, impl="xla")
    got_u8 = np.asarray(quantize_quantile_u8(got))

    # torch replica
    tf = torch.from_numpy(feats)
    tf = F.normalize(tf, dim=0)
    extent = torch.tensor([[W, H, D]], dtype=torch.float32)
    rel = (torch.from_numpy(coords) + 0.5) / extent * 2.0 - 1.0
    grid = rel.flip(-1)[None, None, :, None, :]
    qf = (
        F.grid_sample(tf[None], grid, mode="bilinear", align_corners=False)
        .squeeze(-1).permute(0, 2, 3, 1)[0, 0]
    )
    sim = (torch.einsum("fwhd,nf->nwhd", tf, qf) ** 2.0).mean(dim=0)
    want_u8 = (
        (255.0 / sim.quantile(q=0.9999) * sim).clamp(0, 255).to(torch.uint8)
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), sim.numpy(), rtol=1e-4, atol=1e-5)
    # quantile interpolation matches torch linear default; allow off-by-one
    assert np.abs(got_u8.astype(int) - want_u8.astype(int)).max() <= 1


def test_compare_sampling_strategies_artifacts(tmp_path, rng):
    F_dim = 6
    labels = np.zeros((8, 8, 8), np.uint8)
    labels[2:6, 2:6, 2:6] = 1
    feats = rng.standard_normal((F_dim, 8, 8, 8)).astype(np.float32)
    written = compare_sampling_strategies(
        jnp.asarray(feats), labels, 16, tmp_path, samplers=("uniform",),
        rng=rng, impl="xla",
    )
    assert "1_uniform" in written
    arr = np.load(written["1_uniform"])
    assert arr.dtype == np.uint8 and arr.shape == (8, 8, 8)
