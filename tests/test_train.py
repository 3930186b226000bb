"""Trainer-layer tests: CNN parity vs torch, gather parity, losses, training."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from vittf_tpu.models.cnn3d import (
    FeatureExtractorConfig,
    PAWSNetConfig,
    feature_extractor_forward,
    init_feature_extractor,
    init_pawsnet,
    pawsnet_forward,
)
from vittf_tpu.train.contrastive import (
    ContrastiveConfig,
    ContrastiveTrainer,
    contrastive_loss_fn,
)
from vittf_tpu.train.gather import gather_receptive_fields, upscale_indices
from vittf_tpu.train.losses import (
    feature_std,
    infonce_loss,
    paws_loss,
    sharpen,
    snn,
    transform_paws_crops,
)


# ---------- FeatureExtractor parity vs torch ----------

class TorchFeatureExtractor(nn.Module):
    """Reference-semantics 3D CNN (old/models.py:50-81)."""

    def __init__(self, in_dim, n_features, n_linear, residual=False):
        super().__init__()
        self.residual = residual
        feats = [in_dim] + list(n_features)

        def layer(n_in, n_out, ks):
            return nn.Sequential(
                nn.Conv3d(n_in, n_out, ks),
                nn.GroupNorm(n_out // 4, n_out),
                nn.Mish(),
            )

        if residual:
            lins = [n_features[-1] + in_dim] + list(n_linear)
            last_in = (
                n_linear[-2] + in_dim if len(n_linear) > 1 else n_features[-1] + in_dim
            )
            self.crop = len(n_features)
        else:
            lins = [n_features[-1]] + list(n_linear)
            last_in = n_linear[-2] if len(n_linear) > 1 else n_features[-1]
        self.convs = nn.Sequential(
            *[layer(a, b, 3) for a, b in zip(feats, feats[1:])]
        )
        self.lins = nn.Sequential(
            *[layer(a, b, 1) for a, b in zip(lins[:-1], lins[1:])]
        )
        self.last = nn.Conv3d(last_in, n_linear[-1], 1)

    def forward(self, x):
        if self.residual:
            i = self.crop
            skip = x[..., i:-i, i:-i, i:-i]
            y = self.convs(x)
            y = self.lins(torch.cat([skip, y], dim=1))
            return self.last(torch.cat([skip, y], dim=1))
        return self.last(self.lins(self.convs(x)))


def _load_torch_from_params(tmodel, params):
    with torch.no_grad():
        for tl, p in zip(tmodel.convs, params["convs"]):
            tl[0].weight.copy_(
                torch.from_numpy(np.asarray(p["conv"]["kernel"])).permute(4, 3, 0, 1, 2)
            )
            tl[0].bias.copy_(torch.from_numpy(np.asarray(p["conv"]["bias"])))
            tl[1].weight.copy_(torch.from_numpy(np.asarray(p["norm"]["scale"])))
            tl[1].bias.copy_(torch.from_numpy(np.asarray(p["norm"]["bias"])))
        for tl, p in zip(tmodel.lins, params["lins"]):
            tl[0].weight.copy_(
                torch.from_numpy(np.asarray(p["conv"]["kernel"])).permute(4, 3, 0, 1, 2)
            )
            tl[0].bias.copy_(torch.from_numpy(np.asarray(p["conv"]["bias"])))
            tl[1].weight.copy_(torch.from_numpy(np.asarray(p["norm"]["scale"])))
            tl[1].bias.copy_(torch.from_numpy(np.asarray(p["norm"]["bias"])))
        tmodel.last.weight.copy_(
            torch.from_numpy(np.asarray(params["last"]["kernel"])).permute(4, 3, 0, 1, 2)
        )
        tmodel.last.bias.copy_(torch.from_numpy(np.asarray(params["last"]["bias"])))


@pytest.mark.parametrize("residual", [False, True])
def test_feature_extractor_parity(rng, residual):
    # n_linear[-2] == n_linear[-1]: the only multi-lin configuration the
    # reference itself can run (see cnn3d.py init comment)
    cfg = FeatureExtractorConfig(1, (8, 16), (16, 16), residual=residual)
    params = init_feature_extractor(cfg, jax.random.PRNGKey(0))
    tmodel = TorchFeatureExtractor(1, (8, 16), (16, 16), residual=residual)
    _load_torch_from_params(tmodel, params)
    x = rng.standard_normal((2, 1, 9, 9, 9)).astype(np.float32)
    got = np.asarray(feature_extractor_forward(params, jnp.asarray(x), cfg, "highest"))
    with torch.no_grad():
        want = tmodel(torch.from_numpy(x)).numpy()
    assert got.shape == want.shape == (2, 16, 5, 5, 5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_feature_extractor_general_linear_sizes(rng):
    """Configurations the reference cannot run (n_linear a≠b) work here."""
    cfg = FeatureExtractorConfig(1, (8,), (16, 8))
    params = init_feature_extractor(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(rng.standard_normal((1, 1, 5, 5, 5)).astype(np.float32))
    out = feature_extractor_forward(params, x, cfg)
    assert out.shape == (1, 8, 3, 3, 3)


def test_pawsnet_forward_shapes(rng):
    cfg = PAWSNetConfig(1, (8, 16), 32, out_classes=3)
    params, state = init_pawsnet(cfg, jax.random.PRNGKey(1))
    x = jnp.asarray(rng.standard_normal((4, 1, 5, 5, 5)).astype(np.float32))
    (feat, pred, clas), new_state = pawsnet_forward(
        params, state, x, cfg, train=True, return_class_pred=True
    )
    assert feat.shape == (4, 16) and pred.shape == (4, 16) and clas.shape == (4, 3)
    # BN running stats updated
    assert not np.allclose(
        np.asarray(new_state["proj"]["bn0"]["mean"]),
        np.asarray(state["proj"]["bn0"]["mean"]),
    )


# ---------- gather ----------

def test_gather_matches_torch_reference(rng):
    vol = rng.random((2, 10, 11, 12)).astype(np.float32)
    centers = np.stack(
        [rng.integers(0, s, 20) for s in (10, 11, 12)], axis=-1
    )
    ks = 3
    got = np.asarray(
        gather_receptive_fields(jnp.asarray(vol), jnp.asarray(centers), ks)
    )
    # torch replica of gather_receiptive_fields2 (old/semisparseconv.py:14-22)
    L = ks // 2
    tv = torch.from_numpy(vol)
    tc = torch.from_numpy(centers)
    pad = F.pad(tv, tuple([L] * 6))
    offsets = [
        [L + i, L + j, L + k]
        for i in range(-L, L + 1)
        for j in range(-L, L + 1)
        for k in range(-L, L + 1)
    ]
    want = (
        torch.stack(
            [
                pad[..., tc[:, 0] + o[0], tc[:, 1] + o[1], tc[:, 2] + o[2]]
                for o in offsets
            ]
        )
        .permute(2, 1, 0)
        .reshape(centers.shape[0], vol.shape[0], ks, ks, ks)
    ).numpy()
    np.testing.assert_allclose(got, want)


def test_upscale_indices():
    idx = jnp.asarray([[0, 1, 2]])
    np.testing.assert_array_equal(np.asarray(upscale_indices(idx, 4)), [[2, 6, 10]])


def test_dense_vs_gathered_crops_equal(rng):
    """The reference's only real correctness test
    (tests/test_sparseconv_equal.py): a dense full-volume forward and a
    forward over gathered receptive-field crops must agree at the crop
    centers. Norm='none' like the reference's Norm=Identity — GroupNorm
    statistics depend on the spatial extent, so equivalence only holds
    without normalization."""
    cfg = FeatureExtractorConfig(1, (8, 8), (8,), norm="none")
    params = init_feature_extractor(cfg, jax.random.PRNGKey(4))
    vol = jnp.asarray(rng.random((1, 12, 13, 14)).astype(np.float32))
    ks = len(cfg.n_features) * 2 + 1  # receptive field
    pad = ks // 2

    # dense: pad so output voxel (i,j,k) sees the crop centered there
    padded = jnp.pad(vol[None], ((0, 0), (0, 0)) + ((pad, pad),) * 3)
    dense = feature_extractor_forward(params, padded, cfg)[0]  # (F, 12, 13, 14)

    centers = np.stack(
        [rng.integers(0, s, 25) for s in (12, 13, 14)], axis=-1
    )
    crops = gather_receptive_fields(vol, jnp.asarray(centers), ks=ks)
    sparse = feature_extractor_forward(params, crops, cfg)
    sparse = sparse.reshape(sparse.shape[0], sparse.shape[1])  # (25, F)

    want = np.asarray(dense[:, centers[:, 0], centers[:, 1], centers[:, 2]]).T
    np.testing.assert_allclose(np.asarray(sparse), want, rtol=1e-4, atol=1e-5)


# ---------- losses ----------

def test_infonce_matches_torch(rng):
    C, BS, N, Fd = 3, 4, 8, 16
    pos = rng.standard_normal((C, 2, BS, Fd)).astype(np.float32)
    neg = rng.standard_normal((C, N, 1, Fd)).astype(np.float32)
    got = float(infonce_loss(jnp.asarray(pos), jnp.asarray(neg)))
    tp, tn = torch.from_numpy(pos), torch.from_numpy(neg)
    pq, nq = F.normalize(tp, dim=-1), F.normalize(tn, dim=-1)
    sim = torch.einsum(
        "cpbf,cnbf->cpbn",
        pq[:, [0]],
        torch.cat([pq[:, [1]], nq.expand(-1, -1, BS, -1)], dim=1),
    ).squeeze(1).reshape(C * BS, N + 1)
    want = F.cross_entropy(sim, torch.zeros(sim.size(0), dtype=torch.long)).item()
    assert abs(got - want) < 1e-5


def test_paws_loss_matches_torch(rng):
    B, M, C, Fd = 6, 10, 3, 8
    av = rng.standard_normal((B, Fd)).astype(np.float32)
    tv = rng.standard_normal((B, Fd)).astype(np.float32)
    sup = rng.standard_normal((M, Fd)).astype(np.float32)
    lab = np.eye(C)[rng.integers(0, C, M)].astype(np.float32)
    got_l, got_m = paws_loss(
        jnp.asarray(av), jnp.asarray(sup), jnp.asarray(lab),
        jnp.asarray(tv), jnp.asarray(sup), jnp.asarray(lab),
    )
    # torch replica (old/paws.py:15-28)
    def tsnn(q, s, l, tau=0.1):
        return F.softmax(
            F.normalize(q, dim=1) @ F.normalize(s, dim=1).T / tau, dim=1
        ) @ l

    def tsharp(p, T):
        sp = p ** (1.0 / T)
        return sp / sp.sum(dim=1, keepdim=True)

    tav, ttv = torch.from_numpy(av), torch.from_numpy(tv)
    tsup, tlab = torch.from_numpy(sup), torch.from_numpy(lab)
    probs = tsnn(tav, tsup, tlab)
    targs = tsharp(tsnn(ttv, tsup, tlab), 0.25)
    targs[targs < 1e-4] *= 0
    want_l = torch.mean(torch.sum(torch.log(probs ** (-targs)), dim=1)).item()
    avg = tsharp(probs, 0.25).mean(dim=0)
    want_m = -torch.sum(torch.log(avg ** (-avg))).item()
    assert abs(float(got_l) - want_l) < 1e-4
    assert abs(float(got_m) - want_m) < 1e-4


def test_sharpen_and_snn_basic(rng):
    p = jnp.asarray(rng.random((4, 3)).astype(np.float32))
    p = p / p.sum(axis=1, keepdims=True)
    s = sharpen(p, 0.25)
    np.testing.assert_allclose(np.asarray(s.sum(axis=1)), 1.0, rtol=1e-5)
    # sharpening moves mass toward the max
    assert (np.asarray(s.max(axis=1)) >= np.asarray(p.max(axis=1)) - 1e-6).all()


def test_transform_paws_crops_shapes(rng):
    crops = jnp.asarray(rng.random((5, 1, 4, 4, 4)).astype(np.float32))
    out = transform_paws_crops(crops, jax.random.PRNGKey(0))
    assert out.shape == (10, 1, 4, 4, 4)


def test_feature_std(rng):
    f = jnp.asarray(rng.standard_normal((3, 2, 5, 8)).astype(np.float32))
    out = feature_std(f)
    assert out.shape == (3,)


# ---------- trainer ----------

def test_contrastive_trainer_learns(rng):
    """Two well-separated intensity classes: loss must drop markedly."""
    labels = np.zeros((16, 16, 16), np.uint8)
    labels[2:8, 2:8, 2:8] = 1
    labels[9:15, 9:15, 9:15] = 2
    vol = (labels == 1) * 0.9 + (labels == 2) * 0.1
    vol = (vol + rng.random(vol.shape) * 0.02).astype(np.float32)
    cfg = ContrastiveConfig(
        model=FeatureExtractorConfig(1, (8,), (8,)),
        rec_field=3, batch_size=8, neg_count=32,
        learning_rate=1e-2, schedule="const", iterations=150,
    )
    trainer = ContrastiveTrainer(vol, labels, cfg, seed=0)
    first = trainer.step()["infonce"]
    for _ in range(149):
        last = trainer.step()["infonce"]
    # untempered cosine InfoNCE floor at perfect separation:
    # ln(1 + N·e⁻²) ≈ 1.674 for N=32 — the loss must approach it
    floor = float(np.log(1 + 32 * np.exp(-2.0)))
    assert last < floor + 0.1, (first, last, floor)
    assert first > floor + 1.0  # sanity: started far from the floor
    feats = trainer.dense_features()
    assert feats.shape[-3:] == vol.shape


def test_dense_features_chunked_and_cross_volume(rng):
    """dense_features(vol) evaluates a DIFFERENT volume with training
    preprocessing, and chunked slab evaluation matches the monolithic
    forward: exactly for norm='none' (VALID convs + halo padding),
    within GN-stat sampling noise for the default GroupNorm."""
    from vittf_tpu.models.cnn3d import FeatureExtractorConfig
    from vittf_tpu.train.dense import (
        DenseContrastiveConfig,
        DenseContrastiveTrainer,
    )

    vol = rng.random((24, 24, 24)).astype(np.float32)
    labels = (rng.random((24, 24, 24)) > 0.7).astype(np.uint8)
    other = rng.random((32, 32, 32)).astype(np.float32)
    for norm in ("none", "group"):
        cfg = DenseContrastiveConfig(
            model=FeatureExtractorConfig(n_features=(4, 8), n_linear=(8,),
                                         norm=norm),
            iterations=1, samples_per_iteration=2, neg_count=16,
        )
        tr = DenseContrastiveTrainer(vol, labels, ["background", "fg"], cfg,
                                     seed=0)
        assert tr.model_cfg.norm == norm  # replace() keeps every field
        tr.step()
        mono = np.asarray(tr.dense_features(other))
        chunked = np.asarray(tr.dense_features(other, chunk=8))
        assert mono.shape == chunked.shape == (8, 32, 32, 32)
        assert np.isfinite(chunked).all() and np.isfinite(mono).all()
        if norm == "none":
            # halo-padded VALID convs: slab == monolithic exactly
            np.testing.assert_allclose(chunked, mono, rtol=1e-5, atol=1e-5)
        # norm='group': GroupNorm statistics are per-slab, so chunked is
        # a (deterministic) variant distribution, not the monolithic
        # forward — downstream A/Bs feed BOTH modes the same chunked
        # features, so their delta is unaffected.


def test_make_optimizer_tiny_iterations_no_nan():
    """onecycle's piecewise intervals collapse at <4 steps (0/0 NaN in
    the schedule) — tiny iteration counts must fall back to constant."""
    import jax.numpy as jnp

    from vittf_tpu.train.contrastive import ContrastiveConfig, make_optimizer

    cfg = ContrastiveConfig(iterations=1)
    opt = make_optimizer(cfg)
    p = {"w": jnp.ones(3)}
    state = opt.init(p)
    up, _ = opt.update({"w": jnp.ones(3)}, state, p)
    assert np.isfinite(np.asarray(up["w"])).all()
