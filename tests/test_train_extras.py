"""Tests: dense trainer, PAWS trainer, MoCo, probes, merge tools, utils."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vittf_tpu.models.cnn3d import FeatureExtractorConfig, PAWSNetConfig
from vittf_tpu.pipeline.merge import cross_axis_cosine, merge_axis_features
from vittf_tpu.train.dense import (
    DenseContrastiveConfig,
    DenseContrastiveTrainer,
    add_pos_encoding,
    drop_labels,
)
from vittf_tpu.train.moco import (
    MoCoConfig,
    dequeue_and_enqueue,
    init_moco_state,
    moco_loss_and_new_state,
    momentum_update,
)
from vittf_tpu.train.paws import PAWSConfig, PAWSTrainer
from vittf_tpu.train.probe import ProbeConfig, ProbeTrainer
from vittf_tpu.train.utils import (
    AverageMeter,
    cluster_kmeans,
    project_pca,
    split_squeeze,
    split_squeeze3d,
)


def _toy_data(rng, size=12):
    mask = np.zeros((size,) * 3, np.uint8)
    mask[2:6, 2:6, 2:6] = 1
    mask[7:11, 7:11, 7:11] = 2
    vol = ((mask == 1) * 0.9 + (mask == 2) * 0.2
           + rng.random(mask.shape) * 0.03).astype(np.float32)
    return vol, mask


def test_add_pos_encoding():
    v = jnp.zeros((1, 4, 5, 6))
    out = add_pos_encoding(v)
    assert out.shape == (4, 4, 5, 6)
    np.testing.assert_allclose(float(out[1].max()), 1.7185, rtol=1e-5)


def test_drop_labels(rng):
    _, mask = _toy_data(rng)
    dropped = drop_labels(mask, 0.5, 3, rng)
    assert (dropped == 1).sum() < (mask == 1).sum()
    assert (dropped == 1).sum() >= int(0.45 * (mask == 1).sum())


def test_dense_trainer_learns(rng):
    vol, mask = _toy_data(rng)
    cfg = DenseContrastiveConfig(
        model=FeatureExtractorConfig(1, (8,), (8,)),
        samples_per_iteration=4, neg_count=64,
        learning_rate=3e-3, schedule="const", iterations=40,
        lambda_std=0.1, lambda_ce=1.0,
    )
    tr = DenseContrastiveTrainer(vol, mask, ["background", "a", "b"], cfg, seed=0)
    first = tr.step()["loss"]
    for _ in range(39):
        last = tr.step()["loss"]
    assert last < first, (first, last)
    val = tr.validate()
    assert set(val) == {"iou_l2", "iou_cosine"}
    assert set(val["iou_l2"]) == {"background", "a", "b"}


def test_paws_trainer_runs(rng):
    vol, mask = _toy_data(rng)
    # mark some voxels unlabeled (class 3 = num_classes)
    mask = mask.copy()
    mask[0:2] = 3
    cfg = PAWSConfig(
        model=PAWSNetConfig(1, (8, 8), 16, out_classes=3),
        supports_per_class=4, batch_size=6,
        learning_rate=0.05, schedule="const", iterations=10,
    )
    tr = PAWSTrainer(vol, mask, ["background", "a", "b"], cfg, seed=0)
    losses = [tr.step()["loss"] for _ in range(5)]
    assert all(np.isfinite(losses))
    pred = tr.predict_dense()
    assert pred.shape == vol.shape


def test_moco_mechanics(rng):
    cfg = MoCoConfig(dim=8, K=32, m=0.9, T=0.07)
    params = {"w": jnp.ones((3, 3))}
    state = init_moco_state(params, jax.random.PRNGKey(0), cfg)
    # momentum update
    new_q = {"w": jnp.full((3, 3), 2.0)}
    upd = momentum_update(new_q, state["params_k"], cfg.m)
    np.testing.assert_allclose(np.asarray(upd["w"]), 0.9 * 1 + 0.1 * 2)
    # queue rotation
    keys = jnp.ones((8, 8))
    q2, ptr = dequeue_and_enqueue(state["queue"], state["queue_ptr"], keys)
    assert ptr == 8
    np.testing.assert_allclose(np.asarray(q2[:, :8]), 1.0)
    # loss
    qf = jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((2, 8, 4)), jnp.float32)
    qf = qf / jnp.linalg.norm(qf, axis=1, keepdims=True)
    kf = kf / jnp.linalg.norm(kf, axis=1, keepdims=True)
    loss, new_state = moco_loss_and_new_state(state, qf, kf, cfg)
    assert np.isfinite(float(loss))
    assert int(new_state["queue_ptr"]) == 8


def test_probe_linear_separable(rng):
    n, f = 400, 16
    w_true = rng.standard_normal((f, 3))
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = (x @ w_true).argmax(-1)
    tr = ProbeTrainer(f, 3, ProbeConfig(epochs=30, learning_rate=5e-3), seed=0)
    losses = tr.fit(x, y)
    assert losses[-1] < losses[0] * 0.5
    # dense prediction path
    fv = jnp.asarray(rng.standard_normal((f, 4, 4, 4)).astype(np.float32))
    pred = tr.predict_dense(fv)
    assert pred.shape == (4, 4, 4)
    assert int(pred.max()) <= 3


def test_probe_mlp_variant(rng):
    tr = ProbeTrainer(8, 2, ProbeConfig(hidden=(32,), epochs=3), seed=0)
    assert len(tr.params) == 2
    x = rng.standard_normal((64, 8)).astype(np.float32)
    y = rng.integers(0, 2, 64)
    assert np.isfinite(tr.fit(x, y)).all()


def test_merge_axis_features(rng):
    a = jnp.asarray(rng.random((4, 6, 6, 6)).astype(np.float32))
    b = jnp.asarray(rng.random((4, 6, 4, 6)).astype(np.float32))
    merged = merge_axis_features([a, b])
    assert merged.shape == (4, 6, 4, 6)
    hist, edges = cross_axis_cosine(a, b)
    assert hist.sum() == 6 * 4 * 6


def test_split_squeeze_helpers(rng):
    vol = jnp.asarray(rng.random((2, 3, 4, 4, 4)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 4, (5, 3)))
    out = vol[split_squeeze(idx, bs=2, f=3)]
    assert out.shape == (2, 3, 5)
    v3 = jnp.asarray(rng.random((4, 4, 4)))
    np.testing.assert_allclose(
        np.asarray(v3[split_squeeze3d(idx)]),
        [float(v3[i, j, k]) for i, j, k in np.asarray(idx)],
    )


def test_kmeans_pca_meter(rng):
    feats = np.concatenate(
        [rng.normal(0, 0.1, (20, 4)), rng.normal(5, 0.1, (20, 4))]
    )
    labels = cluster_kmeans(feats, 2)
    assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1
    proj = project_pca(feats, 2)
    assert proj.shape == (40, 2)
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0


def test_vit_selfsup_trains(rng):
    """Token-contrastive ViT self-supervision: a few steps run, loss is
    finite, params move, and the result feeds extract_features."""
    import jax.numpy as jnp

    from vittf_tpu.models.vit import ViTConfig, init_vit_params
    from vittf_tpu.train.vit_ssl import ViTSelfSupConfig, train_vit_selfsup

    import jax

    vit_cfg = ViTConfig(
        patch_size=8, embed_dim=48, depth=2, num_heads=3, name="tiny"
    )
    params = init_vit_params(vit_cfg, jax.random.PRNGKey(0))
    vol = rng.random((24, 24, 24)).astype("float32")
    cfg = ViTSelfSupConfig(im_sz=16, batch_slices=4, steps=3)
    before = np.asarray(params["blocks"][-1]["qkv"]["kernel"]).copy()
    trained, hist = train_vit_selfsup(vol, params, vit_cfg, cfg, seed=0)
    assert np.isfinite(hist[-1]["loss"])
    after = np.asarray(trained["blocks"][-1]["qkv"]["kernel"])
    assert not np.allclose(before, after)

    from vittf_tpu.pipeline.features import ExtractConfig, extract_features
    feats = extract_features(
        jnp.asarray(vol), trained, vit_cfg,
        ExtractConfig(feature_output_size=4, batch_size=4),
    )["k"]
    assert feats.shape[1:] == (4, 4, 4) and np.isfinite(np.asarray(feats)).all()


def test_vit_selfsup_dino_trains(rng):
    """EMA-teacher distillation (method='dino', the >=0.5-mIoU oracle's
    objective): steps run, loss is finite and falls, the returned TEACHER
    backbone differs from init, and the pytree matches extraction's."""
    import jax
    import jax.numpy as jnp

    from vittf_tpu.models.vit import ViTConfig, init_vit_params
    from vittf_tpu.train.vit_ssl import (
        VIT_SSL_ORACLE,
        ViTSelfSupConfig,
        train_vit_selfsup,
    )

    vit_cfg = ViTConfig(
        patch_size=8, embed_dim=48, depth=2, num_heads=3, name="tiny"
    )
    params = init_vit_params(vit_cfg, jax.random.PRNGKey(0))
    vol = rng.random((24, 24, 24)).astype("float32")
    cfg = ViTSelfSupConfig(
        **{**VIT_SSL_ORACLE, "im_sz": 16, "batch_slices": 4, "steps": 8,
           "proto_k": 16, "proj_dim": 32, "bottleneck_dim": 16}
    )
    before = np.asarray(params["blocks"][-1]["qkv"]["kernel"]).copy()
    trained, hist = train_vit_selfsup(vol, params, vit_cfg, cfg, seed=0)
    assert np.isfinite([h["loss"] for h in hist]).all()
    assert jax.tree.structure(trained) == jax.tree.structure(params)
    after = np.asarray(trained["blocks"][-1]["qkv"]["kernel"])
    assert not np.allclose(before, after)
