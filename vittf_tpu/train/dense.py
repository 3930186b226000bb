"""Dense contrastive trainer (reference old/train.py).

Full-volume forward each step: the CNN runs over the entire (padded)
volume, voxel features are gathered at sampled class indices, and InfoNCE
(+ a CE classification head + cluster-std regularizer) is minimized.
Includes the reference's positional-encoding channels (z,y,x ∈ [-1,1]
scaled by 1.7185, old/train.py:82-88) and label-percentage dropping
(:60-69). Validation computes cluster centers and L2/cosine segmentations
with per-class IoU (:173-220 capability).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vittf_tpu.models.cnn3d import (
    FeatureExtractorConfig,
    feature_extractor_forward,
    init_feature_extractor,
)
from vittf_tpu.train.contrastive import make_optimizer
from vittf_tpu.utils.tensor import norm_mean_std

POS_ENCODING_SCALE = 1.7185  # old/train.py:87


@dataclass(frozen=True)
class DenseContrastiveConfig:
    model: FeatureExtractorConfig = FeatureExtractorConfig()
    pos_encoding: bool = True
    normalize: bool = True
    samples_per_iteration: int = 8
    neg_count: int = 4096
    # InfoNCE temperature. 1.0 = reference parity (old/train.py:145 uses
    # raw cosine logits). Raw-cosine logits bound the per-pair loss floor
    # at ln(1 + N·e⁻²), which stops separating CLASSES from each other
    # once foreground/background split — measured feature collapse onto
    # one axis (all class anchors ≈ -background direction). τ≈0.07-0.1
    # restores inter-class separation; used by the quality oracle.
    temperature: float = 1.0
    lambda_std: float = 1.0
    lambda_ce: float = 1.0
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    schedule: str = "onecycle"
    iterations: int = 1000
    label_percentage: float = 1.0
    background_class: str = "background"

    @property
    def rec_field(self) -> int:
        return len(self.model.n_features) * 2 + 1


def add_pos_encoding(vol: jnp.ndarray) -> jnp.ndarray:
    """(C, Z, Y, X) → (C+3, Z, Y, X) with scaled linspace coords."""
    z, y, x = [
        jnp.linspace(-1.0, 1.0, s) for s in vol.shape[-3:]
    ]
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    coords = jnp.stack([zz, yy, xx]) * POS_ENCODING_SCALE
    return jnp.concatenate([vol, coords.astype(vol.dtype)], axis=0)


def drop_labels(
    mask: np.ndarray, label_percentage: float, num_classes: int,
    rng: np.random.Generator, drop_to: int = 0,
) -> np.ndarray:
    """Simulate sparse annotations: set (1-p) of each class's voxels to
    ``drop_to`` (old/train.py:60-69 / train_semisup_sparse.py:63-71)."""
    if label_percentage >= 1.0:
        return mask
    out = mask.copy()
    for c in range(num_classes):
        idx = np.argwhere(mask == c)
        if idx.shape[0] == 0:
            continue
        n_drop = int((1.0 - label_percentage) * idx.shape[0])
        sel = rng.choice(idx.shape[0], n_drop, replace=False)
        out[tuple(idx[sel].T)] = drop_to
    return out


@partial(jax.jit, static_argnames=("cfg", "opt", "num_classes"))
def _dense_step(
    params, head_params, opt_state, vol, pos_idx, neg_idx, pos_cls, std_idx,
    cfg: DenseContrastiveConfig, opt, num_classes: int,
):
    """pos_idx (S, 2, 3) pairs; neg_idx (S, N, 3); pos_cls (S,) class ids;
    std_idx (C, K, 3) per-class voxel samples for the std regularizer."""
    pad = cfg.rec_field // 2

    def loss_fn(p):
        params_, head_ = p
        padded = jnp.pad(vol[None], ((0, 0), (0, 0)) + ((pad, pad),) * 3)
        feats = feature_extractor_forward(params_, padded, cfg.model)[0]
        q = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=0, keepdims=True), 1e-12
        )  # (F, Z, Y, X)

        def gather(idx):  # (..., 3) → (..., F)
            return q[:, idx[..., 0], idx[..., 1], idx[..., 2]]

        pos = gather(pos_idx)  # (F, S, 2)
        neg = gather(neg_idx)  # (F, S, N)
        anchor = pos[:, :, :1]
        keys = jnp.concatenate([pos[:, :, 1:], neg], axis=-1)  # (F, S, 1+N)
        sim = jnp.einsum("fsp,fsn->spn", anchor, keys)[:, 0]  # (S, 1+N)
        logp = jax.nn.log_softmax(sim / cfg.temperature, axis=-1)
        infonce = -logp[:, 0].mean() * pos_idx.shape[0]  # summed like reference

        loss = infonce
        aux = {"infonce": infonce}
        if cfg.lambda_ce > 0:
            # classification head on the normalized positives (old/train.py:147)
            cls_logits = (
                jnp.einsum("fsp->spf", pos).reshape(-1, pos.shape[0])
                @ head_["kernel"] + head_["bias"]
            )
            labels = jnp.repeat(pos_cls, 2)
            ce = -jax.nn.log_softmax(cls_logits)[jnp.arange(labels.shape[0]), labels].mean()
            loss = loss + cfg.lambda_ce * ce
            aux["ce"] = ce
        if cfg.lambda_std > 0:
            # reference: sum over classes of the global std of each class's
            # normalized features (old/train.py:155); estimated here over K
            # sampled voxels per class
            cls_feats = gather(std_idx)  # (F, C, K)
            std = cls_feats.std(axis=(0, 2)).sum()
            loss = loss + cfg.lambda_std * std
            aux["std"] = std
        aux["loss"] = loss
        return loss, aux

    (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        (params, head_params)
    )
    updates, opt_state = opt.update(grads, opt_state, (params, head_params))
    params, head_params = optax.apply_updates((params, head_params), updates)
    return params, head_params, opt_state, aux


class DenseContrastiveTrainer:
    """Host driver for the dense contrastive trainer."""

    def __init__(
        self,
        vol: np.ndarray,
        mask: np.ndarray,
        labels: list[str],
        cfg: DenseContrastiveConfig = DenseContrastiveConfig(),
        seed: int = 0,
    ):
        self.cfg = cfg
        self.labels = labels
        self.rng = np.random.default_rng(seed)
        self.num_classes = len(labels)

        mask = drop_labels(
            np.asarray(mask), cfg.label_percentage, self.num_classes, self.rng
        )
        v = jnp.asarray(vol, jnp.float32)
        if cfg.normalize:
            v = norm_mean_std(v)
        v = v[None]
        if cfg.pos_encoding:
            v = add_pos_encoding(v)
        self.vol = v

        import dataclasses

        # replace() keeps EVERY model field (a field-by-field rebuild
        # silently dropped 'norm' when it was added to the config)
        model_cfg = dataclasses.replace(cfg.model, in_dim=int(v.shape[0]))
        self.model_cfg = model_cfg
        self.cfg = dataclasses.replace(cfg, model=model_cfg)

        self.class_indices = {
            n: np.argwhere(mask == i) for i, n in enumerate(labels)
        }
        self.fg_classes = [
            (i, n)
            for i, n in enumerate(labels)
            if n != cfg.background_class and self.class_indices[n].shape[0] >= 2
        ]
        if len(labels) < 2:
            raise ValueError(
                "dense trainer needs >= 2 label names (mask value i maps to "
                "labels[i]; include the background name as class 0 — the "
                "reference old/train.py data contract)"
            )
        key = jax.random.PRNGKey(seed)
        self.params = init_feature_extractor(model_cfg, key)
        nf = model_cfg.n_linear[-1]
        bound = (1.0 / nf) ** 0.5
        k1, k2 = jax.random.split(key)
        self.head_params = {
            "kernel": jax.random.uniform(k1, (nf, self.num_classes), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(k2, (self.num_classes,), jnp.float32, -bound, bound),
        }
        self.opt = make_optimizer(self.cfg)
        self.opt_state = self.opt.init((self.params, self.head_params))
        self.history: list[dict] = []

    def step(self, std_samples: int = 256) -> dict:
        S = self.cfg.samples_per_iteration
        pos, neg, cls = [], [], []
        for _ in range(S):
            for i, n in self.fg_classes:
                own = self.class_indices[n]
                other = np.concatenate(
                    [v for m, v in self.class_indices.items() if m != n]
                )
                pos.append(own[self.rng.choice(own.shape[0], 2, replace=False)])
                neg.append(other[self.rng.choice(other.shape[0], self.cfg.neg_count)])
                cls.append(i)
        std_idx = np.stack(
            [
                idx[self.rng.choice(idx.shape[0], std_samples)]
                if idx.shape[0]
                else np.zeros((std_samples, 3), np.int64)
                for idx in self.class_indices.values()
            ]
        )
        self.params, self.head_params, self.opt_state, aux = _dense_step(
            self.params, self.head_params, self.opt_state, self.vol,
            jnp.asarray(np.stack(pos)), jnp.asarray(np.stack(neg)),
            jnp.asarray(np.asarray(cls)), jnp.asarray(std_idx),
            self.cfg, self.opt, self.num_classes,
        )
        rec = {k: float(v) for k, v in aux.items()}
        self.history.append(rec)
        return rec

    def dense_features(self, vol=None, chunk: int | None = None) -> jnp.ndarray:
        """Full-resolution feature volume of the training volume, or of
        ``vol`` (preprocessed identically: normalize + pos encoding).

        The separate-volume path lets callers train at a small size and
        evaluate dense features at a larger one — the train step's
        backward holds several full-volume activation tensors (75 GB at
        256³) and OOMs where the forward alone fits. Past ~128³ even the
        forward's intermediate stack exceeds HBM, so ``chunk`` (default:
        auto, 64-slab past 128³) runs halo-padded z-slabs — every conv
        sees rec_field//2 of real context, so the conv stack is exact;
        with norm='group' the GroupNorm spatial statistics are per-slab
        (millions of voxels each), making slab outputs approximate to
        within GN-stat sampling noise (bounded in tests). norm='none'
        chunks exactly.
        """
        if vol is None:
            v = self.vol
        else:
            v = jnp.asarray(vol, jnp.float32)
            if self.cfg.normalize:
                v = norm_mean_std(v)
            v = v[None]
            if self.cfg.pos_encoding:
                v = add_pos_encoding(v)
        pad = self.cfg.rec_field // 2
        Z = v.shape[1]
        if chunk is None and Z > 128:
            chunk = 64
        padded = jnp.pad(v[None], ((0, 0), (0, 0)) + ((pad, pad),) * 3)
        if not chunk or chunk >= Z:
            return feature_extractor_forward(
                self.params, padded, self.model_cfg
            )[0]
        outs = []
        for z0 in range(0, Z, chunk):
            z1 = min(z0 + chunk, Z)
            # output rows [z0, z1) need padded rows [z0, z1 + 2·pad)
            slab = padded[:, :, z0 : z1 + 2 * pad]
            outs.append(
                feature_extractor_forward(self.params, slab, self.model_cfg)[0]
            )
        return jnp.concatenate(outs, axis=1)

    def validate(self) -> dict:
        """Cluster centers → L2/cosine segmentations → per-class IoU
        (old/train.py:173-220 capability)."""
        from vittf_tpu.pipeline.evaluate import confusion_matrix, metrics_from_confusion

        feats = self.dense_features()
        q = feats / jnp.maximum(jnp.linalg.norm(feats, axis=0, keepdims=True), 1e-12)
        centers_l2, centers_cos = [], []
        for n in self.labels:
            idx = self.class_indices[n]
            if idx.shape[0] == 0:
                centers_l2.append(jnp.zeros(feats.shape[0]))
                centers_cos.append(jnp.zeros(feats.shape[0]))
                continue
            sel = feats[:, idx[:, 0], idx[:, 1], idx[:, 2]]
            selq = q[:, idx[:, 0], idx[:, 1], idx[:, 2]]
            centers_l2.append(sel.mean(axis=1))
            c = selq.mean(axis=1)
            centers_cos.append(c / jnp.maximum(jnp.linalg.norm(c), 1e-12))
        cl2 = jnp.stack(centers_l2)
        ccos = jnp.stack(centers_cos)

        d_l2 = jnp.linalg.norm(
            feats[None] - cl2[:, :, None, None, None], axis=1
        )
        seg_l2 = jnp.argmin(d_l2, axis=0)
        d_cos = jnp.clip(jnp.einsum("fzyx,nf->nzyx", q, ccos), 0, 1)
        seg_cos = jnp.argmax(d_cos, axis=0)

        # ground truth from stored class indices
        gt = np.zeros(self.vol.shape[-3:], np.int32)
        for i, n in enumerate(self.labels):
            idx = self.class_indices[n]
            gt[idx[:, 0], idx[:, 1], idx[:, 2]] = i
        out = {}
        for name, seg in (("l2", seg_l2), ("cosine", seg_cos)):
            cm = confusion_matrix(
                jnp.asarray(gt.reshape(-1)), seg.reshape(-1), self.num_classes
            )
            m = metrics_from_confusion(cm)
            out[f"iou_{name}"] = dict(
                zip(self.labels, np.asarray(m["iou"]).tolist())
            )
        return out
