"""Sparse-annotation contrastive trainer (reference old/train_semisparse.py).

Each step draws 2·BS positive voxels per class and NEG negatives, gathers
their k³ receptive fields, runs the 3D CNN and minimizes InfoNCE (+
optional cluster-std compactness). The optimizer is optax RAdam with the
reference's OneCycle/cosine schedule options; the whole step is one jitted
function whose gradient psums across the ``data`` mesh axis under DP.

Reference mapping:
- voxel sampling             old/train_semisparse.py:161-168 (host, numpy)
- receptive-field gather     old/semisparseconv.py → train/gather.py
- InfoNCE + std loss         :189-206 → train/losses.py
- RAdam + OneCycle/Cosine    :154-156
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
from vittf_tpu.train.gather import gather_receptive_fields
from vittf_tpu.train.losses import feature_std, infonce_loss


@dataclass(frozen=True)
class ContrastiveConfig:
    model: FeatureExtractorConfig = FeatureExtractorConfig()
    rec_field: int = 7  # crop size: must reduce to 1³ through the convs
    batch_size: int = 32  # BS positives per class (2·BS drawn)
    neg_count: int = 1024
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    lambda_std: float = 0.0
    std_loss_on: str = "logits"  # 'logits' | 'cosine'
    schedule: str = "onecycle"  # 'onecycle' | 'cosine' | 'const'
    iterations: int = 1000


def make_optimizer(cfg: ContrastiveConfig) -> optax.GradientTransformation:
    if cfg.iterations < 4:
        # onecycle's piecewise-interpolate boundaries collapse to
        # zero-width intervals below a handful of steps → 0/0 NaN in the
        # schedule itself, which then NaNs every update. Tiny iteration
        # counts (smoke tests, probes) get a constant rate instead.
        lr = cfg.learning_rate
    elif cfg.schedule == "onecycle":
        lr = optax.cosine_onecycle_schedule(cfg.iterations, cfg.learning_rate)
    elif cfg.schedule == "cosine":
        lr = optax.cosine_decay_schedule(cfg.learning_rate, cfg.iterations)
    else:
        lr = cfg.learning_rate
    opt = optax.radam(lr)
    if cfg.weight_decay > 0:
        opt = optax.chain(optax.add_decayed_weights(cfg.weight_decay), opt)
    return opt


def contrastive_loss_fn(params, vol4, pos_centers, neg_centers, cfg: ContrastiveConfig):
    """vol4 (C_in, Z, Y, X); pos (C, 2·BS, 3); neg (C, N, 3) voxel centers."""
    C, twoBS, _ = pos_centers.shape
    N = neg_centers.shape[1]
    BS = twoBS // 2
    centers = jnp.concatenate(
        [pos_centers.reshape(-1, 3), neg_centers.reshape(-1, 3)], axis=0
    )
    crops = gather_receptive_fields(vol4, centers, ks=cfg.rec_field)
    feats = feature_extractor_forward(params, crops, cfg.model)
    feats = feats.reshape(feats.shape[0], feats.shape[1])  # (·, F)
    NF = feats.shape[-1]
    pos_feat = feats[: C * twoBS].reshape(C, 2, BS, NF)
    neg_feat = feats[C * twoBS :].reshape(C, N, 1, NF)
    loss = infonce_loss(pos_feat, neg_feat)
    aux = {"infonce": loss}
    if cfg.lambda_std > 0:
        f = pos_feat if cfg.std_loss_on == "logits" else (
            pos_feat / jnp.maximum(jnp.linalg.norm(pos_feat, axis=-1, keepdims=True), 1e-12)
        )
        std = feature_std(f).sum(0)
        loss = loss + cfg.lambda_std * std
        aux["std"] = std
    aux["loss"] = loss
    return loss, aux


@partial(jax.jit, static_argnames=("cfg", "opt"))
def train_step(params, opt_state, vol4, pos_centers, neg_centers, cfg, opt):
    grad_fn = jax.value_and_grad(contrastive_loss_fn, has_aux=True)
    (_, aux), grads = grad_fn(params, vol4, pos_centers, neg_centers, cfg)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, aux


class ContrastiveTrainer:
    """Host-side driver: class-index sampling + jitted train steps."""

    def __init__(self, vol: np.ndarray, labels: np.ndarray,
                 cfg: ContrastiveConfig = ContrastiveConfig(), seed: int = 0):
        self.cfg = cfg
        self.vol4 = jnp.asarray(vol, jnp.float32)[None]
        self.rng = np.random.default_rng(seed)
        self.class_indices = {
            int(c): np.argwhere(labels == c)
            for c in np.unique(labels)
            if c != 0
        }
        self.params = init_feature_extractor(
            cfg.model, jax.random.PRNGKey(seed)
        )
        self.opt = make_optimizer(cfg)
        self.opt_state = self.opt.init(self.params)
        self.history: list[dict] = []

    @classmethod
    def from_rle_annotations(
        cls, vol: np.ndarray, annotation: dict[str, np.ndarray],
        cfg: ContrastiveConfig = ContrastiveConfig(), seed: int = 0,
    ) -> "ContrastiveTrainer":
        """Build a trainer from an RLE annotation export.

        The reference's ``_old`` trainer variant consumed GUI annotations
        through an external RLE decoder (old/train_semisparse_old.py:14,
        ``from rle_shit import decode_from_annotation``); this is that
        input path: per-class runs → voxel coordinates → class_indices.

        Class ids are assigned 1..K in the annotation dict's insertion
        order (matching the exporting GUI's label order), with empty
        classes skipped so the id sequence has no gaps; the mapping is
        recorded in ``self.class_names`` ({id: name}).
        """
        from vittf_tpu.core.rle import decode_from_annotation

        coords = decode_from_annotation(annotation, tuple(np.shape(vol)))
        self = cls(vol, np.zeros(np.shape(vol), np.int32), cfg=cfg, seed=seed)
        names = [n for n in coords if coords[n].shape[0] > 0]
        self.class_indices = {
            i + 1: np.asarray(coords[n]) for i, n in enumerate(names)
        }
        self.class_names = {i + 1: n for i, n in enumerate(names)}
        return self

    def _choice(self, n_avail, n_want):
        # torch.multinomial draws without replacement (old/train_semisparse
        # :161-168); fall back to replacement only when the class is smaller
        # than the request
        return self.rng.choice(n_avail, size=n_want, replace=n_avail < n_want)

    def _draw(self, n_per_class):
        out = []
        for c, idxs in sorted(self.class_indices.items()):
            out.append(idxs[self._choice(idxs.shape[0], n_per_class)])
        return jnp.asarray(np.stack(out))

    def _draw_negatives(self, n):
        """Negatives for class c come from all other classes (reference
        different_sample_idxs, old/train_semisparse.py:164-168)."""
        out = []
        classes = sorted(self.class_indices)
        for c in classes:
            other = np.concatenate(
                [self.class_indices[o] for o in classes if o != c]
            )
            out.append(other[self._choice(other.shape[0], n)])
        return jnp.asarray(np.stack(out))

    def step(self):
        pos = self._draw(2 * self.cfg.batch_size)
        neg = self._draw_negatives(self.cfg.neg_count)
        self.params, self.opt_state, aux = train_step(
            self.params, self.opt_state, self.vol4, pos, neg, self.cfg, self.opt
        )
        rec = {k: float(v) for k, v in aux.items()}
        self.history.append(rec)
        return rec

    def dense_features(self, vol: np.ndarray | None = None) -> jnp.ndarray:
        """Full-volume forward for validation (old/train_semisparse.py:229-252).

        Pads so output aligns voxel-for-voxel with the input volume.
        """
        v = self.vol4 if vol is None else jnp.asarray(vol, jnp.float32)[None]
        pad = len(self.cfg.model.n_features)
        v = jnp.pad(v[None], ((0, 0), (0, 0)) + ((pad, pad),) * 3)
        return feature_extractor_forward(self.params, v, self.cfg.model)[0]
