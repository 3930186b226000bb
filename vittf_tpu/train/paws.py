"""PAWS semi-supervised trainer (reference old/train_semisup_sparse.py).

Each step gathers M support crops per labeled class plus BS unlabeled
anchor crops; the anchors get two augmented views (noise/permute/flip);
PAWSNet produces projection features (snn targets, detached) and
prediction-head features (snn queries); the loss is PAWS CE + me-max +
a detached-encoder classification loss. Optimized with SGD-momentum
wrapped in LARS (trust 0.001), BN/bias parameters excluded — expressed
as an optax chain with a parameter-label mask.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vittf_tpu.models.cnn3d import PAWSNetConfig, init_pawsnet, pawsnet_forward
from vittf_tpu.train.gather import gather_receptive_fields
from vittf_tpu.train.losses import paws_loss, transform_paws_crops


@dataclass(frozen=True)
class PAWSConfig:
    model: PAWSNetConfig = PAWSNetConfig(in_dim=1, conv_layers=(8, 16, 32, 64))
    supports_per_class: int = 8  # M
    batch_size: int = 16  # BS unlabeled anchors
    learning_rate: float = 0.1
    weight_decay: float = 1e-6
    trust_coefficient: float = 0.001
    schedule: str = "onecycle"
    iterations: int = 1000
    noise_std: float = 0.05

    @property
    def rec_field(self) -> int:
        return len(self.model.conv_layers) * 2 + 1


def _lars_label_fn(params):
    """'exclude' for biases and norm/BN parameters (reference LARS_exclude
    param group, old/train_semisup_sparse.py:131-137)."""

    def label(path, _leaf):
        keys = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        if "bias" in keys:
            return "exclude"
        if any(k.startswith("bn") or k == "norm" for k in keys):
            return "exclude"
        return "lars"

    return jax.tree_util.tree_map_with_path(label, params)


def make_paws_optimizer(cfg: PAWSConfig, params) -> optax.GradientTransformation:
    if cfg.schedule == "onecycle":
        lr = optax.cosine_onecycle_schedule(cfg.iterations, cfg.learning_rate)
    elif cfg.schedule == "cosine":
        lr = optax.cosine_decay_schedule(cfg.learning_rate, cfg.iterations)
    else:
        lr = cfg.learning_rate
    lars = optax.lars(
        lr,
        weight_decay=cfg.weight_decay,
        trust_coefficient=cfg.trust_coefficient,
        momentum=0.9,
    )
    sgd = optax.sgd(lr, momentum=0.9)
    return optax.multi_transform(
        {"lars": lars, "exclude": sgd}, _lars_label_fn(params)
    )


@partial(jax.jit, static_argnames=("cfg", "opt", "num_classes"))
def paws_train_step(
    params, bn_state, opt_state, vol4, sup_centers, anc_centers, key,
    cfg: PAWSConfig, opt, num_classes: int,
):
    """sup_centers (C·M, 3) class-blocked; anc_centers (BS, 3) unlabeled."""
    M = cfg.supports_per_class
    BS = anc_centers.shape[0]
    sup_crops = gather_receptive_fields(vol4, sup_centers, ks=cfg.rec_field)
    anc_crops = gather_receptive_fields(vol4, anc_centers, ks=cfg.rec_field)
    anc_crops = transform_paws_crops(anc_crops, key, noise_std=cfg.noise_std)
    crops = jnp.concatenate([sup_crops, anc_crops], axis=0)
    # Support labels are class-BLOCKED to match sup_centers' layout. NOTE:
    # the reference builds class-CYCLING labels against class-blocked
    # supports (train_semisup_sparse.py:140-142 vs :154) — a label/crop
    # mismatch whenever M > 1; corrected here rather than reproduced.
    label = jnp.repeat(jnp.eye(num_classes), M, axis=0)

    def loss_fn(p):
        (feat, pred, clas), new_bn = pawsnet_forward(
            p, bn_state, crops, cfg.model, train=True, return_class_pred=True
        )
        nsup = sup_crops.shape[0]
        sup_anc = pred[:nsup]
        anc = pred[nsup:]
        sup_pos = jax.lax.stop_gradient(feat[:nsup])
        pos = jax.lax.stop_gradient(feat[nsup:])
        pos = jnp.concatenate([pos[BS:], pos[:BS]], axis=0)  # swap the views
        ploss, memax, clas_loss = paws_loss(
            anc, sup_anc, label, pos, sup_pos, label, clas_pred=clas
        )
        loss = ploss + memax + clas_loss
        return loss, ({"paws": ploss, "memax": memax, "clas": clas_loss,
                       "loss": loss}, new_bn)

    (_, (aux, new_bn)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, new_bn, opt_state, aux


class PAWSTrainer:
    """Host driver: class/unlabeled sampling + jitted PAWS steps."""

    def __init__(
        self,
        vol: np.ndarray,
        mask: np.ndarray,
        labels: list[str],
        cfg: PAWSConfig = PAWSConfig(),
        seed: int = 0,
        unlabeled_value: int | None = None,
    ):
        self.cfg = cfg
        self.labels = labels
        self.num_classes = len(labels)
        self.rng = np.random.default_rng(seed)
        self.vol4 = jnp.asarray(vol, jnp.float32)[None]
        mask = np.asarray(mask)
        unl = self.num_classes if unlabeled_value is None else unlabeled_value
        self.class_indices = [
            np.argwhere(mask == i) for i in range(self.num_classes)
        ]
        self.unlabeled_indices = np.argwhere(mask == unl)
        if self.unlabeled_indices.shape[0] == 0:
            self.unlabeled_indices = np.argwhere(np.ones_like(mask, bool))
        self.params, self.bn_state = init_pawsnet(
            cfg.model, jax.random.PRNGKey(seed)
        )
        self.opt = make_paws_optimizer(cfg, self.params)
        self.opt_state = self.opt.init(self.params)
        self.key = jax.random.PRNGKey(seed + 1)
        self.history: list[dict] = []

    def step(self) -> dict:
        M = self.cfg.supports_per_class
        sup = np.concatenate(
            [
                idx[self.rng.choice(idx.shape[0], M)]
                for idx in self.class_indices
            ]
        )
        anc = self.unlabeled_indices[
            self.rng.choice(self.unlabeled_indices.shape[0], self.cfg.batch_size)
        ]
        self.key, sub = jax.random.split(self.key)
        self.params, self.bn_state, self.opt_state, aux = paws_train_step(
            self.params, self.bn_state, self.opt_state, self.vol4,
            jnp.asarray(sup), jnp.asarray(anc), sub,
            self.cfg, self.opt, self.num_classes,
        )
        rec = {k: float(v) for k, v in aux.items()}
        self.history.append(rec)
        return rec

    def predict_dense(self, vol: np.ndarray | None = None) -> jnp.ndarray:
        """Full-volume class prediction via the classification head
        (PAWSNet.forward_fullvol, old/models.py:121-126)."""
        from vittf_tpu.models.cnn3d import (
            FeatureExtractorConfig,
            feature_extractor_forward,
        )

        v = self.vol4 if vol is None else jnp.asarray(vol, jnp.float32)[None]
        pad = self.cfg.rec_field // 2
        padded = jnp.pad(v[None], ((0, 0), (0, 0)) + ((pad, pad),) * 3)
        enc_cfg = FeatureExtractorConfig(
            self.cfg.model.in_dim, self.cfg.model.conv_layers,
            (self.cfg.model.conv_layers[-1],),
        )
        z = feature_extractor_forward(
            self.params["encoder"], padded, enc_cfg
        )[0]  # (NF, Z, Y, X)
        zz = jnp.moveaxis(z, 0, -1).reshape(-1, z.shape[0])
        from vittf_tpu.models.cnn3d import _mlp_head

        logits, _ = _mlp_head(
            zz, self.params["predict"], self.bn_state["predict"],
            ["bn0", "fc1", "bn1", "mish", "fc2"], train=False,
        )
        return logits.reshape(*z.shape[1:], -1).argmax(-1)
