"""IntraCLR: within-volume contrastive learning on augmented crop views.

The reference's old/intra_clr.py is an unfinished stub (the file ends
mid-function, SURVEY.md T7). This is the completed form of that idea:
positives are two augmented views (noise/flip/permute) of the *same* voxel
crop, negatives are other voxels of the same volume — no labels needed.
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
from vittf_tpu.train.gather import gather_receptive_fields
from vittf_tpu.train.losses import transform_paws_crops


@dataclass(frozen=True)
class IntraCLRConfig:
    model: FeatureExtractorConfig = FeatureExtractorConfig()
    rec_field: int = 7
    batch_size: int = 64
    temperature: float = 0.1
    noise_std: float = 0.05
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    schedule: str = "cosine"
    iterations: int = 1000


@partial(jax.jit, static_argnames=("cfg", "opt"))
def intra_clr_step(params, opt_state, vol4, centers, key, cfg: IntraCLRConfig, opt):
    """NT-Xent over two augmented views of ``batch_size`` voxel crops."""
    crops = gather_receptive_fields(vol4, centers, ks=cfg.rec_field)
    views = transform_paws_crops(crops, key, noise_std=cfg.noise_std)  # (2B, ...)
    B = centers.shape[0]

    def loss_fn(p):
        f = feature_extractor_forward(p, views, cfg.model)
        f = f.reshape(f.shape[0], f.shape[1])
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        sim = (f @ f.T) / cfg.temperature  # (2B, 2B)
        sim = sim - jnp.eye(2 * B) * 1e9  # mask self-similarity
        # positive of i is i±B
        targets = jnp.concatenate([jnp.arange(B) + B, jnp.arange(B)])
        logp = jax.nn.log_softmax(sim, axis=-1)
        return -logp[jnp.arange(2 * B), targets].mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


class IntraCLRTrainer:
    def __init__(self, vol: np.ndarray, cfg: IntraCLRConfig = IntraCLRConfig(),
                 seed: int = 0):
        self.cfg = cfg
        self.vol4 = jnp.asarray(vol, jnp.float32)[None]
        self.rng = np.random.default_rng(seed)
        self.params = init_feature_extractor(cfg.model, jax.random.PRNGKey(seed))
        self.opt = make_optimizer(cfg)
        self.opt_state = self.opt.init(self.params)
        self.key = jax.random.PRNGKey(seed + 1)
        self.history: list[float] = []

    def step(self) -> float:
        shape = self.vol4.shape[1:]
        centers = np.stack(
            [self.rng.integers(0, s, self.cfg.batch_size) for s in shape], -1
        )
        self.key, sub = jax.random.split(self.key)
        self.params, self.opt_state, loss = intra_clr_step(
            self.params, self.opt_state, self.vol4,
            jnp.asarray(centers), sub, self.cfg, self.opt,
        )
        self.history.append(float(loss))
        return float(loss)
