"""Linear / MLP probes on frozen DINO features
(reference old/compare_feat_sampling_mlp.py and ``_wbg`` variant).

A small head is trained on features sampled at annotation voxels with BCE
against one-hot class targets; dense prediction argmaxes sigmoid scores
with an optional background-rejection threshold (all sigmoids < 0.5 → bg).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass(frozen=True)
class ProbeConfig:
    hidden: tuple = ()  # () = linear probe; e.g. (256,) = MLP (_wbg variant)
    learning_rate: float = 5e-4
    weight_decay: float = 1e-2
    epochs: int = 5
    batch_size: int = 32
    bg_threshold: float = 0.5


def init_probe(cfg: ProbeConfig, in_dim: int, num_classes: int, key: jax.Array):
    dims = (in_dim,) + tuple(cfg.hidden) + (num_classes,)
    params = []
    for a, b in zip(dims[:-1], dims[1:]):
        key, sub = jax.random.split(key)
        bound = (1.0 / a) ** 0.5
        k1, k2 = jax.random.split(sub)
        params.append({
            "kernel": jax.random.uniform(k1, (a, b), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(k2, (b,), jnp.float32, -bound, bound),
        })
    return params


def probe_forward(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["kernel"] + layer["bias"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def bce_loss(params, x, y_onehot):
    logits = probe_forward(params, x)
    return optax.sigmoid_binary_cross_entropy(logits, y_onehot).mean()


class ProbeTrainer:
    """Train a probe head on (N, F) sampled features with class ids (N,)."""

    def __init__(self, in_dim: int, num_classes: int,
                 cfg: ProbeConfig = ProbeConfig(), seed: int = 0):
        self.cfg = cfg
        self.num_classes = num_classes
        self.params = init_probe(cfg, in_dim, num_classes, jax.random.PRNGKey(seed))
        self.opt = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
        self.opt_state = self.opt.init(self.params)
        self.rng = np.random.default_rng(seed)
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        opt = self.opt

        def step(params, opt_state, x, y):
            loss, grads = jax.value_and_grad(bce_loss)(params, x, y)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step

    def fit(self, feats: np.ndarray, labels: np.ndarray) -> list[float]:
        y = np.eye(self.num_classes, dtype=np.float32)[labels]
        n = feats.shape[0]
        losses = []
        for _ in range(self.cfg.epochs):
            order = self.rng.permutation(n)
            for i in range(0, n, self.cfg.batch_size):
                sel = order[i : i + self.cfg.batch_size]
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state,
                    jnp.asarray(feats[sel]), jnp.asarray(y[sel]),
                )
                losses.append(float(loss))
        return losses

    def predict_dense(self, feat_vol: jnp.ndarray) -> jnp.ndarray:
        """(F, W, H, D) → (W, H, D) labels: argmax+1 over sigmoids, with
        background where every class sigmoid < bg_threshold."""
        F_dim = feat_vol.shape[0]
        flat = jnp.moveaxis(feat_vol, 0, -1).reshape(-1, F_dim)
        probs = jax.nn.sigmoid(probe_forward(self.params, flat))
        pred = jnp.argmax(probs, axis=-1) + 1
        bg = probs.max(axis=-1) < self.cfg.bg_threshold
        return jnp.where(bg, 0, pred).reshape(feat_vol.shape[1:])
