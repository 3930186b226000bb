"""Training losses: InfoNCE, cluster-std, PAWS (snn/sharpen/me-max).

Ports of the reference's legacy trainer losses:
- InfoNCE over sparse voxel crops (old/train_semisparse.py:189-194)
- feature-std cluster compactness (old/utils.py:66-87 via :197-206)
- PAWS soft-nearest-neighbor losses (old/paws.py:4-34)
- PAWS crop augmentation (noise/permute/flip, old/paws.py:36-57)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def infonce_loss(
    pos_feat: jnp.ndarray,  # (C, 2, BS, F) two positive views per class
    neg_feat: jnp.ndarray,  # (C, N, 1, F) negatives per class
) -> jnp.ndarray:
    """InfoNCE with the second positive as target and N negatives.

    logits row = [sim(anchor, positive), sim(anchor, neg_1..N)]; label 0
    (old/train_semisparse.py:189-193).
    """
    C, _, BS, F = pos_feat.shape
    N = neg_feat.shape[1]
    pos_q = _normalize(pos_feat)
    neg_q = _normalize(neg_feat)
    anchors = pos_q[:, :1]  # (C, 1, BS, F)
    keys = jnp.concatenate(
        [pos_q[:, 1:2], jnp.broadcast_to(neg_q, (C, N, BS, F))], axis=1
    )  # (C, 1+N, BS, F)
    sim = jnp.einsum("cpbf,cnbf->cpbn", anchors, keys).squeeze(1)  # (C, BS, 1+N)
    logits = sim.reshape(C * BS, N + 1)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    return -logprobs[:, 0].mean()


def feature_std(
    features: jnp.ndarray, reduce_dim=(1, 2), feature_dim: int = -1
) -> jnp.ndarray:
    """Per-class mean std of features around their cluster center
    (old/utils.py feature_std as used at old/train_semisparse.py:197-206)."""
    f = features.astype(jnp.float32)
    return f.std(axis=reduce_dim).mean(axis=feature_dim)


# ---------------- PAWS ----------------

def sharpen(p: jnp.ndarray, T: float) -> jnp.ndarray:
    sharp = p ** (1.0 / T)
    return sharp / jnp.sum(sharp, axis=1, keepdims=True)


def snn(query, support, labels, tau: float = 0.1):
    """Soft nearest neighbours: softmax(q·sᵀ/τ) @ labels (old/paws.py:8-13)."""
    q = _normalize(query, axis=1)
    s = _normalize(support, axis=1)
    return jax.nn.softmax(q @ s.T / tau, axis=1) @ labels


def paws_loss(
    anchor_views, anchor_supports, anchor_labels,
    target_views, target_supports, target_labels,
    clas_pred=None, temperature: float = 0.25, tau: float = 0.1,
):
    """PAWS loss: CE against sharpened positive pseudo-labels + me-max
    (old/paws.py:15-34). Returns (loss, memax[, class_loss])."""
    probs = snn(anchor_views, anchor_supports, anchor_labels, tau=tau)
    targs = jax.lax.stop_gradient(
        sharpen(snn(target_views, target_supports, target_labels, tau=tau), temperature)
    )
    targs = jnp.where(targs < 1e-4, 0.0, targs)
    # H(targets, queries): sum(log(probs ** -targs)) = -targs·log(probs)
    loss = jnp.mean(jnp.sum(-targs * jnp.log(jnp.maximum(probs, 1e-30)), axis=1))

    # me-max: -Σ log(p̄ ** -p̄) = -Σ p̄·(-log p̄) = Σ p̄·log p̄ (negative entropy)
    avg_probs = jnp.mean(sharpen(probs, temperature), axis=0)
    memax = jnp.sum(avg_probs * jnp.log(jnp.maximum(avg_probs, 1e-30)))
    if clas_pred is not None:
        clas_targ = jnp.concatenate(
            [anchor_labels, jax.lax.stop_gradient(sharpen(probs, temperature))], axis=0
        )
        logp = jax.nn.log_softmax(clas_pred, axis=-1)
        clas_loss = -(clas_targ * logp).sum(axis=-1).mean()
        return loss, memax, clas_loss
    return loss, memax


def transform_paws_crops(
    crops: jnp.ndarray, key: jax.Array,
    noise_std: float = 0.05, flip: bool = True, permute: bool = True,
):
    """Two augmented views (anchors ‖ positives) of crops (old/paws.py:36-57).

    Augmentations: additive Gaussian noise, random axis permutation,
    random per-axis flips. Permutation uses static branches via lax.switch.
    """
    k_noise1, k_noise2, k_perm, k_flip = jax.random.split(key, 4)
    if noise_std > 0:
        anchors = crops + jax.random.normal(k_noise1, crops.shape) * noise_std
        positiv = crops + jax.random.normal(k_noise2, crops.shape) * noise_std
    else:
        anchors, positiv = crops, crops

    perms = [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]
    pre = tuple(range(crops.ndim - 3))

    def apply_perm(x, pidx):
        branches = [
            (lambda p: lambda t: jnp.transpose(
                t, pre + tuple(d + len(pre) for d in p)
            ))(p)
            for p in perms
        ]
        return jax.lax.switch(pidx, branches, x)

    if permute:
        idx = jax.random.randint(k_perm, (2,), 0, len(perms))
        anchors = apply_perm(anchors, idx[0])
        positiv = apply_perm(anchors, idx[1])  # reference permutes anchors twice

    if flip:
        flips = jax.random.uniform(k_flip, (6,)) < 0.5
        for i in range(3):
            ax = crops.ndim - 3 + i
            anchors = jnp.where(flips[i], jnp.flip(anchors, axis=ax), anchors)
            positiv = jnp.where(flips[3 + i], jnp.flip(positiv, axis=ax), positiv)
    return jnp.concatenate([anchors, positiv], axis=0)
