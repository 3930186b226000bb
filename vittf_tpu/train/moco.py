"""MoCo for volumes: momentum key encoder + negative queue
(reference old/moco.py — the DDP-era module rewritten functionally).

State = {params_q, params_k, queue (F, K), queue_ptr}; one ``moco_step``
computes the InfoNCE logits against the queue, updates the key encoder by
EMA and enqueues the new keys. Correspondence sampling uses the torch
``grid_sample`` convention via ops.sampling (2D grid over the feature map's
last two axes, matching the reference's (N, 2) correspondences).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MoCoConfig:
    dim: int = 128
    K: int = 65536
    m: float = 0.999
    T: float = 0.07


def init_moco_state(params_q, key: jax.Array, cfg: MoCoConfig) -> dict:
    queue = jax.random.normal(key, (cfg.dim, cfg.K))
    queue = queue / jnp.linalg.norm(queue, axis=0, keepdims=True)
    return {
        "params_q": params_q,
        "params_k": jax.tree.map(jnp.copy, params_q),
        "queue": queue,
        "queue_ptr": jnp.zeros((), jnp.int32),
    }


def momentum_update(params_q, params_k, m: float):
    """EMA key-encoder update (old/moco.py:52-58)."""
    return jax.tree.map(lambda k, q: k * m + q * (1.0 - m), params_k, params_q)


def dequeue_and_enqueue(queue, ptr, keys):
    """Replace queue columns at ptr with new keys (old/moco.py:60-75).

    keys: (F, B); K must be divisible by B (reference assertion).
    """
    B = keys.shape[1]
    queue = jax.lax.dynamic_update_slice(queue, keys, (0, ptr))
    return queue, (ptr + B) % queue.shape[1]


def moco_logits(q_feats: jnp.ndarray, k_feats: jnp.ndarray, queue: jnp.ndarray,
                T: float):
    """InfoNCE logits: positives from key encoder, negatives from the queue.

    q_feats/k_feats: (B, F, S) normalized per-sample features.
    Returns logits (B·S, 1+K) with label 0 (old/moco.py:105-125).
    """
    l_pos = jnp.einsum("bfs,bfs->bs", q_feats, k_feats)[..., None]
    l_neg = jnp.einsum("bfs,fk->bsk", q_feats, queue)
    logits = jnp.concatenate([l_pos, l_neg], axis=-1)
    return logits.reshape(-1, 1 + queue.shape[1]) / T


def moco_loss_and_new_state(
    state: dict, q_feats: jnp.ndarray, k_feats: jnp.ndarray, cfg: MoCoConfig
):
    """Loss + updated queue/key-encoder. ``k_feats`` must come from the key
    encoder under stop_gradient (the caller runs both encoders)."""
    k_feats = jax.lax.stop_gradient(k_feats)
    logits = moco_logits(q_feats, k_feats, state["queue"], cfg.T)
    loss = -jax.nn.log_softmax(logits, axis=-1)[:, 0].mean()
    F_dim = k_feats.shape[1]
    to_enq = jnp.moveaxis(k_feats, 1, 0).reshape(F_dim, -1)
    new_queue, new_ptr = dequeue_and_enqueue(
        state["queue"], state["queue_ptr"], to_enq
    )
    new_state = {
        **state,
        "params_k": momentum_update(state["params_q"], state["params_k"], cfg.m),
        "queue": new_queue,
        "queue_ptr": new_ptr,
    }
    return loss, new_state
