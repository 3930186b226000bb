"""Flax linen adapter for the ViT.

The framework's models are pure functions over parameter pytrees (the
shape TP/PP sharding and weight conversion want). For users embedding the
backbone in a flax training stack, this Module wraps the functional
forward; parameters live under the standard ``params`` collection and are
interchangeable with the functional API via ``.params_pytree`` /
``from_pytree``.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from vittf_tpu.models.vit import ViTConfig, init_vit_params, vit_forward_raw


class FlaxViT(nn.Module):
    """linen wrapper over the functional DINO ViT."""

    cfg: ViTConfig
    precision: str = "default"
    attn_impl: str = "auto"
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, images: jnp.ndarray, capture: str = "qkv"):
        params = self.param(
            "vit",
            lambda rng: init_vit_params(self.cfg, rng),
        )
        return vit_forward_raw(
            params, images, self.cfg,
            precision=self.precision, attn_impl=self.attn_impl,
            compute_dtype=jnp.dtype(self.compute_dtype), capture=capture,
        )


def params_pytree(variables: dict) -> dict:
    """flax variables → the functional API's parameter pytree."""
    return variables["params"]["vit"]


def from_pytree(params: dict) -> dict:
    """Functional parameter pytree → flax variables."""
    return {"params": {"vit": params}}
