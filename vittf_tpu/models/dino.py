"""DINO / DINOv2 architecture registry and torch-checkpoint conversion.

The reference resolves architectures and patch sizes from CLI names and
pulls weights from torch.hub (reference infer.py:42-46, 239-264). Here the
same names map to ``ViTConfig``s, and ``convert_torch_state_dict`` turns a
downloaded DINO/DINOv2 PyTorch ``state_dict`` (or a ``.pth`` file) into
this framework's parameter pytree — weight loading is an offline,
explicit step instead of a hub download at run time.
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from vittf_tpu.models.vit import ViTConfig

# DINO v1 (facebookresearch/dino): patch 8/16, img_size 224.
# DINOv2 (facebookresearch/dinov2): patch 14, img_size 518, LayerScale.
DINO_ARCHS = {
    "vits16": ViTConfig(16, 384, 12, 6, name="vits16"),
    "vits8": ViTConfig(8, 384, 12, 6, name="vits8"),
    "vitb16": ViTConfig(16, 768, 12, 12, name="vitb16"),
    "vitb8": ViTConfig(8, 768, 12, 12, name="vitb8"),
}
DINOV2_ARCHS = {
    "vits14": ViTConfig(14, 384, 12, 6, img_size=518, layerscale=True, name="vits14"),
    "vitb14": ViTConfig(14, 768, 12, 12, img_size=518, layerscale=True, name="vitb14"),
    "vitl14": ViTConfig(14, 1024, 24, 16, img_size=518, layerscale=True, name="vitl14"),
    "vitg14": ViTConfig(14, 1536, 40, 24, img_size=518, layerscale=True, name="vitg14"),
}
ALL_ARCHS = {**DINO_ARCHS, **DINOV2_ARCHS}


def resolve_model(
    dino_model: str | None = None, dino2_model: str | None = None
) -> ViTConfig:
    """Name → config, with the reference's default (vits8) and patch-size
    resolution rules (infer.py:239-264)."""
    if dino_model and dino2_model:
        raise ValueError("Set only one of dino_model / dino2_model")
    if dino2_model:
        if dino2_model not in DINOV2_ARCHS:
            raise ValueError(f"Unknown DINOv2 arch: {dino2_model}")
        return DINOV2_ARCHS[dino2_model]
    name = dino_model or "vits8"
    if name not in DINO_ARCHS:
        raise ValueError(f"Unknown DINO arch: {name}")
    return DINO_ARCHS[name]


def convert_torch_state_dict(state_dict: dict, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    """PyTorch DINO/DINOv2 ``state_dict`` → vittf_tpu parameter pytree.

    Linear weights are transposed (torch stores (out, in)); the patch-embed
    conv moves from OIHW to HWIO. Keys not part of the backbone (head,
    mask_token, register tokens) are ignored.
    """

    def get(name):
        t = state_dict[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return jnp.asarray(np.asarray(t), dtype=dtype)

    def linear(prefix):
        return {"kernel": get(f"{prefix}.weight").T, "bias": get(f"{prefix}.bias")}

    def ln(prefix):
        return {"scale": get(f"{prefix}.weight"), "bias": get(f"{prefix}.bias")}

    params = {
        "patch_embed": {
            "kernel": jnp.transpose(get("patch_embed.proj.weight"), (2, 3, 1, 0)),
            "bias": get("patch_embed.proj.bias"),
        },
        "cls_token": get("cls_token"),
        "pos_embed": get("pos_embed"),
        "blocks": [],
        "norm": ln("norm"),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}"
        blk = {
            "norm1": ln(f"{b}.norm1"),
            "norm2": ln(f"{b}.norm2"),
            "qkv": linear(f"{b}.attn.qkv"),
            "proj": linear(f"{b}.attn.proj"),
            "fc1": linear(f"{b}.mlp.fc1"),
            "fc2": linear(f"{b}.mlp.fc2"),
        }
        if cfg.layerscale:
            blk["ls1"] = get(f"{b}.ls1.gamma")
            blk["ls2"] = get(f"{b}.ls2.gamma")
        params["blocks"].append(blk)
    return params


def load_dino_checkpoint(path: str | Path, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    """Load a DINO ``.pth`` checkpoint file and convert it."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "teacher" in sd:
        sd = {k.replace("backbone.", ""): v for k, v in sd["teacher"].items()}
    return convert_torch_state_dict(sd, cfg, dtype)
