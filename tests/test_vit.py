"""ViT parity tests: full-forward + qkv capture vs a torch DINO-semantics model.

The torch model below follows the public DINO ViT computation (pre-LN
blocks, fused qkv, bicubic pos-embed interpolation with the +0.1
scale-factor fudge) and shares state_dict naming with hub checkpoints, so
``convert_torch_state_dict`` is exercised end-to-end.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from vittf_tpu.models.dino import ALL_ARCHS, convert_torch_state_dict, resolve_model
from vittf_tpu.models.vit import ViTConfig, init_vit_params, split_qkv, vit_forward


class TorchAttn(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.heads = heads
        self.num_heads = heads  # DINO attribute name (read by hub users)

    def forward(self, x):
        B, N, D = x.shape
        hd = D // self.heads
        qkv_flat = self.qkv(x)  # single qkv invocation (hooks fire once)
        qkv = qkv_flat.reshape(B, N, 3, self.heads, hd).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * hd**-0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(out), qkv_flat


class TorchMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TorchLayerScale(nn.Module):
    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = nn.Parameter(torch.full((dim,), init))

    def forward(self, x):
        return x * self.gamma


class TorchBlock(nn.Module):
    def __init__(self, dim, heads, hidden, layerscale=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttn(dim, heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchMlp(dim, hidden)
        if layerscale:
            self.ls1 = TorchLayerScale(dim)
            self.ls2 = TorchLayerScale(dim)
        else:
            self.ls1 = self.ls2 = None

    def forward(self, x):
        a, qkv = self.attn(self.norm1(x))
        if self.ls1 is not None:
            a = self.ls1(a)
        x = x + a
        m = self.mlp(self.norm2(x))
        if self.ls2 is not None:
            m = self.ls2(m)
        x = x + m
        return x, qkv


class TorchPatchEmbed(nn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    def forward(self, x):
        return self.proj(x)


class TorchDinoViT(nn.Module):
    """Minimal DINO-semantics ViT (public architecture) for parity checks."""

    def __init__(self, cfg: ViTConfig):
        super().__init__()
        self.cfg = cfg
        dim = cfg.embed_dim
        self.patch_embed = TorchPatchEmbed(cfg.patch_size, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + cfg.pos_grid**2, dim))
        self.blocks = nn.ModuleList(
            [
                TorchBlock(dim, cfg.num_heads, cfg.hidden_dim, cfg.layerscale)
                for _ in range(cfg.depth)
            ]
        )
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def interpolate_pos_encoding(self, npatch, h, w):
        N = self.pos_embed.shape[1] - 1
        if npatch == N and h == w:
            return self.pos_embed
        dim = self.pos_embed.shape[-1]
        g = int(math.sqrt(N))
        h0, w0 = h + 0.1, w + 0.1
        patch_pos = F.interpolate(
            self.pos_embed[:, 1:].reshape(1, g, g, dim).permute(0, 3, 1, 2),
            scale_factor=(h0 / g, w0 / g),
            mode="bicubic",
        )
        patch_pos = patch_pos.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((self.pos_embed[:, :1], patch_pos), dim=1)

    def forward(self, x):
        B, _, H, W = x.shape
        P = self.cfg.patch_size
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = torch.cat((self.cls_token.expand(B, -1, -1), x), dim=1)
        x = x + self.interpolate_pos_encoding(x.shape[1] - 1, H // P, W // P)
        qkv_last = None
        for blk in self.blocks:
            x, qkv_last = blk(x)
        return self.norm(x), qkv_last


TINY = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4, img_size=16, name="tiny")


def _make_pair(cfg, seed=0):
    tmodel = TorchDinoViT(cfg)
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    params = convert_torch_state_dict(tmodel.state_dict(), cfg)
    return tmodel, params


@pytest.mark.parametrize("img_hw", [(16, 16), (24, 16), (32, 40)])
def test_vit_forward_parity(img_hw, rng):
    tmodel, params = _make_pair(TINY)
    x = rng.standard_normal((2, 3, *img_hw)).astype(np.float32)
    with torch.no_grad():
        want_tokens, want_qkv = tmodel(torch.from_numpy(x))
    got_tokens, got_qkv = vit_forward(
        params, jnp.asarray(x), TINY, precision="highest", attn_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(got_tokens), want_tokens.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_qkv), want_qkv.numpy(), rtol=1e-4, atol=1e-4
    )


def test_vit_layerscale_parity_dinov2_path(rng):
    """The DINOv2 LayerScale path: forward + converter (ls1/ls2.gamma)."""
    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=2, num_heads=4,
                    img_size=16, layerscale=True)
    tmodel = TorchDinoViT(cfg)
    gen = torch.Generator().manual_seed(2)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    params = convert_torch_state_dict(tmodel.state_dict(), cfg)
    assert "ls1" in params["blocks"][0]
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        want, _ = tmodel(torch.from_numpy(x))
    got, _ = vit_forward(
        params, jnp.asarray(x), cfg, precision="highest", attn_impl="xla"
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-4)


def test_split_qkv_matches_reference_reshape(rng):
    """split_qkv must equal the reference's post-hook reshape (infer.py:189-207)."""
    B, N, D, heads = 2, 5, 32, 4
    qkv = rng.standard_normal((B, N, 3 * D)).astype(np.float32)
    q, k, v = split_qkv(jnp.asarray(qkv), heads)
    t = (
        torch.from_numpy(qkv)
        .view(B, N, 3, heads, D // heads)
        .permute(2, 0, 3, 1, 4)
    )  # (3, B, heads, N, hd)
    for got, idx in ((q, 0), (k, 1), (v, 2)):
        want = t[idx].transpose(1, 2).reshape(B, N, D).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_init_params_structure():
    params = init_vit_params(TINY, jax.random.PRNGKey(0))
    assert len(params["blocks"]) == TINY.depth
    assert params["pos_embed"].shape == (1, 1 + 16, 32)
    assert params["blocks"][0]["qkv"]["kernel"].shape == (32, 96)
    # layerscale only for DINOv2 archs
    v2 = ALL_ARCHS["vits14"]
    p2 = init_vit_params(
        ViTConfig(4, 32, 1, 4, img_size=16, layerscale=True), jax.random.PRNGKey(0)
    )
    assert "ls1" in p2["blocks"][0]
    assert v2.layerscale


def test_resolve_model_rules():
    assert resolve_model().name == "vits8"
    assert resolve_model("vitb16").patch_size == 16
    assert resolve_model(dino2_model="vitl14").patch_size == 14
    with pytest.raises(ValueError):
        resolve_model("vits8", "vits14")
    with pytest.raises(ValueError):
        resolve_model("nope")


def test_bicubic_resize_parity(rng):
    from vittf_tpu.ops.resize import resize_cubic

    x = rng.standard_normal((1, 3, 7, 9)).astype(np.float32)
    got = np.asarray(resize_cubic(jnp.asarray(x), (13, 5)))
    want = F.interpolate(
        torch.from_numpy(x), size=(13, 5), mode="bicubic", align_corners=False
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
