"""3D CNN feature extractors for the trainer layer (reference old/models.py).

Functional-pytree ports of the reference's legacy training models:
- ``FeatureExtractor``: stacks of unpadded 3³ Conv3d + GroupNorm(n/4) +
  Mish, then 1³ "linear" convs, optional center-crop residual concat
  (old/models.py:26-81)
- ``PAWSNet``: encoder + BatchNorm/Linear projection, prediction and
  classification heads (old/models.py:84-129)

BatchNorm in the PAWS heads uses batch statistics in training mode and
running averages at eval, carried in an explicit ``state`` pytree.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _conv3d(x, kernel, bias, precision="default"):
    """x (B, C, Z, Y, X); kernel (k, k, k, in, out); VALID padding."""
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"),
        precision=precision,
    )
    return out + bias[None, :, None, None, None]


def group_norm(x, scale, bias, num_groups, eps=1e-5):
    """torch GroupNorm parity on (B, C, Z, Y, X)."""
    B, C = x.shape[:2]
    g = x.reshape(B, num_groups, C // num_groups, *x.shape[2:])
    mu = g.mean(axis=tuple(range(2, g.ndim)), keepdims=True)
    var = g.var(axis=tuple(range(2, g.ndim)), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    x = g.reshape(x.shape)
    return x * scale[None, :, None, None, None] + bias[None, :, None, None, None]


@dataclass(frozen=True)
class FeatureExtractorConfig:
    in_dim: int = 1
    n_features: tuple = (8, 16, 32)
    n_linear: tuple = (32,)
    residual: bool = False
    norm: str = "group"  # 'group' | 'none' (the reference's pluggable Norm)

    @property
    def crop_per_side(self) -> int:
        # CenterCrop(ks=2·len(n_features)) → pad = len(n_features) per side
        return len(self.n_features)


def _init_conv(key, k, n_in, n_out, dtype):
    fan_in = n_in * k**3
    bound = (1.0 / fan_in) ** 0.5  # torch Conv3d default init bounds
    wk, bk = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(wk, (k, k, k, n_in, n_out), dtype, -bound, bound),
        "bias": jax.random.uniform(bk, (n_out,), dtype, -bound, bound),
    }


def _init_layer(key, k, n_in, n_out, dtype):
    return {
        "conv": _init_conv(key, k, n_in, n_out, dtype),
        "norm": {"scale": jnp.ones((n_out,), dtype), "bias": jnp.zeros((n_out,), dtype)},
    }


def init_feature_extractor(
    cfg: FeatureExtractorConfig, key: jax.Array, dtype=jnp.float32
) -> dict:
    feats = (cfg.in_dim,) + tuple(cfg.n_features)
    # the reference computes last_in as n_linear[-2] (old/models.py:63-66),
    # which only type-checks when n_linear[-2] == n_linear[-1]; we take the
    # actual lins output so every configuration is valid (identical wherever
    # the reference runs at all)
    if cfg.residual:
        lin_in = cfg.n_features[-1] + cfg.in_dim
        last_in = cfg.n_linear[-1] + cfg.in_dim
    else:
        lin_in = cfg.n_features[-1]
        last_in = cfg.n_linear[-1]
    lins = (lin_in,) + tuple(cfg.n_linear)

    keys = iter(jax.random.split(key, len(feats) + len(lins) + 1))
    return {
        "convs": [
            _init_layer(next(keys), 3, a, b, dtype)
            for a, b in zip(feats, feats[1:])
        ],
        "lins": [
            _init_layer(next(keys), 1, a, b, dtype)
            for a, b in zip(lins[:-1], lins[1:])
        ],
        "last": _init_conv(next(keys), 1, last_in, cfg.n_linear[-1], dtype),
    }


def feature_extractor_forward(
    params: dict, x: jnp.ndarray, cfg: FeatureExtractorConfig,
    precision: str = "default",
) -> jnp.ndarray:
    """(B, C_in, Z, Y, X) → (B, F, Z', Y', X'), spatial shrink 2/conv layer."""

    def layer(x, p):
        y = _conv3d(x, p["conv"]["kernel"], p["conv"]["bias"], precision)
        if cfg.norm == "group":
            n_out = p["conv"]["kernel"].shape[-1]
            y = group_norm(y, p["norm"]["scale"], p["norm"]["bias"], n_out // 4)
        return mish(y)

    if cfg.residual:
        i = cfg.crop_per_side
        skip = x[..., i:-i, i:-i, i:-i]
        y = x
        for p in params["convs"]:
            y = layer(y, p)
        y = jnp.concatenate([skip, y], axis=1)
        for p in params["lins"]:
            y = layer(y, p)
        y = jnp.concatenate([skip, y], axis=1)
        return _conv3d(y, params["last"]["kernel"], params["last"]["bias"], precision)
    y = x
    for p in params["convs"]:
        y = layer(y, p)
    for p in params["lins"]:
        y = layer(y, p)
    return _conv3d(y, params["last"]["kernel"], params["last"]["bias"], precision)


# ---------------- PAWSNet ----------------

@dataclass(frozen=True)
class PAWSNetConfig:
    in_dim: int = 1
    conv_layers: tuple = (8, 16, 32)
    hidden_sz: int = 128
    out_classes: int = 3
    head_bottleneck: int = 4


def _init_linear(key, n_in, n_out, dtype):
    bound = (1.0 / n_in) ** 0.5
    wk, bk = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(wk, (n_in, n_out), dtype, -bound, bound),
        "bias": jax.random.uniform(bk, (n_out,), dtype, -bound, bound),
    }


def _init_bn(n, dtype):
    return {"scale": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype)}


def _init_bn_state(n, dtype):
    return {"mean": jnp.zeros((n,), dtype), "var": jnp.ones((n,), dtype)}


def init_pawsnet(cfg: PAWSNetConfig, key: jax.Array, dtype=jnp.float32):
    NF = cfg.conv_layers[-1]
    NH = cfg.hidden_sz
    NB = NH // cfg.head_bottleneck
    enc_cfg = FeatureExtractorConfig(cfg.in_dim, cfg.conv_layers, (NF,))
    k_enc, *ks = jax.random.split(key, 8)
    params = {
        "encoder": init_feature_extractor(enc_cfg, k_enc, dtype),
        "head": {
            "bn0": _init_bn(NF, dtype),
            "fc1": _init_linear(ks[0], NF, NB, dtype),
            "bn1": _init_bn(NB, dtype),
            "fc2": _init_linear(ks[1], NB, NF, dtype),
        },
        "proj": {
            "bn0": _init_bn(NF, dtype),
            "fc1": _init_linear(ks[2], NF, NH, dtype),
            "bn1": _init_bn(NH, dtype),
            "fc2": _init_linear(ks[3], NH, NH, dtype),
            "bn2": _init_bn(NH, dtype),
            "fc3": _init_linear(ks[4], NH, NF, dtype),
        },
        "predict": {
            "bn0": _init_bn(NF, dtype),
            "fc1": _init_linear(ks[5], NF, NH, dtype),
            "bn1": _init_bn(NH, dtype),
            "fc2": _init_linear(ks[6], NH, cfg.out_classes, dtype),
        },
    }
    state = {
        "head": {"bn0": _init_bn_state(NF, dtype), "bn1": _init_bn_state(NB, dtype)},
        "proj": {
            "bn0": _init_bn_state(NF, dtype),
            "bn1": _init_bn_state(NH, dtype),
            "bn2": _init_bn_state(NH, dtype),
        },
        "predict": {"bn0": _init_bn_state(NF, dtype), "bn1": _init_bn_state(NH, dtype)},
    }
    return params, state


def _batch_norm(x, p, s, train, momentum=0.1, eps=1e-5):
    if train:
        mu = x.mean(axis=0)
        var = x.var(axis=0)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mu,
            # torch tracks the unbiased variance in running stats
            "var": (1 - momentum) * s["var"]
            + momentum * var * x.shape[0] / max(x.shape[0] - 1, 1),
        }
    else:
        mu, var, new_s = s["mean"], s["var"], s
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"], new_s


def _mlp_head(x, p, s, order, train):
    """Run a bn/fc sequence given its layer order, threading BN state."""
    new_s = dict(s)
    for name in order:
        if name.startswith("bn"):
            x, new_s[name] = _batch_norm(x, p[name], s[name], train)
        elif name.startswith("fc"):
            x = x @ p[name]["kernel"] + p[name]["bias"]
        elif name == "mish":
            x = mish(x)
    return x, new_s


def pawsnet_forward(
    params, state, x, cfg: PAWSNetConfig, train: bool = True,
    return_class_pred: bool = False,
):
    """x (B, C, k, k, k) crops sized so the encoder reduces to 1³."""
    enc_cfg = FeatureExtractorConfig(
        cfg.in_dim, cfg.conv_layers, (cfg.conv_layers[-1],)
    )
    z = feature_extractor_forward(params["encoder"], x, enc_cfg)
    z = z.reshape(z.shape[0], z.shape[1])  # (B, NF)
    feat, s_proj = _mlp_head(
        z, params["proj"], state["proj"],
        ["bn0", "fc1", "bn1", "mish", "fc2", "bn2", "mish", "fc3"], train,
    )
    pred, s_head = _mlp_head(
        feat, params["head"], state["head"],
        ["bn0", "fc1", "bn1", "mish", "fc2"], train,
    )
    new_state = {"proj": s_proj, "head": s_head, "predict": state["predict"]}
    if return_class_pred:
        clas, s_pred = _mlp_head(
            jax.lax.stop_gradient(z), params["predict"], state["predict"],
            ["bn0", "fc1", "bn1", "mish", "fc2"], train,
        )
        new_state["predict"] = s_pred
        return (feat, pred, clas), new_state
    return (feat, pred), new_state
