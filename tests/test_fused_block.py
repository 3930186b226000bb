"""Fused transformer-block kernel (ops/fused_block.py) parity.

Interpret-mode on CPU vs the reference XLA block (models.vit._block):
same math (pre-LN attention + GELU MLP, fp32 LN/softmax statistics), so
fp32 interpret runs must agree to float tolerance. On-chip bf16 deviation
vs the XLA bf16 path was separately measured at parity with the XLA
path's own deviation from an fp32 oracle (~1.9% rel max, both paths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vittf_tpu.models.vit import ViTConfig, _block, init_vit_params, vit_forward_raw
from vittf_tpu.ops.fused_block import _ROW_BLOCK, fused_block


def _mini_cfg(depth=2):
    return ViTConfig(
        patch_size=8, embed_dim=128, depth=depth, num_heads=2, img_size=32
    )


@pytest.mark.parametrize("n_tokens", [64, _ROW_BLOCK, _ROW_BLOCK + 17])
def test_fused_block_matches_xla(rng, n_tokens):
    cfg = _mini_cfg()
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    blk = params["blocks"][0]
    x = jnp.asarray(
        rng.standard_normal((2, n_tokens, cfg.embed_dim)).astype(np.float32)
    )
    want, _ = _block(x, blk, cfg, "highest", "xla")
    got = fused_block(x, blk, cfg.num_heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_block_stack_matches_xla(rng):
    """Two stacked blocks through the kernel vs the XLA path."""
    cfg = _mini_cfg(depth=2)
    params = init_vit_params(cfg, jax.random.PRNGKey(1))
    x = jnp.asarray(rng.standard_normal((1, 90, cfg.embed_dim)).astype(np.float32))
    want = x
    for blk in params["blocks"]:
        want, _ = _block(want, blk, cfg, "highest", "xla")
    got = x
    for blk in params["blocks"]:
        got = fused_block(got, blk, cfg.num_heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=5e-4, atol=5e-4
    )


@pytest.mark.parametrize("n_tokens", [64, _ROW_BLOCK, 2 * _ROW_BLOCK + 17])
def test_fused_block_rows_impl_matches_xla(rng, n_tokens):
    """Grid-level row-block variant (impl='rows', grid=(B, n_rows) with
    run-once K/V stages in persistent scratch) must match the XLA block."""
    cfg = _mini_cfg()
    params = init_vit_params(cfg, jax.random.PRNGKey(4))
    blk = params["blocks"][0]
    x = jnp.asarray(
        rng.standard_normal((2, n_tokens, cfg.embed_dim)).astype(np.float32)
    )
    want, _ = _block(x, blk, cfg, "highest", "xla")
    got = fused_block(x, blk, cfg.num_heads, interpret=True, impl="rows")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_fused_block_rows_matches_loop_impl(rng):
    """Both kernel variants share the row-block math — identical in
    interpret mode up to accumulation determinism."""
    cfg = _mini_cfg()
    params = init_vit_params(cfg, jax.random.PRNGKey(5))
    blk = params["blocks"][0]
    x = jnp.asarray(
        rng.standard_normal((1, _ROW_BLOCK + 3, cfg.embed_dim)).astype(np.float32)
    )
    a = fused_block(x, blk, cfg.num_heads, interpret=True, impl="loop")
    b = fused_block(x, blk, cfg.num_heads, interpret=True, impl="rows")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_fused_block_skip_max_matches(rng):
    """softmax_max=False is the same softmax without the shift — identical
    in real arithmetic, float-tolerance in fp32 for bounded scores."""
    cfg = _mini_cfg()
    params = init_vit_params(cfg, jax.random.PRNGKey(7))
    blk = params["blocks"][0]
    x = jnp.asarray(
        rng.standard_normal((2, _ROW_BLOCK + 9, cfg.embed_dim)).astype(np.float32)
    )
    want, _ = _block(x, blk, cfg, "highest", "xla")
    for impl in ("loop", "rows"):
        got = fused_block(
            x, blk, cfg.num_heads, interpret=True, impl=impl,
            softmax_max=False,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )


def test_pick_row_block_geometry_rule():
    """384 while the fp32 score tile fits the ~8 MB budget, else 256."""
    from vittf_tpu.ops.fused_block import _pick_row_block

    assert _pick_row_block(4097) == 384  # extraction geometry: 4224 pad
    assert _pick_row_block(64) == 384  # tiny inputs: single 384 block
    # 384 · npad(N) · 4 > 8 MB for N ≳ 5.4k → long sequences fall back
    assert _pick_row_block(16385) == 256
    assert _pick_row_block(8193) == 256


def test_fused_block_head_dim_guard():
    """head_dim >= 128 would collide with the expanded-V indicator lanes;
    the wrapper must refuse instead of returning wrong numbers."""
    cfg = ViTConfig(
        patch_size=8, embed_dim=256, depth=1, num_heads=2, img_size=32
    )  # hd = 128
    params = init_vit_params(cfg, jax.random.PRNGKey(6))
    x = jnp.zeros((1, 64, 256), jnp.float32)
    with pytest.raises(ValueError, match="head_dim"):
        fused_block(x, params["blocks"][0], cfg.num_heads, interpret=True)


def test_fused_block_layerscale(rng):
    """DINOv2 LayerScale gammas applied at both residuals."""
    cfg = ViTConfig(
        patch_size=14, embed_dim=128, depth=1, num_heads=2, img_size=28,
        layerscale=True,
    )
    params = init_vit_params(cfg, jax.random.PRNGKey(3))
    blk = params["blocks"][0]
    blk["ls1"] = jnp.asarray(rng.standard_normal(128).astype(np.float32)) * 0.1
    blk["ls2"] = jnp.asarray(rng.standard_normal(128).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.standard_normal((2, 65, 128)).astype(np.float32))
    want, _ = _block(x, blk, cfg, "highest", "xla")
    got = fused_block(x, blk, cfg.num_heads, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_vit_forward_block_impl_flag_gates_correctly(rng):
    """block_impl='fused' must silently keep the XLA path when the
    precondition (bf16 compute dtype) doesn't hold — fp32 parity runs
    never touch the kernel."""
    cfg = _mini_cfg()
    params = init_vit_params(cfg, jax.random.PRNGKey(2))
    imgs = jnp.asarray(rng.standard_normal((1, 3, 32, 32)).astype(np.float32))
    ref, qkv_ref = vit_forward_raw(params, imgs, cfg, precision="highest")
    got, qkv_got = vit_forward_raw(
        params, imgs, cfg, precision="highest", block_impl="fused"
    )  # fp32 → gate keeps XLA
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(qkv_got), np.asarray(qkv_ref))
