"""Pipeline-parallel ViT: staged blocks must match the sequential forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from tests.test_vit import TINY, _make_pair
from vittf_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from vittf_tpu.parallel.pipeline_parallel import (
    pp_vit_forward,
    stack_block_params,
)


def _pipe_mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("pipe",))


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 4), (4, 2)])
def test_pp_forward_matches_sequential(rng, n_stages, n_micro):
    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=4, num_heads=4, img_size=16)
    params = init_vit_params(cfg, jax.random.PRNGKey(7))
    # non-trivial weights
    params = jax.tree.map(
        lambda a: a + 0.03 * jax.random.normal(jax.random.PRNGKey(1), a.shape),
        params,
    )
    x = rng.standard_normal((4, 3, 16, 16)).astype(np.float32)
    want_tokens, want_qkv = vit_forward(
        params, jnp.asarray(x), cfg, precision="highest", attn_impl="xla"
    )
    mesh = _pipe_mesh(n_stages)
    got_tokens, got_qkv = pp_vit_forward(
        params, jnp.asarray(x), cfg, mesh, n_micro=n_micro,
        precision="highest", attn_impl="xla",
    )
    np.testing.assert_allclose(
        np.asarray(got_tokens), np.asarray(want_tokens), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_qkv), np.asarray(want_qkv), rtol=1e-4, atol=1e-4
    )


def test_stack_block_params_shapes():
    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=4, num_heads=4, img_size=16)
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    stacked = stack_block_params(params, 2)
    assert stacked["qkv"]["kernel"].shape == (2, 2, 32, 96)
    with pytest.raises(ValueError):
        stack_block_params(params, 3)


def test_pp_with_layerscale(rng):
    """DINOv2-style blocks (LayerScale) stack and pipeline correctly."""
    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=4, num_heads=4,
                    img_size=16, layerscale=True)
    params = init_vit_params(cfg, jax.random.PRNGKey(2))
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 16)).astype(np.float32))
    want, _ = vit_forward(params, x, cfg, precision="highest", attn_impl="xla")
    got, _ = pp_vit_forward(
        params, x, cfg, _pipe_mesh(2), n_micro=2,
        precision="highest", attn_impl="xla",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_pp_rejects_bad_microbatching(rng):
    cfg = ViTConfig(patch_size=4, embed_dim=32, depth=4, num_heads=4, img_size=16)
    params = init_vit_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        pp_vit_forward(
            params, jnp.zeros((3, 3, 16, 16)), cfg, _pipe_mesh(2), n_micro=2
        )
