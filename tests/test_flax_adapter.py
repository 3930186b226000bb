import jax
import jax.numpy as jnp
import numpy as np

from tests.test_vit import TINY
from vittf_tpu.models.flax_adapter import FlaxViT, from_pytree, params_pytree
from vittf_tpu.models.vit import init_vit_params, vit_forward


def test_flax_adapter_matches_functional(rng):
    module = FlaxViT(cfg=TINY, precision="highest", attn_impl="xla")
    x = jnp.asarray(rng.standard_normal((2, 3, 16, 16)).astype(np.float32))
    variables = module.init(jax.random.PRNGKey(0), x)
    tokens_flax, qkv_flax = module.apply(variables, x)

    params = params_pytree(variables)
    tokens_fn, qkv_fn = vit_forward(
        params, x, TINY, precision="highest", attn_impl="xla"
    )
    np.testing.assert_allclose(
        np.asarray(tokens_flax), np.asarray(tokens_fn), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(qkv_flax), np.asarray(qkv_fn), rtol=1e-5, atol=1e-6)

    # round-trip: functional params into the module
    p2 = init_vit_params(TINY, jax.random.PRNGKey(3))
    out2, _ = module.apply(from_pytree(p2), x)
    ref2, _ = vit_forward(p2, x, TINY, precision="highest", attn_impl="xla")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=1e-5, atol=1e-6)
