"""Pallas flash-attention kernel vs the XLA reference (interpret mode).

Round 1 only exercised the Pallas path on TPU; after the softmax
restructure (exp2 domain, indicator-lane denominator — see
ops/attention.py) this pins its numerics against ``_attention_xla`` on
the CPU mesh via the Pallas interpreter.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vittf_tpu.ops.attention import _attention_pallas, _attention_xla


@pytest.mark.parametrize(
    "B,H,N,hd", [(2, 4, 65, 16), (1, 2, 513, 64), (2, 6, 130, 64)]
)
def test_pallas_attention_matches_xla(B, H, N, hd, rng):
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.float32)
        for _ in range(3)
    )
    want = np.asarray(_attention_xla(q, k, v, "highest"))
    got = np.asarray(_attention_pallas(q, k, v, H, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_attention_padding_exact(rng):
    """The zero-padded K columns and the indicator-lane denominator must
    make padded tokens invisible: results equal an unpadded sequence."""
    B, H, hd = 1, 2, 32
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, 500, hd)), jnp.float32)
        for _ in range(3)
    )
    # N=500 pads to 512 rows inside the kernel (qb=256 for fp32)
    got = np.asarray(_attention_pallas(q, k, v, H, interpret=True))
    want = np.asarray(_attention_xla(q, k, v, "highest"))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_attention_bf16_close(rng):
    B, H, N, hd = 2, 3, 129, 64
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, H, N, hd)), jnp.bfloat16)
        for _ in range(3)
    )
    want = np.asarray(
        _attention_xla(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), "highest",
        )
    )
    got = np.asarray(
        _attention_pallas(q, k, v, H, interpret=True)
    ).astype(np.float32)
    # bf16 inputs: tolerance at the bf16 rounding scale
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)
