"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding semantics are identical between CPU and TPU under XLA,
so mesh/collective tests run here without TPU hardware (SURVEY.md §4).
The environment pins JAX_PLATFORMS=axon (the TPU tunnel), so the platform
must be overridden via jax.config, not env vars.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_bls_sticky_ext():
    """The speculative BLS refinement keeps per-process sticky crop
    extents (pipeline/refine._STICKY_EXT); clear them so tests never see
    another test's speculation state."""
    from vittf_tpu.pipeline import refine

    refine._STICKY_EXT.clear()
    yield
    refine._STICKY_EXT.clear()


def install_icecream_stub():
    """Stub the reference's icecream dependency (not installed here) so its
    modules import; covers `ic` (callable + configureOutput) and the
    `argumentToString.register` decorator used by old/utils.py."""
    import sys
    import types

    if "icecream" in sys.modules:
        return

    class _Ic:
        def __call__(self, *a, **k):
            return a[0] if len(a) == 1 else a

        def configureOutput(self, **k):
            pass

    def _arg2str(f=None):
        return f

    _arg2str.register = lambda *a, **k: (lambda f: f)
    sys.modules["icecream"] = types.SimpleNamespace(
        ic=_Ic(), argumentToString=_arg2str
    )
