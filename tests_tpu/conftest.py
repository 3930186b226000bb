"""On-chip kernel tests — run `python -m pytest tests_tpu -q` on a TPU.

The main `tests/` suite pins the CPU platform (tests/conftest.py) and
validates Pallas kernels through interpret mode; this suite validates the
SAME kernels through the real Mosaic lowering on hardware, where layout,
tiling and dtype rules differ (e.g. the bf16-accumulator rejection, the
(8, 128) tile padding). CI has no TPU — this suite is for the real-chip
environment and skips itself entirely elsewhere.

Hazards honored here (docs/ARCHITECTURE.md): never fetch a bool device
array (D2H hangs on the axon relay) — tests cast to uint8 first.
"""
import numpy as np
import pytest

import jax

collect_ignore: list = []

if jax.devices()[0].platform != "tpu":
    collect_ignore = ["test_kernels_tpu.py"]


@pytest.fixture
def rng():
    return np.random.default_rng(0)
