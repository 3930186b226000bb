"""The driver's entry points must compile and run (8-device CPU mesh)."""
import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_entry_compiles():
    fn, args = graft.entry()
    tokens, qkv = jax.jit(fn)(*args)
    assert tokens.shape == (2, 65, 384)
    assert qkv.shape == (2, 65, 3 * 384)


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
