"""Parameter (de)serialization: flat-npz interchange + orbax checkpoints.

The reference never writes model checkpoints (SURVEY.md §5 — its
".gitignore'd checkpoints/ dir is untouched"); its persistence is the
artifact cache. This framework adds real checkpointing:

- ``save_params_npz`` / ``load_params_npz``: a dependency-free flat-key
  format (``blocks.3.qkv.kernel`` → array) for weight interchange
- ``save_checkpoint`` / ``restore_checkpoint``: orbax for training state
  (params + optimizer state + step), the TPU-native standard
"""
from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np


def flatten_params(params, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(flatten_params(v, f"{prefix}{k}."))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(flatten_params(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(params)
    return out


def unflatten_params(flat: dict[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params_npz(path: str | Path, params) -> Path:
    path = Path(path)
    np.savez(path, **flatten_params(params))
    return path


def load_params_npz(path: str | Path):
    return unflatten_params(dict(np.load(path)))


def save_checkpoint(ckpt_dir: str | Path, state, step: int) -> Path:
    """Orbax checkpoint of an arbitrary pytree (params/opt_state/...)."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return ckpt_dir


def restore_checkpoint(ckpt_dir: str | Path, template, step: int | None = None):
    """Restore the latest (or given) step into ``template``'s structure."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).absolute()
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step() if step is None else step
        return mgr.restore(step, args=ocp.args.StandardRestore(template))
