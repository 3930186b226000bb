"""Device mesh construction and sharding specs.

The reference's only "parallelism" is shell-script fan-out over volumes on
SLURM (sub/*.sh) plus micro-batched slices on one GPU (SURVEY.md §2.4).
Here parallelism is a first-class mesh:

- ``data``  — DP over volume slices during extraction, and over the
              flattened voxel axis during similarity (the framework's
              sequence-parallel analog: 16.7M "tokens" sharded, KB-scale
              queries replicated)
- ``model`` — optional TP over attention heads / MLP for ViT-L/g,
              expressed as GSPMD sharding annotations on the parameter
              pytree (XLA inserts the ICI collectives)

A 2-level ``(dcn, data, model)`` mesh maps multi-host volume fan-out onto
DCN while slice/voxel parallelism rides ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int | None = None,
    model: int = 1,
    dcn: int = 1,
    devices=None,
) -> Mesh:
    """Build a (dcn, data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (model * dcn)
    want = dcn * data * model
    if want > n:
        raise ValueError(f"Mesh {dcn}x{data}x{model} needs {want} devices, have {n}")
    arr = np.asarray(devices[:want]).reshape(dcn, data, model)
    return Mesh(arr, ("dcn", "data", "model"))


def vit_param_shardings(params: dict, mesh: Mesh) -> dict:
    """GSPMD tensor-parallel shardings for the ViT parameter pytree.

    Attention qkv/proj and MLP fc1/fc2 are sharded on the head/hidden
    dimension over the ``model`` axis (Megatron-style column→row split);
    everything else is replicated. XLA inserts the psum for the row-sharded
    matmuls. With ``model=1`` this degenerates to full replication.
    """

    def repl():
        return NamedSharding(mesh, P())

    def col():  # kernel (in, out): shard out
        return NamedSharding(mesh, P(None, "model"))

    def row():  # kernel (in, out): shard in
        return NamedSharding(mesh, P("model", None))

    def vec_sharded():
        return NamedSharding(mesh, P("model"))

    shardings = jax.tree.map(lambda _: repl(), params)
    for i, blk in enumerate(params["blocks"]):
        s = shardings["blocks"][i]
        s["qkv"] = {"kernel": col(), "bias": vec_sharded()}
        s["fc1"] = {"kernel": col(), "bias": vec_sharded()}
        s["proj"] = {"kernel": row(), "bias": repl()}
        s["fc2"] = {"kernel": row(), "bias": repl()}
    return shardings


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place ViT params on the mesh with TP shardings."""
    return jax.device_put(params, vit_param_shardings(params, mesh))
