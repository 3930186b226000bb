"""Feature-extraction CLI — the reference ``infer.py`` command surface.

    python -m vittf_tpu.cli.infer --data-path volume.npy --slice-along all

Differences from the reference, by design:
- ``--weights`` loads a converted DINO checkpoint (``.pth`` torch state_dict
  or converted ``.npz``); there is no torch.hub download at run time. With
  no weights given, randomly initialized weights are used (a warning is
  printed — features are then only useful for smoke/benchmark runs).
- ``--precision highest`` switches to the fp32 parity mode (exact erf GELU,
  fp32 matmuls); the default is bf16 speed mode.
"""
from __future__ import annotations

import sys
import time
from argparse import ArgumentParser
from pathlib import Path

import jax
import numpy as np

DINO_ARCH_NAMES = ["vits16", "vits8", "vitb16", "vitb8"]
DINO2_ARCH_NAMES = ["vits14", "vitb14", "vitl14", "vitg14"]


def handle_output_path(args, model_name: str) -> Path:
    """Cache-path construction + overwrite guard (infer.py:266-288)."""
    data_path = Path(args.data_path)
    if not args.cache_path:
        args.cache_path = (
            data_path.parent
            / f"{data_path.stem}_{model_name}_{args.slice_along}_features"
            f"{args.feature_output_size}{data_path.suffix}"
        )
    cache_path = Path(args.cache_path)
    if cache_path.exists() and not args.overwrite:
        print(f"Cache file already exists: {cache_path}. Use --overwrite to overwrite.")
        sys.exit(1)
    return cache_path


def build_parser() -> ArgumentParser:
    p = ArgumentParser("Infer DINO features from saved volume")
    p.add_argument("--data-path", type=str, required=True)
    p.add_argument("--cache-path", type=str, default=None)
    p.add_argument("--dino-model", type=str, choices=DINO_ARCH_NAMES, default=None)
    p.add_argument("--dino2-model", type=str, choices=DINO2_ARCH_NAMES, default=None)
    p.add_argument("--weights", type=str, default=None,
                   help="Path to a DINO checkpoint (.pth) or converted params (.npz)")
    p.add_argument("--slice-along", type=str, choices=["x", "y", "z", "all"], default="all")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--feature-output-size", type=int, default=64)
    p.add_argument("--return-keys", type=str, nargs="+", default=["k"],
                   choices=["q", "k", "v"])
    p.add_argument("--precision", type=str, default="default",
                   choices=["default", "highest"])
    p.add_argument("--compute-dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--block-impl", type=str, default="xla",
                   choices=["xla", "fused", "fused_rows"],
                   help="'fused' = fused Pallas transformer-block kernel "
                        "(bf16 speed mode only; ~25%% faster extraction); "
                        "'fused_rows' = its row-block-pipelined variant")
    p.add_argument("--fast", action="store_true",
                   help="Slice-subsample fast mode: run the ViT only on "
                        "the slices nearest the pooled output grid (the "
                        "reference's sketched shortcut, infer.py:160-166); "
                        "NOT artifact-parity with the full sweep")
    p.add_argument("--streamed", action="store_true",
                   help="Host-streamed extraction: volume stays in host "
                        "memory, slice chunks stream to the device — for "
                        "volumes past HBM residency (e.g. 2048^3)")
    p.add_argument("--chunk-batches", type=int, default=8,
                   help="Device-resident slice-batch chunk size for "
                        "--streamed")
    p.add_argument("--preserve-dtype", action="store_true",
                   help="Keep compact volume dtypes (uint8/16, fp16) on "
                        "device instead of casting to fp32 — bit-identical "
                        "features, 2-4x less HBM for big volumes")
    p.add_argument("--feature-dtype", type=str, default="float16",
                   choices=["float16", "float32", "uint8"],
                   help="artifact storage dtype; uint8 = per-channel "
                        "quantized compact artifact (2x smaller than the "
                        "reference's fp16, infer.py:337-340)")
    p.add_argument("--cpu", action="store_true", help="Force CPU execution")
    p.add_argument("--data-parallel", action="store_true",
                   help="Shard slice batches over all available devices")
    p.add_argument("--overwrite", action="store_true")
    return p


def load_params(args, cfg):
    from vittf_tpu.models.vit import init_vit_params

    if args.weights:
        wp = Path(args.weights)
        if wp.suffix == ".npz":
            flat = dict(np.load(wp))
            from vittf_tpu.models.serialization import unflatten_params

            return unflatten_params(flat)
        from vittf_tpu.models.dino import load_dino_checkpoint

        return load_dino_checkpoint(wp, cfg)
    print(
        "WARNING: no --weights given; using random initialization "
        "(features are not DINO features)."
    )
    return init_vit_params(cfg, jax.random.PRNGKey(0))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from vittf_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vittf_tpu.core.io import load_volume, save_features
    from vittf_tpu.models.dino import resolve_model
    from vittf_tpu.pipeline.features import ExtractConfig, extract_features

    cfg = resolve_model(args.dino_model, args.dino2_model)
    cache_path = handle_output_path(args, cfg.name)
    # --streamed exists for volumes past device/host comfort; casting an
    # 8 GB uint8 volume to fp32 first would quadruple host RAM and H2D
    # traffic, so streaming implies the (bit-identical) compact-dtype path
    preserve = args.preserve_dtype or args.streamed
    vol = load_volume(args.data_path, preserve_dtype=preserve)
    print(f"Loaded volume: {vol.shape} {vol.dtype}")

    params = load_params(args, cfg)
    if args.precision == "highest":
        args.compute_dtype = "float32"
    ex_cfg = ExtractConfig(
        feature_output_size=args.feature_output_size,
        slice_along=args.slice_along,
        batch_size=args.batch_size,
        return_keys=tuple(args.return_keys),
        precision=args.precision,
        compute_dtype=args.compute_dtype,
        block_impl=args.block_impl,
        slice_subsample=args.fast,
    )
    t0 = time.time()
    if args.streamed:
        from vittf_tpu.pipeline.streamed import extract_features_streamed

        qkv = extract_features_streamed(
            vol, params, cfg, ex_cfg, chunk_batches=args.chunk_batches
        )
    elif args.data_parallel and len(jax.devices()) > 1:
        from vittf_tpu.parallel.extract import extract_features_sharded
        from vittf_tpu.parallel.mesh import make_mesh

        qkv = extract_features_sharded(vol, params, cfg, ex_cfg, make_mesh())
    else:
        qkv = extract_features(vol, params, cfg, ex_cfg)
    jax.block_until_ready(qkv)
    print(
        f"Computed qkv along {args.slice_along} in {time.time() - t0}s, "
        f"saving now to: {cache_path}"
    )
    # fp16 (reference parity) by default; --feature-dtype uint8 opts into
    # the compact per-channel-quantized artifact
    dtype = {"float16": np.float16, "float32": np.float32, "uint8": "uint8"}[
        args.feature_dtype
    ]
    save_features(cache_path, qkv, dtype=dtype)
    return 0


if __name__ == "__main__":
    sys.exit(main())
