"""One-command quality run from a LOCAL pretrained checkpoint.

The reference's headline result (IoU 0.981 on CT-ORG with pretrained DINO
ViT-S/8 features, plot_performance.py:64, infer.py:42-46) cannot be
reproduced in this air-gapped environment — torch.hub is unreachable and
no pretrained weights ship with the repo. This script is the turnkey path
for the day weights exist: given a local checkpoint (``.pth`` hub layout
or converted ``.npz``), it runs extract → similarity → fuse → IoU on a
real volume+labels pair (or the labeled synthetic phantom) and writes a
machine-readable metrics JSON.

    # with real weights + a CT volume:
    python -m vittf_tpu.cli.fetch_weights vits8 --out-dir weights
    python scripts/real_weight_quality.py \
        --checkpoint weights/dino_deitsmall8_pretrain.pth \
        --volume ct.npy --labels ct_labels.npy --out metrics.json

    # offline smoke (random weights, synthetic phantom):
    python scripts/real_weight_quality.py --phantom 64 --annotations 64

Offline-tested against a random full-scale hub-layout checkpoint
(tests/test_real_weight_quality.py uses the same fixture scheme as
tests/test_fullscale_parity.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        "extract → similarity → fuse → IoU from a local checkpoint"
    )
    ap.add_argument("--checkpoint", default=None,
                    help=".pth (hub layout) or converted .npz; omit for "
                         "random weights (smoke mode)")
    ap.add_argument("--arch", default="vits8")
    ap.add_argument("--volume", default=None, help="volume .npy/.pt path")
    ap.add_argument("--labels", default=None, help="GT labels .npy path")
    ap.add_argument("--phantom", type=int, default=None,
                    help="use the labeled synthetic phantom at SIZE³ "
                         "instead of --volume/--labels")
    ap.add_argument("--annotations", type=int, default=256)
    ap.add_argument("--fos", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--fast", action="store_true",
                    help="slice-subsample fast mode (default: full sweep)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="metrics JSON output path")
    args = ap.parse_args(argv)

    import jax

    from vittf_tpu.models.dino import ALL_ARCHS, load_dino_checkpoint
    from vittf_tpu.pipeline.annotations import annotations_from_labels
    from vittf_tpu.pipeline.evaluate import segmentation_metrics
    from vittf_tpu.pipeline.features import ExtractConfig
    from vittf_tpu.pipeline.quality import _sample_background, ntf_predict

    cfg = ALL_ARCHS[args.arch]
    if args.checkpoint is None:
        from vittf_tpu.models.vit import init_vit_params

        print("no checkpoint given: RANDOM weights (smoke mode) — quality "
              "numbers are NOT the pretrained-DINO result", file=sys.stderr)
        params = init_vit_params(cfg, jax.random.PRNGKey(args.seed))
        weights = "random"
    elif args.checkpoint.endswith(".npz"):
        from vittf_tpu.models.serialization import load_params_npz

        params = load_params_npz(args.checkpoint)
        weights = args.checkpoint
    else:
        params = load_dino_checkpoint(args.checkpoint, cfg)
        weights = args.checkpoint

    if args.phantom:
        from vittf_tpu.core.synthetic import make_multiclass_volume

        vol, labels = make_multiclass_volume(args.phantom, seed=args.seed)
        names = ["background"] + [
            f"c{i}" for i in range(1, int(labels.max()) + 1)
        ]
    else:
        if not (args.volume and args.labels):
            ap.error("need --volume AND --labels (or --phantom SIZE)")
        from vittf_tpu.core.io import load_volume

        vol = load_volume(args.volume)
        labels = np.asarray(load_volume(args.labels)).astype(np.int32)
        names = ["background"] + [
            f"class{i}" for i in range(1, int(labels.max()) + 1)
        ]

    rng = np.random.default_rng(args.seed)
    annotations = annotations_from_labels(
        labels, args.annotations, "both", rng=rng
    )
    n_fg = len(annotations)
    annotations["bg"] = _sample_background(
        np.asarray(labels), args.annotations, rng
    )

    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    ex_cfg = ExtractConfig(
        feature_output_size=args.fos,
        slice_along="all",
        batch_size=args.batch,
        attn_impl="auto",
        compute_dtype="bfloat16" if on_tpu else "float32",
        block_impl="fused" if on_tpu else "xla",
        slice_subsample=args.fast,
    )
    pred, times = ntf_predict(vol, params, cfg, ex_cfg, annotations)
    pred = np.where(pred == n_fg + 1, 0, pred)  # bg class → label 0
    m = segmentation_metrics(labels, pred, names)
    fg_iou = {k: v for k, v in m["iou"].items() if k != "background"}

    result = {
        "arch": args.arch,
        "weights": weights,
        "volume": args.volume or f"phantom{args.phantom}",
        "mode": "fast" if args.fast else "full",
        "n_annotations": args.annotations,
        "mIoU_fg": float(np.mean(list(fg_iou.values()))),
        "iou": fg_iou,
        "accuracy": m["mAcc"],
        **times,
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
