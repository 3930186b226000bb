"""Weight conversion CLI: torch DINO/DINOv2/visual-encoder checkpoints →
this framework's flat-npz parameter format.

    python -m vittf_tpu.cli.convert_weights dino_deitsmall8.pth out.npz \
        --arch vits8

Conversion is an explicit offline step (the reference downloads from
torch.hub at run time, infer.py:42-46 — unavailable in air-gapped
deployments).
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser


def main(argv=None) -> int:
    p = ArgumentParser("Convert a torch ViT checkpoint to vittf_tpu params")
    p.add_argument("checkpoint", type=str)
    p.add_argument("output", type=str, help="Output .npz path")
    p.add_argument("--arch", type=str, default="vits8",
                   help="Architecture name (vits8/vitb16/vits14/... or "
                        "blip_vitb16/clip_vitl14)")
    p.add_argument("--visual-encoder", action="store_true",
                   help="Strip a visual_encoder.* prefix (LAVIS BLIP/CLIP)")
    args = p.parse_args(argv)

    from vittf_tpu.models.clip import CLIP_ARCHS, load_visual_checkpoint
    from vittf_tpu.models.dino import ALL_ARCHS, load_dino_checkpoint
    from vittf_tpu.models.serialization import save_params_npz

    if args.arch in CLIP_ARCHS or args.visual_encoder:
        cfg = CLIP_ARCHS.get(args.arch) or ALL_ARCHS[args.arch]
        params = load_visual_checkpoint(args.checkpoint, cfg)
    else:
        cfg = ALL_ARCHS[args.arch]
        params = load_dino_checkpoint(args.checkpoint, cfg)
    out = save_params_npz(args.output, params)
    print(f"Wrote {out} ({cfg.name}: depth={cfg.depth}, dim={cfg.embed_dim})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
