"""Interactive serving CLI: the artifact-contract loop any frontend can use.

    python -m vittf_tpu.cli.serve --data DIR [--bilateral-solver]

Loads (or extracts) the feature volume once, then watches
``annotations.npy`` in the data directory; every change is answered by
rewriting ``similarities.npy`` and ``predictions.npy`` — the contract the
reference's Inviwo GUI module speaks (SURVEY.md §3.5).
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser


def build_parser() -> ArgumentParser:
    p = ArgumentParser("Serve interactive similarity over the artifact contract")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--bilateral-solver", action="store_true")
    p.add_argument("--impl", type=str, default="auto",
                   choices=["auto", "pallas", "xla"])
    p.add_argument("--poll-interval", type=float, default=0.25)
    p.add_argument("--max-updates", type=int, default=None,
                   help="Exit after N updates (default: run forever)")
    p.add_argument("--no-prewarm", action="store_true",
                   help="Skip the startup graph warmup (first real user "
                        "edit then pays the compile instead)")
    p.add_argument("--prewarm-classes", type=int, default=None,
                   help="Classes to warm (default: one class bucket, so "
                        "any count within the bucket hits warm graphs)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from vittf_tpu.core.runtime import enable_compilation_cache

    enable_compilation_cache()
    from vittf_tpu.pipeline.session import InteractiveSession, watch_directory

    session = InteractiveSession.from_artifacts(
        args.data, bilateral_solver=args.bilateral_solver, impl=args.impl
    )
    if not args.no_prewarm:
        t = session.prewarm(n_classes=args.prewarm_classes)
        print(f"Graphs warmed in {t:.1f}s (first user edit runs at "
              "steady-state latency)")
    print(f"Serving {args.data}: features {tuple(session.features.shape)}; "
          "watching annotations.npy")
    watch_directory(
        args.data, session,
        poll_interval=args.poll_interval, max_updates=args.max_updates,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
