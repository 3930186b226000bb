"""User-study evaluation CLI — the reference ``evaluate_similarities.py``.

    python -m vittf_tpu.cli.evaluate --data DIR --label labels.npy \
        --labels lung liver kidney
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser
from pathlib import Path
from pprint import pprint


def build_parser() -> ArgumentParser:
    p = ArgumentParser("Evaluate exported GUI predictions against GT labels")
    p.add_argument("--data", type=Path, required=True)
    p.add_argument("--label", type=Path, default="userstudy/labels-10.npy")
    p.add_argument("--labels", type=str, nargs="+",
                   default=["lung", "liver", "kidney"],
                   help="Label names found in predictions (in order)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from vittf_tpu.pipeline.evaluate import evaluate_user_study

    results = evaluate_user_study(args.data, args.label, args.labels)
    pprint(results)
    return 0


if __name__ == "__main__":
    sys.exit(main())
