"""Assemble QUALITY_r05.json from the round-5 measurement runs.

Inputs (produced by scripts/fastmode_quality.py --out, see each block),
all measured on the real chip:
- vit-ssl pinned-oracle sweeps at 256/512 (9 cells each) and 1024 (3 cells)
- structured strong-oracle A/B on the HARD phantom (4x/8x/16x)
- refinement uplift A/B: CNN oracle on easy + hard, ViT-SSL oracle on easy

Usage: python scripts/assemble_quality_r05.py out.json sweep_256_512.json \
           sweep_1024.json structured_hard.json refine_easy.json \
           refine_hard.json refine_vit_easy.json
"""
from __future__ import annotations

import json
import sys

import numpy as np


def load(path):
    """Missing/failed runs degrade to empty cell lists so a partial
    measurement session still assembles (the doc records what ran)."""
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        print(f"WARNING: {path}: {e} — assembling without it",
              file=sys.stderr)
        return []


def delta_summary(cells, key="iou_delta"):
    d = [c[key] for c in cells]
    return {
        "mean": float(np.mean(d)),
        "min": float(np.min(d)),
        "max": float(np.max(d)),
        "n": len(d),
    }


def main():
    (out_path, sweep_small, sweep_1024, structured_hard,
     refine_easy, refine_hard, refine_vit) = sys.argv[1:8]

    sweeps = load(sweep_small) + load(sweep_1024)
    s_hard = load(structured_hard)
    r_easy = load(refine_easy)
    r_hard = load(refine_hard)
    r_vit = load(refine_vit)

    vit_by_factor = {}
    for s in sweeps:
        factor = s["size"] // s["fos"]
        vit_by_factor[f"{s['size']}^3 ({factor}x)"] = delta_summary(s["cells"])

    hard_by_size = {}
    for r in s_hard:
        hard_by_size.setdefault(f"{r['size']}^3 ({r['size']//r['fos']}x)", []).append(
            r["iou_delta"]
        )
    hard_summary = {
        k: {"mean": float(np.mean(v)), "min": float(np.min(v)),
            "max": float(np.max(v)), "n": len(v)}
        for k, v in hard_by_size.items()
    }

    def refine_summary(cells):
        if not cells:
            return {"missing": True}
        return {
            "base_mIoU": [c["base"]["mIoU_fg"] for c in cells],
            "bls_uplift": [c["bls_uplift"] for c in cells],
            "island_uplift": [c["island_uplift"] for c in cells],
            "stack_uplift": [c["stack_uplift"] for c in cells],
        }

    doc = {
        "date": "2026-08-19",
        "hardware": "1x TPU v5e (axon tunnel)",
        "note": (
            "VERDICT r4 items 2+3+6: ViT-path fast-vs-full A/B at "
            "4x/8x/16x from a PINNED >=0.5-mIoU SSL oracle (trained once "
            "at 256^3; per-size retraining collapses at 512^3 and was "
            "the r4 weakness), the structured strong-oracle A/B re-run "
            "on the anatomy-like HARD phantom, and the refinement "
            "stack's measured IoU uplift (base/bls/island/bls_island) "
            "on both oracles and both phantom families."
        ),
        "vit_ssl_pinned": {"sweeps": sweeps},
        "structured_hard_phantom": {"cells": s_hard},
        "refinement": {
            "cnn_oracle_easy": r_easy,
            "cnn_oracle_hard": r_hard,
            "vit_ssl_oracle_easy": r_vit,
        },
        "summary": {
            "vit_ssl_delta_by_factor": vit_by_factor,
            "structured_hard_delta_by_factor": hard_summary,
            "refinement_uplift": {
                "cnn_easy": refine_summary(r_easy),
                "cnn_hard": refine_summary(r_hard),
                "vit_easy": refine_summary(r_vit),
            },
        },
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["summary"], indent=1))


if __name__ == "__main__":
    main()
