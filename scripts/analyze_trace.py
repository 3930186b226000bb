"""Aggregate an xplane trace into a per-category / per-op time table.

Companion to scripts/profile_extract.py: that script writes a
jax.profiler trace of one steady-state extraction; this one turns the
trace into numbers a human can act on (the per-op attribution VERDICT r3
next-round #3 asked for). Uses xprof's hlo_stats converter, aggregates
HLO self-times by category and by framework op, and prints the top
entries with their share of on-device time.

Usage: python scripts/analyze_trace.py /tmp/vittf_trace_fast [--top 25]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def newest_xplane(trace_dir: str) -> str:
    paths = glob.glob(
        os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
    )
    if not paths:
        sys.exit(f"no .xplane.pb under {trace_dir}")
    return max(paths, key=os.path.getmtime)


def load_hlo_stats(xplane: str) -> tuple[list[str], list[list]]:
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data([xplane], "hlo_stats", {})
    table = json.loads(data.decode() if isinstance(data, bytes) else data)
    cols = [c["id"] for c in table["cols"]]
    rows = [[c["v"] for c in row["c"]] for row in table["rows"]]
    return cols, rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args(argv)

    xplane = newest_xplane(args.trace_dir)
    print(f"trace: {xplane}", file=sys.stderr)
    cols, rows = load_hlo_stats(xplane)
    i_cat = cols.index("category")
    i_name = cols.index("hlo_op_name")
    i_fw = cols.index("tf_op_name")
    i_self = cols.index("total_self_time")
    i_occ = cols.index("occurrences")

    total = sum(row[i_self] for row in rows) or 1.0
    by_cat: dict[str, float] = {}
    by_op: dict[str, tuple[float, int, str]] = {}
    for row in rows:
        by_cat[row[i_cat]] = by_cat.get(row[i_cat], 0.0) + row[i_self]
        key = row[i_name]
        prev = by_op.get(key, (0.0, 0, row[i_cat]))
        by_op[key] = (prev[0] + row[i_self], prev[1] + row[i_occ], row[i_cat])
        _ = row[i_fw]

    print(f"\non-device total self time: {total/1e6:.3f} s")
    print("\n== by HLO category ==")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:<28} {t/1e6:8.3f} s  {t/total*100:5.1f}%")
    print(f"\n== top {args.top} ops by self time ==")
    top = sorted(by_op.items(), key=lambda kv: -kv[1][0])[: args.top]
    for name, (t, occ, cat) in top:
        print(
            f"  {t/1e6:8.4f} s {t/total*100:5.1f}%  x{occ:<6} "
            f"[{cat}] {name[:70]}"
        )
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(
                {
                    "trace": xplane,
                    "total_self_time_s": total / 1e6,
                    "by_category_s": {
                        k: v / 1e6 for k, v in sorted(
                            by_cat.items(), key=lambda kv: -kv[1]
                        )
                    },
                    "top_ops": [
                        {
                            "op": name, "self_time_s": t / 1e6,
                            "occurrences": occ, "category": cat,
                        }
                        for name, (t, occ, cat) in top
                    ],
                },
                f, indent=1,
            )
        print(f"json written to {args.json_out}", file=sys.stderr)


if __name__ == "__main__":
    main()
