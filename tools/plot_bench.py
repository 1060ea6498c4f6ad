#!/usr/bin/env python
"""Benchmark report: table + plot from bench_results/*.json.

Parity with the reference's plot_analyses.py (speedup/efficiency LaTeX
table + log-scale scatter, reference analyses/plot_analyses.py:9-37,
129-196), emitting a markdown table and a PNG instead.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", default="bench_results")
    ap.add_argument("--out", default="bench_results/bench_table")
    args = ap.parse_args()

    rows = []
    for path in sorted(Path(args.results).glob("*.json")):
        data = json.loads(path.read_text())
        # only bench rows (dicts with a metric); skip scaling-model /
        # shard-scale artifacts that share the directory
        if isinstance(data, dict) and "metric" in data:
            rows.append(data)
    if not rows:
        print("no results found", file=sys.stderr)
        return 1
    rows.sort(key=lambda r: r.get("k", 0))

    md = [
        "| k | kmers/s/chip | vs reference | steady s | distinct |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r.get('k')} | {r['value']:,} | "
            f"{r.get('vs_baseline', 0):,.1f}x | "
            f"{r.get('steady_state_seconds', 0)} | "
            f"{r.get('distinct_kmers', 0):,} |"
        )
    table = "\n".join(md)
    Path(f"{args.out}.md").write_text(table + "\n")
    print(table)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ks = [r["k"] for r in rows]
        vals = [r["value"] / 1e6 for r in rows]
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(ks, vals, "o-", color="#4477AA")
        ax.set_xlabel("k")
        ax.set_ylabel("Mkmers/s per chip")
        ax.set_title("tsxcount_tpu throughput vs k (1x TPU v5e)")
        ax.set_xscale("log", base=2)
        ax.grid(True, alpha=0.3)
        baseline = rows[0].get("value", 0) / max(
            rows[0].get("vs_baseline", 1), 1e-9
        ) / 1e6
        ax.axhline(baseline, color="#CC6677", linestyle="--",
                   label=f"reference SERIAL ({baseline*1000:.0f}k/s)")
        ax.legend()
        fig.tight_layout()
        fig.savefig(f"{args.out}.png", dpi=120)
        print(f"wrote {args.out}.png", file=sys.stderr)
    except ImportError:
        print("matplotlib unavailable; table only", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
