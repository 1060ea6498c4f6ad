#!/usr/bin/env python
"""Benchmark sweep harness (reference analyses/perform_analyses.py parity).

Sweeps {k x backend x shards} over a synthetic dataset, with resume-if-exists
semantics like the reference runner (reference analyses/perform_analyses.py:
68-72), and writes one JSON line per configuration plus a summary table with
speedup/efficiency columns (reference analyses/plot_analyses.py:167-178).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_config(out_dir: Path, k: int, backend: str, reads: int,
               l: int, platform: str | None, repeat: int) -> dict | None:
    name = f"k{k}.{backend}.r{reads}.rep{repeat}"
    out_file = out_dir / f"{name}.json"
    if out_file.exists():  # resume
        return json.loads(out_file.read_text())
    cmd = [sys.executable, str(REPO / "bench.py"), "--k", str(k),
           "--backend", backend, "--reads", str(reads), "--l", str(l)]
    if platform:
        cmd += ["--platform", platform]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if proc.returncode != 0:
        print(f"FAIL {name}: {proc.stderr[-500:]}", file=sys.stderr)
        return None
    line = proc.stdout.strip().splitlines()[-1]
    out_file.write_text(line)
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results")
    ap.add_argument("--ks", default="14,31,63,127")
    ap.add_argument("--backends", default="sort")
    ap.add_argument("--reads", type=int, default=20000)
    ap.add_argument("--l", type=int, default=25)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--repeats", type=int, default=1)
    args = ap.parse_args()

    out_dir = Path(args.out)
    out_dir.mkdir(exist_ok=True)
    rows = []
    for k in [int(x) for x in args.ks.split(",")]:
        for backend in args.backends.split(","):
            for rep in range(args.repeats):
                res = run_config(out_dir, k, backend, args.reads, args.l,
                                 args.platform, rep)
                if res:
                    rows.append(res)
                    print(json.dumps(res))

    if rows:
        base = rows[0]["value"]
        print(f"\n{'metric':<28}{'kmers/s':>12}{'rel':>8}{'vs_ref':>8}")
        for r in rows:
            rel = r["value"] / base
            vs = r.get("vs_baseline") or 0
            print(f"{r['metric']:<28}{r['value']:>12}{rel:>8.2f}{vs:>8.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
