#!/usr/bin/env python
"""Sharded-counter scaling table on the virtual CPU mesh (1/2/4/8 devices).

Validates that the multi-chip program's per-device work really shrinks with
the shard count: the same synthetic stream is counted at n_shards in
{1, 2, 4, 8}, results are checked for exactness at every width, and the
wall/device time per pass is tabulated.

NOTE on reading the numbers: this host has 2 vCPUs simulating all 8 devices,
so wall-clock here measures *total* work, not parallel speedup — flat wall
across widths means the program is work-conserving (no redundant per-shard
compute), which is exactly the property a real slice converts into linear
speedup (the all_to_all then rides ICI).  Real-chip throughput lives in
bench.py --shards N.

Writes a markdown table to stdout and a JSON blob to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--l", type=int, default=18)
    ap.add_argument("--reads", type=int, default=2000)
    ap.add_argument("--read-len", type=int, default=500)
    ap.add_argument("--genome", type=int, default=100_000,
                    help="reads are sampled from a genome of this many "
                         "bases, bounding distinct keys (realistic "
                         "duplication; keeps the store term of the merge "
                         "cost data-dominated at every width)")
    ap.add_argument("--batch-words", type=int, default=1 << 11)
    ap.add_argument("--widths", default="1,2,4,8")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tsxcount_tpu.core.counter import KmerCounter
    from tsxcount_tpu.parallel.sharded import ShardedKmerCounter

    rng = np.random.default_rng(7)
    base = np.array(list("ACGT"))
    genome = "".join(base[rng.integers(0, 4, size=args.genome)])
    starts = rng.integers(0, args.genome - args.read_len, size=args.reads)
    reads = [genome[s : s + args.read_len] for s in starts]

    # single-chip truth (and the 1-device wall baseline for the same code)
    single = KmerCounter(k=args.k, l=args.l, batch_words=args.batch_words)
    single.add_reads(reads)
    single.finish()
    truth_distinct = single.distinct
    total = single.total_kmers

    rows = []
    for n in [int(w) for w in args.widths.split(",")]:
        counter = ShardedKmerCounter(
            k=args.k, n_shards=n, l=args.l, batch_words=args.batch_words,
        )
        counter.add_reads(reads)  # compile pass
        counter.finish()
        assert counter.distinct == truth_distinct, (
            n, counter.distinct, truth_distinct
        )
        best = float("inf")
        for _ in range(args.passes):
            counter.reset()
            t0 = time.perf_counter()
            counter.add_reads(reads)
            counter.finish()
            assert counter.distinct == truth_distinct
            best = min(best, time.perf_counter() - t0)
        st = counter.stats()
        rows.append({
            "n_shards": n,
            "wall_s": round(best, 3),
            "kmers_per_s": round(total / best),
            "shard_imbalance": st["shard_imbalance"],
            "global_batches": st["batches"],
        })
        print(f"n={n}: wall={best:.3f}s  kmers/s={total/best:,.0f}  "
              f"imbalance={st['shard_imbalance']}", file=sys.stderr)

    print("\n| shards | wall (s) | kmers/s | rel. wall vs 1 | imbalance |")
    print("|---|---|---|---|---|")
    w1 = rows[0]["wall_s"]
    for r in rows:
        print(f"| {r['n_shards']} | {r['wall_s']} | {r['kmers_per_s']:,} "
              f"| {r['wall_s']/w1:.2f}x | {r['shard_imbalance']} |")

    blob = {"total_kmers": total, "distinct": truth_distinct,
            "k": args.k, "rows": rows,
            "note": "2-vCPU host simulating the mesh: flat wall across "
                    "widths == work-conserving program (see docstring)"}
    if args.out:
        Path(args.out).write_text(json.dumps(blob, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
