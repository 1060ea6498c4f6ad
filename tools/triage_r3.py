#!/usr/bin/env python
"""Round-3 regression triage: fresh-pass k=14 times across
{fused merge on/off} x {hp collapse on/off}, in ONE process so the
in-process jit cache + persistent compile cache amortize compiles.

Usage: python tools/triage_r3.py [--passes 3] [--platform cpu]
"""
from __future__ import annotations

import argparse
import json
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reads", type=int, default=20000)
    ap.add_argument("--l", type=int, default=24)
    ap.add_argument("--batch-words", type=int, default=602112)
    args = ap.parse_args()

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import bench_fastq_path, ensure_synth_fastq
    from tsxcount_tpu.core import store as store_mod
    from tsxcount_tpu.core.counter import KmerCounter

    path = bench_fastq_path(args.reads)
    ensure_synth_fastq(path, n_reads=args.reads)

    results = []
    for fused in (True, False):
        for hp in (True, False):
            store_mod._FUSED_MERGE = fused
            counter = KmerCounter(
                k=14, l=args.l, batch_words=args.batch_words,
                merge_every=2, collapse_homopolymers=hp,
            )
            t0 = time.perf_counter()
            counter.count_file(path)
            distinct = counter.distinct
            cold = time.perf_counter() - t0
            times = []
            for _ in range(args.passes):
                counter.reset()
                t0 = time.perf_counter()
                counter.count_file(path)
                d2 = counter.distinct
                times.append(round(time.perf_counter() - t0, 4))
                assert d2 == distinct, (d2, distinct)
            row = {
                "fused": fused, "hp": hp, "cold_s": round(cold, 1),
                "passes_s": times, "best_s": min(times),
                "total_kmers": counter.total_kmers, "distinct": distinct,
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
