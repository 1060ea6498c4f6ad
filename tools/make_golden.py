#!/usr/bin/env python
"""Golden-count generator: FASTQ/FASTA -> `kmer\tcount` TSV.

Replaces the reference's count_kmers.py, which has an off-by-one
(`range(0, len(seq)-k)` at reference count_kmers.py:24 drops each read's
final k-mer and does NOT regenerate the shipped golden file — SURVEY.md
§2.2).  This generator uses the inclusive len-k+1 window semantics of the
harness (reference src/mains/testExecution.h:15-36), which the shipped
golden file actually follows.  Reads shorter than k are skipped; windows
containing non-ACGT bases are dropped.
"""

from __future__ import annotations

import argparse
import collections
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tsxcount_tpu.io.fastx import read_fastx
from tsxcount_tpu.utils.goldenfile import write_golden


def count_file(path: str, k: int) -> collections.Counter:
    counts: collections.Counter = collections.Counter()
    valid = frozenset(b"ACGT")
    for rec in read_fastx(path):
        seq = rec.seq.upper()
        if len(seq) < k:
            continue
        for i in range(len(seq) - k + 1):
            win = seq[i : i + k]
            if all(c in valid for c in win):
                counts[win.decode("ascii")] += 1
    return counts


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--output", default=None,
                    help="default: <input>.<k>.count")
    args = ap.parse_args()
    out = args.output or f"{args.input}.{args.k}.count"
    counts = count_file(args.input, args.k)
    write_golden(out, dict(counts), sort=True)
    print(f"wrote {len(counts)} kmers to {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
