#!/usr/bin/env python
"""Synthetic FASTQ generator (reference generateFakeSequences.py parity).

Same read distribution as the reference tool: random ACGT body of 500-1000 bp
plus a 100-300 bp polyA tail, constant quality (reference
generateFakeSequences.py:7-18) — but deterministic via --seed and vectorized.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--min-len", type=int, default=500)
    ap.add_argument("--max-len", type=int, default=1000)
    ap.add_argument("--polya-min", type=int, default=100)
    ap.add_argument("--polya-max", type=int, default=300)
    ap.add_argument("--output", default="-")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    base = np.array(list("ACGT"))
    out = sys.stdout if args.output == "-" else open(args.output, "w")
    try:
        for i in range(args.reads):
            n = int(rng.integers(args.min_len, args.max_len))
            tail = int(rng.integers(args.polya_min, args.polya_max))
            seq = "".join(base[rng.integers(0, 4, size=n)]) + "A" * tail
            out.write(f"@fake{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
