#!/usr/bin/env python
"""H2D/compute overlap profile of one steady counting pass (VERDICT r3 #3).

The r3 profile showed a steady k=14 pass behaving like SUM(copy, compute),
not MAX — i.e. the async device_put pipeline may not actually overlap with
device steps through the tunnel.  This tool separates the terms with three
controlled runs over the SAME parsed batches:

  A  h2d-only   : device_put every batch back-to-back, one fence
  B  compute-only: all buffers pre-staged on device, run the pass's
                   dedupe+merge dispatches, one fence
  C  pipelined  : the real prefetch pipeline (parse excluded: batches are
                   pre-packed on host)
  D  end-to-end : counter.count_file (includes parse)

If C ~= A + B the link serializes copies against compute (the pass floor is
copy-bound); if C ~= max(A, B) the overlap works and the gap is elsewhere.

Usage: python tools/passprofile.py [--k 14] [--reads 20000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--l", type=int, default=24)
    ap.add_argument("--reads", type=int, default=20_000)
    ap.add_argument("--batch-words", type=int, default=0)
    ap.add_argument("--merge-every", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import auto_batch_words, bench_fastq_path, ensure_synth_fastq
    from tsxcount_tpu.core.counter import KmerCounter
    from tsxcount_tpu.io.native import NativeFileReader

    fastq = bench_fastq_path(args.reads)
    ensure_synth_fastq(fastq, n_reads=args.reads)
    if not args.batch_words:
        args.batch_words = auto_batch_words(fastq, args.k, False)

    counter = KmerCounter(
        k=args.k, l=args.l, batch_words=args.batch_words,
        merge_every=args.merge_every, collapse_homopolymers=False,
    )
    # warm the auto hint + compile by one full run
    t0 = time.perf_counter()
    counter.count_file(fastq)
    _ = counter.distinct
    print(f"cold pass: {time.perf_counter() - t0:.3f} s", file=sys.stderr)

    # pre-parse every batch to host memory (untimed)
    reader = NativeFileReader(fastq, counter.batch, collapse=False)
    host_bufs = [pb.buf.copy() for pb in reader]
    n_batches = len(host_bufs)
    windows = reader.stats.windows
    print(f"{n_batches} batches, {windows} windows", file=sys.stderr)

    def fence(xs):
        jax.device_get(xs[-1].ravel()[0] if hasattr(xs[-1], "ravel")
                       else xs[-1])

    results = {}

    def record(name, dt):
        results[name] = round(dt, 4)
        print(f"  {name:>14}: {dt:9.3f} s", file=sys.stderr)

    # A: H2D only — put all batches, fence each buffer's last word once
    # at the end (one device_get of a concat forces all copies complete)
    import jax.numpy as jnp

    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        bufs = [jax.device_put(b) for b in host_bufs]
        tails = jnp.stack([b[-1] for b in bufs])
        jax.device_get(tails)
        best = min(best, time.perf_counter() - t0)
    record("A h2d_only", best)
    staged = [jax.device_put(b) for b in host_bufs]
    jax.device_get(jnp.stack([b[-1] for b in staged]))

    # A': raw link ceiling — the same total bytes as ONE contiguous
    # device_put (no per-batch framing).  A/A' >= ~0.95 proves the
    # per-batch copies saturate the tunnel (VERDICT r4 #8 proof branch).
    import numpy as np

    big = np.concatenate(host_bufs)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        d = jax.device_put(big)
        jax.device_get(d[-1])
        best = min(best, time.perf_counter() - t0)
        del d
    record("A2 raw_link", best)

    # B: compute only — all inputs resident, dispatch the pass
    best = float("inf")
    for _ in range(args.reps):
        counter.reset()
        t0 = time.perf_counter()
        counter._consume_bufs(iter(staged))
        counter._flush_pending()
        _ = counter.distinct  # fence
        best = min(best, time.perf_counter() - t0)
    record("B compute_only", best)

    # C: pipelined, parse excluded — prefetch thread does the device_put
    from tsxcount_tpu.io.pipeline import prefetch

    best = float("inf")
    for _ in range(args.reps):
        counter.reset()
        t0 = time.perf_counter()
        counter._consume_bufs(
            prefetch(iter(host_bufs), jax.device_put,
                     depth=counter.prefetch_depth)
        )
        counter._flush_pending()
        _ = counter.distinct
        best = min(best, time.perf_counter() - t0)
    record("C pipelined", best)

    # C2: pipelined with compute replaced by a same-dispatch-count trivial
    # program — separates dispatch-RPC serialization (tunnel multiplexes
    # control + bulk data on one stream) from true compute/copy overlap.
    # C - A ~= C2 - A would mean the residual is dispatch cost, not a
    # failure to overlap compute.
    n_dispatch = 2  # ~the real pass's dispatches/batch (step + amortized merge)
    dummy = jax.jit(lambda x: x[:8] + 1)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        outs = []
        for buf in prefetch(iter(host_bufs), jax.device_put,
                            depth=counter.prefetch_depth):
            for _i in range(n_dispatch):
                outs.append(dummy(buf))
        jax.device_get(outs[-1][0])
        best = min(best, time.perf_counter() - t0)
    record("C2 dispatch_only", best)

    # D: the real end-to-end fresh pass (parse + pack + pipeline)
    best = float("inf")
    for _ in range(args.reps):
        counter.reset()
        t0 = time.perf_counter()
        counter.count_file(fastq)
        _ = counter.distinct
        best = min(best, time.perf_counter() - t0)
    record("D end_to_end", best)

    a, b, c = results["A h2d_only"], results["B compute_only"], results["C pipelined"]
    overlap = (a + b - c) / min(a, b) if min(a, b) > 0 else 0.0
    results["link_saturation"] = round(results["A2 raw_link"] / a, 3)
    results.update(
        n_batches=n_batches,
        windows=windows,
        batch_words=args.batch_words,
        k=args.k,
        sum_ab=round(a + b, 4),
        max_ab=round(max(a, b), 4),
        overlap_fraction=round(overlap, 3),
        h2d_mb_per_s=round(
            n_batches * len(host_bufs[0]) * 4 / a / 2**20, 1
        ),
    )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
