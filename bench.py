#!/usr/bin/env python
"""Benchmark: steady-state k-mer counting throughput (kmers/s) on one chip.

Protocol (mirrors the reference's benchmark methodology of timing whole
counting runs over synthetic FASTQ, reference analyses/perform_analyses.py +
generateFakeSequences.py: 500-1000 bp random reads + 100-300 bp polyA tail):

  1. generate a deterministic synthetic FASTQ (~18.7M k=14 windows);
  2. count it once end-to-end (pays jit compile);
  3. count it again with the same jitted pipeline — the steady-state pass —
     and report kmers/s from that pass.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline compares against the reference tsxCount binary (SERIAL mode,
-O3, gcc 12) measured on this machine's CPU over the same synthetic file —
see REFERENCE_BASELINE below for the measurement provenance.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

# Reference baseline measured on this host (2-vCPU container):
#   /tmp/refbuild/tsxCount --input=synth.fastq --mode=SERIAL --threads=1
#   --k=14 --l=26 --s=4   over the same 20k-read synthetic file
#   (18 760 870 k=14 windows).  See BASELINE_MEASURED.json for raw numbers.
REFERENCE_BASELINE_KMERS_PER_S = None  # loaded from BASELINE_MEASURED.json

N_READS = 20_000


def bench_fastq_path(n_reads: int, read_len: tuple[int, int] | None = None
                     ) -> Path:
    tag = "" if read_len is None else f".len{read_len[0]}-{read_len[1]}"
    return Path(f"/tmp/tsxcount_bench.{n_reads}{tag}.fastq")


def ensure_synth_fastq(path: Path, n_reads: int = N_READS, seed: int = 42,
                       read_len: tuple[int, int] | None = None):
    """Default profile mirrors the reference generator (500-1000 bp +
    polyA tail, generateFakeSequences.py); an explicit read_len makes
    fixed-length reads with NO tail — the short-read (Illumina-like)
    regime the reference's benchmark datasets use
    (analyses/perform_analyses.py:24-26)."""
    if path.exists():
        return
    rng = np.random.default_rng(seed)
    base = np.array(list("ACGT"))
    with open(path, "w") as f:
        for i in range(n_reads):
            if read_len is None:
                n = int(rng.integers(500, 1000))
                tail = "A" * int(rng.integers(100, 300))
            else:
                n = int(rng.integers(read_len[0], read_len[1] + 1))
                tail = ""
            seq = "".join(base[rng.integers(0, 4, size=n)]) + tail
            f.write(f"@read{i}\n{seq}\n+\n{'I' * len(seq)}\n")


TARGET_BATCH_WORDS = 602112  # measured sweet spot on one v5e chip


def auto_batch_words(path: Path, k: int, collapse: bool) -> int:
    """Batch words sized to the dataset: an untimed native prepass counts
    the packed words the (collapse-aware) stream actually emits, then the
    batch count targeting ~TARGET words/batch divides it evenly (rounded
    up to the 256-word granularity the Pallas compaction tiles need, with
    0.4% slack for seam-overlap drift)."""
    from tsxcount_tpu.config import BatchSpec, KmerSpec
    from tsxcount_tpu.io.native import NativeFileReader, native_available

    if not native_available():
        return TARGET_BATCH_WORDS
    batch = BatchSpec(KmerSpec(k), TARGET_BATCH_WORDS, 384)
    reader = NativeFileReader(path, batch, collapse=collapse)
    for _ in reader:
        pass
    words = reader.stats.packed_words
    if not words:
        return TARGET_BATCH_WORDS
    n = max(1, round(words / TARGET_BATCH_WORDS))
    # 4096-word granularity: positions (16*words) stay a multiple of 2^16.
    # Measured on one v5e: 601344-word batches (positions 2^12-aligned
    # only) run the same pipeline 3x slower than 602112 (2^16-aligned) —
    # XLA tiles the sort/merge pipeline pathologically off the 2^16 grid.
    return -(-int(words * 1.004) // (n * 4096)) * 4096


def peak_rss_mb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024


def device_hbm_mb() -> float | None:
    """Device memory in use, when the backend exposes it."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats["bytes_in_use"] / 2**20, 1)
    except Exception:
        return None


def load_measured_baseline() -> float | None:
    p = Path(__file__).parent / "BASELINE_MEASURED.json"
    if p.exists():
        data = json.loads(p.read_text())
        return data.get("reference_serial_kmers_per_s")
    return REFERENCE_BASELINE_KMERS_PER_S


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--l", type=int, default=24)
    # 0 = auto: size batches to the dataset's actual packed-word count
    # (an untimed native prepass measures it, collapse-aware) targeting
    # ~602112 words/batch — fixed-shape H2D buffers then carry no dead
    # tail through the (slow) host->device link.  Any explicit even value
    # whose positions (16*words) are a 4096 multiple works.
    ap.add_argument("--batch-words", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--backend", default="sort")
    ap.add_argument("--reads", type=int, default=N_READS,
                    help="synthetic read count (default matches the "
                         "reference baseline measurement)")
    ap.add_argument("--read-len", default=None,
                    help="fixed read length 'MIN,MAX' (no polyA tail) — "
                         "e.g. '150,150' for the Illumina short-read "
                         "regime; default: reference profile 500-1000 bp "
                         "+ polyA")
    ap.add_argument("--merge-every", type=int, default=2,
                    help="batches folded per store merge (R)")
    ap.add_argument("--passes", type=int, default=6,
                    help="steady-state passes; the reported time is the "
                         "fastest (timeit-style, filters tunnel hiccups — "
                         "single passes vary 0.29-0.37 s through the "
                         "tunnel; each extra pass costs ~0.3 s)")
    ap.add_argument("--shards", type=int, default=1,
                    help="run the ShardedKmerCounter over N devices; "
                         "0 = the plain single-chip KmerCounter.  Default "
                         "1: on one chip the sharded pipeline measures "
                         "FASTER than the plain counter (r4: 64.8M vs "
                         "60.9M kmers/s at k=14 — no per-batch host "
                         "round trips, and its merge grid tiles better) "
                         "while counting the identical exact result")
    ap.add_argument("--lsm", action="store_true", default=None,
                    help="force the LSM store (default: auto-engage when "
                         "the cascade beats flat re-sorts)")
    ap.add_argument("--no-lsm", dest="lsm", action="store_false",
                    help="force the flat store")
    # Default OFF — bench, counter API, and CLI all agree since r4:
    # measured on one v5e + 2-vCPU host, the native splice pass costs
    # ~55 ms/pass while the H2D saving on the collapsed stream is ~41 ms —
    # a net loss at k=14 where the host+tunnel, not the device, bound the
    # pass (hp on @ auto: 0.319 s vs hp off @ auto: 0.294 s, r3 A/B).
    # Collapse still pays where device work dominates (large k) or on
    # tail-heavy data with fast hosts; flag it on to measure that regime.
    ap.add_argument("--hp-collapse", dest="hp_collapse",
                    action="store_true", default=False,
                    help="enable homopolymer run-length collapse at ingest")
    ap.add_argument("--no-hp-collapse", dest="hp_collapse",
                    action="store_false",
                    help="disable homopolymer run-length collapse at ingest")
    ap.add_argument("--hash-first", dest="hash_first", default=None,
                    action="store_true",
                    help="hash before dedupe + 64-bit prefix sort "
                         "(default: counter auto rule)")
    ap.add_argument("--no-hash-first", dest="hash_first",
                    action="store_false")
    ap.add_argument("--mix-prefix", dest="mix_prefix", default=None,
                    action="store_true",
                    help="VPU mixing-hash sort prefix over extended keys "
                         "(measured net loss on v5e — column movement "
                         "dominates lax.sort; kept for measurement)")
    ap.add_argument("--no-mix-prefix", dest="mix_prefix",
                    action="store_false")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    # persistent compilation cache: repeat invocations (e.g. the driver's
    # end-of-round run) skip the multi-minute remote compile
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from tsxcount_tpu.core.counter import KmerCounter

    read_len = None
    if args.read_len:
        lo, _, hi = args.read_len.partition(",")
        read_len = (int(lo), int(hi or lo))
    bench_fastq = bench_fastq_path(args.reads, read_len)
    ensure_synth_fastq(bench_fastq, n_reads=args.reads, read_len=read_len)

    if not args.batch_words:
        args.batch_words = auto_batch_words(
            bench_fastq, args.k, args.hp_collapse
        )

    if args.shards:
        from tsxcount_tpu.parallel.sharded import ShardedKmerCounter

        # flags the sharded counter does not take: fail loudly instead of
        # silently benchmarking a default configuration (ADVICE r3)
        if args.hash_first is not None:
            print("warning: --hash-first/--no-hash-first is ignored with "
                  "--shards (the sharded stream is already hashed for "
                  "routing)", file=sys.stderr)
        if args.mix_prefix is not None:
            print("warning: --mix-prefix is ignored with --shards",
                  file=sys.stderr)
        if args.lsm is not None:
            print("warning: --lsm/--no-lsm is ignored with --shards "
                  "(per-shard LSM auto-engages by the cascade rule)",
                  file=sys.stderr)
        counter = ShardedKmerCounter(
            k=args.k, n_shards=args.shards, l=args.l, backend=args.backend,
            batch_words=args.batch_words, merge_every=args.merge_every,
            capacity_factor=1.5,
            collapse_homopolymers=args.hp_collapse,
        )
    else:
        counter = KmerCounter(
            k=args.k, l=args.l, backend=args.backend,
            batch_words=args.batch_words, merge_every=args.merge_every,
            lsm=args.lsm, collapse_homopolymers=args.hp_collapse,
            hash_first=args.hash_first, mix_prefix=args.mix_prefix,
        )
    from tsxcount_tpu.utils.hbm import estimate_hbm, preflight_check

    hbm_est = estimate_hbm(
        k=args.k, l=args.l, batch_words=args.batch_words,
        backend=counter.backend, merge_every=args.merge_every,
        lsm=bool(getattr(counter, "lsm", False)),
        hash_first=getattr(counter, "hash_first", False),
        mix_prefix=bool(getattr(counter, "mix_prefix", False)),
        n_shards=max(1, args.shards),
    )
    warn = preflight_check(hbm_est)
    if warn:
        print(f"warning: {warn}", file=sys.stderr)

    # NB: jax.block_until_ready is a no-op through the tunneled axon
    # backend; a device_get of the distinct-count scalar (which depends on
    # the whole merged store) is the completion fence.
    # pass 1: compile + count
    t0 = time.perf_counter()
    counter.count_file(bench_fastq)
    distinct = counter.distinct
    cold = time.perf_counter() - t0

    # fresh-store warm passes: empty the store (compiled programs kept) and
    # count again — the honest steady-state number (no re-count into an
    # already-populated store); report the best of `passes`
    fresh = float("inf")
    for _ in range(max(1, args.passes)):
        counter.reset()
        t0 = time.perf_counter()
        counter.count_file(bench_fastq)
        distinct2 = counter.distinct  # completion fence
        fresh = min(fresh, time.perf_counter() - t0)
        assert distinct2 == distinct
    kmers = counter.total_kmers  # logical windows of the last pass
    stats_last = counter.packer.stats

    # re-count pass (store already populated; legacy r01 steady-state probe)
    t0 = time.perf_counter()
    counter.count_file(bench_fastq)
    _ = counter.distinct  # completion fence
    recount = time.perf_counter() - t0

    kmers_per_s = kmers / fresh
    baseline = load_measured_baseline()
    result = {
        "metric": f"kmers_per_second_k{args.k}",
        "value": round(kmers_per_s),
        "unit": "kmers/s/chip",
        "vs_baseline": (
            round(kmers_per_s / baseline, 3) if baseline else None
        ),
        "k": args.k,
        "backend": args.backend,
        "read_len": args.read_len,
        "shards": args.shards,
        "lsm": bool(getattr(counter, "lsm", False)),
        "hash_first": bool(getattr(counter, "hash_first", False)),
        "mix_prefix": bool(getattr(counter, "mix_prefix", False)),
        "platform": jax.default_backend(),
        "total_kmers": kmers,
        "distinct_kmers": distinct,
        "fresh_warm_seconds": round(fresh, 3),
        "recount_seconds": round(recount, 3),
        "recount_kmers_per_s": round(kmers / recount),
        "cold_seconds": round(cold, 3),
        "batch_words": args.batch_words,
        # hp-collapse visibility: device-processed windows vs the logical
        # total, so the collapse contribution to the headline is explicit
        "windows_device": stats_last.windows,
        "hp_bonus": sum(stats_last.hp_bonus),
        # memory observability (reference protocol records max-RSS,
        # analyses/perform_analyses.py:64): host peak RSS + device HBM
        # (the tunneled backend hides memory_stats -> null, so the analytic
        # model's estimate rides along; see tsxcount_tpu/utils/hbm.py)
        "max_rss_mb": round(peak_rss_mb(), 1),
        "device_hbm_mb": device_hbm_mb(),
        "device_hbm_mb_est": round(hbm_est.total_mb, 1),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
