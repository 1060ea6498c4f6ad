"""REAL multi-process (2 x jax.distributed) exactness tests.

Round-2 review found a live correctness bug that single-process tests could
not see: multi-host counting with default homopolymer collapse dropped the
bonus counts owed to shards on other hosts.  These tests spawn two actual
processes (each its own jax CPU device, coordinator over localhost) and
assert exact counts on homopolymer-rich input in BOTH input modes:

  * stripe mode (gzip input, record striping — the round-2 repro scenario);
  * range mode (uncompressed input, native byte-range splitting — which in
    round 2 silently disabled collapse altogether).

The reference's equivalent guarantee is thread-parallel exactness via
--check in CI (reference .travis.yml:14, src/mains/main.cpp:224-396).

Worker protocol: this file doubles as the worker script (spawned as
`python tests/test_multiprocess.py` with MP_* env vars).
"""

from __future__ import annotations

import collections
import gzip
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

K = 9


def _hp_rich_reads():
    """Reads with homopolymer runs far longer than 2k-2 = 16 (forces the
    collapse to fire on every base code) plus random stretches."""
    import numpy as np

    rng = np.random.default_rng(123)
    reads = []
    for i in range(48):
        parts = []
        for _ in range(rng.integers(1, 4)):
            parts.append("".join(
                "ACGT"[c] for c in rng.integers(0, 4, rng.integers(5, 30))
            ))
            parts.append("ACGT"[i % 4] * int(rng.integers(20, 70)))
        reads.append("".join(parts))
    return reads


def _golden(reads):
    counts: collections.Counter = collections.Counter()
    for seq in reads:
        for i in range(len(seq) - K + 1):
            counts[seq[i : i + K]] += 1
    return dict(counts)


def worker_main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=os.environ["MP_COORD"],
        num_processes=int(os.environ["MP_NPROC"]),
        process_id=int(os.environ["MP_PID"]),
    )
    sys.path.insert(0, str(REPO))
    from tsxcount_tpu.parallel.distributed import count_file_distributed
    from tsxcount_tpu.parallel.sharded import ShardedKmerCounter

    nproc = jax.process_count()
    counter = ShardedKmerCounter(
        k=K, n_shards=nproc, l=15, batch_words=64,
        collapse_homopolymers=True,
    )
    mode = count_file_distributed(counter, os.environ["MP_FASTQ"], stride=5,
                                  round_groups=1)
    assert mode == os.environ["MP_EXPECT_MODE"], mode
    # streaming ingest (VERDICT r3 #5): the file is bigger than one round's
    # bounded window, so multiple agree-and-dispatch rounds must have run
    # (the old design materialized everything and dispatched once)
    assert counter._stream_rounds >= 2, counter._stream_rounds

    golden = json.loads(Path(os.environ["MP_GOLDEN"]).read_text())
    # collapse must actually have fired globally (guards against the
    # range-mode silent-disable regression)
    st = counter._global_stats()
    assert sum(st.hp_bonus) > 0, "collapse never fired"
    # global ingest stats must reflect the whole file on every process
    assert counter.total_kmers == sum(golden.values()), (
        counter.total_kmers, sum(golden.values())
    )
    assert counter.stats()["reads"] == int(os.environ["MP_READS"])
    # exact counts, including every homopolymer kmer (SPMD: all processes
    # run the same query program)
    queries = sorted(golden)
    got = counter.get_counts(queries)
    bad = [
        (q, golden[q], g) for q, g in zip(queries, got) if golden[q] != g
    ]
    assert not bad, bad[:10]
    assert counter.distinct == len(golden)
    # full export parity too (items applies the owed bonus exactly once)
    assert counter.to_dict() == golden
    return 0


def _run_workers(fastq: Path, golden_path: Path, n_reads: int,
                 expect_mode: str, port: int) -> None:
    env_base = {
        **os.environ,
        "MP_WORKER": "1",
        "MP_COORD": f"127.0.0.1:{port}",
        "MP_NPROC": "2",
        "MP_FASTQ": str(fastq),
        "MP_GOLDEN": str(golden_path),
        "MP_READS": str(n_reads),
        "MP_EXPECT_MODE": expect_mode,
    }
    # workers must not inherit the 8-device flag (1 device per process)
    env_base["XLA_FLAGS"] = " ".join(
        f for f in env_base.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(Path(__file__).resolve())],
            env=dict(env_base, MP_PID=str(pid)),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for proc in procs:
        out, _ = proc.communicate(timeout=600)
        outs.append((proc.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-4000:]


def _fixture(tmp_path, compress: bool):
    reads = _hp_rich_reads()
    name = "hp.fastq.gz" if compress else "hp.fastq"
    fastq = tmp_path / name
    opener = gzip.open if compress else open
    with opener(fastq, "wt") as f:
        for i, seq in enumerate(reads):
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    golden_path = tmp_path / "golden.json"
    golden_path.write_text(json.dumps(_golden(reads)))
    return fastq, golden_path, len(reads)


def test_two_process_stripe_mode_hp_exact(tmp_path):
    """The round-2 repro: 2 processes, gzip input (stripe mode), reads with
    runs > 2k-2 — every homopolymer count must be exact."""
    fastq, golden_path, n = _fixture(tmp_path, compress=True)
    _run_workers(fastq, golden_path, n, "stripe", port=39441)


def test_two_process_range_mode_hp_exact(tmp_path):
    """Byte-range mode must keep collapse ENABLED and counts exact."""
    fastq, golden_path, n = _fixture(tmp_path, compress=False)
    _run_workers(fastq, golden_path, n, "range", port=39443)


if __name__ == "__main__":
    if os.environ.get("MP_WORKER"):
        sys.exit(worker_main())
    print("run under pytest, or set MP_* env vars for worker mode")
    sys.exit(2)
