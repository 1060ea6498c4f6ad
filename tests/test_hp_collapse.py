"""Homopolymer run-length collapse: exactness and packer parity.

The collapse (io/packer.py collapse_homopolymers) splices all-X runs
longer than 2k-2 bases at ingest and injects the elided window counts at
finish.  Counts must be EXACT — identical to the uncollapsed pipeline —
on homopolymer-rich data, for both backends and canonical mode, and the
native C++ packer must produce bit-identical batches + bonus counters to
the Python packer.
"""

import numpy as np
import pytest

from tsxcount_tpu.config import BatchSpec, KmerSpec
from tsxcount_tpu.core.counter import KmerCounter
from tsxcount_tpu.io.packer import ReadPacker, collapse_homopolymers


def _brute_counts(reads, k):
    out = {}
    for seq in reads:
        for p in range(len(seq) - k + 1):
            w = seq[p : p + k]
            if any(c not in "ACGT" for c in w):
                continue
            out[w] = out.get(w, 0) + 1
    return out


def _hp_reads(rng, n_reads=24, k=9):
    """Reads mixing random stretches, long homopolymer runs, and Ns."""
    reads = []
    for _ in range(n_reads):
        parts = []
        for _ in range(rng.integers(1, 5)):
            parts.append("".join(
                "ACGT"[c] for c in rng.integers(0, 4, rng.integers(0, 25))
            ))
            if rng.random() < 0.8:
                parts.append(
                    "ACGT"[rng.integers(0, 4)] * int(rng.integers(1, 90))
                )
            if rng.random() < 0.25:
                parts.append("N")
        reads.append("".join(parts))
    return [r for r in reads if len(r) >= k]


def test_collapse_transform_brute_force():
    rng = np.random.default_rng(1)
    k = 7
    keep = 2 * k - 2
    for _ in range(60):
        codes = rng.integers(0, 4, size=rng.integers(k, 120)).astype(np.uint8)
        # inject runs + Ns
        for _ in range(rng.integers(0, 4)):
            i = rng.integers(0, len(codes))
            j = min(len(codes), i + rng.integers(1, 50))
            codes[i:j] = codes[i]
        invalid = rng.random(len(codes)) < 0.05
        want = {}
        n = len(codes)
        for p in range(n - k + 1):
            if invalid[p : p + k].any():
                continue
            t = tuple(codes[p : p + k])
            want[t] = want.get(t, 0) + 1
        c2, i2, bonus = collapse_homopolymers(codes, invalid, keep)
        got = {}
        for p in range(len(c2) - k + 1):
            if i2[p : p + k].any():
                continue
            t = tuple(c2[p : p + k])
            got[t] = got.get(t, 0) + 1
        for c in range(4):
            if bonus[c]:
                key = tuple([c] * k)
                got[key] = got.get(key, 0) + int(bonus[c])
        assert got == want


@pytest.mark.parametrize("backend,canonical", [
    ("sort", False), ("sort", True), ("table", False),
])
def test_counts_exact_with_collapse(backend, canonical):
    rng = np.random.default_rng(3)
    k = 9
    reads = _hp_reads(rng, k=k)
    counter = KmerCounter(k=k, l=14, backend=backend, batch_words=256,
                          canonical=canonical, collapse_homopolymers=True)
    counter.add_reads(reads)
    counter.finish()
    ref = KmerCounter(k=k, l=14, backend=backend, batch_words=256,
                      canonical=canonical, collapse_homopolymers=False)
    ref.add_reads(reads)
    ref.finish()
    assert counter.total_kmers == ref.total_kmers
    got = counter.to_dict()
    want = ref.to_dict()
    assert got == want
    assert sum(counter.packer.stats.hp_bonus) > 0  # collapse really fired


def test_collapse_against_brute_force_counts():
    rng = np.random.default_rng(5)
    k = 9
    reads = _hp_reads(rng, k=k)
    counter = KmerCounter(k=k, l=14, batch_words=256,
                          collapse_homopolymers=True)
    counter.add_reads(reads)
    counter.finish()
    want = _brute_counts(reads, k)
    assert counter.to_dict() == want
    assert counter.total_kmers == sum(want.values())


def test_native_packer_parity_with_collapse(tmp_path):
    from tsxcount_tpu.io.native import NativeFileReader, native_available

    if not native_available():
        pytest.skip("no native packer")
    rng = np.random.default_rng(7)
    k = 11
    reads = _hp_reads(rng, n_reads=40, k=k)
    path = tmp_path / "hp.fastq"
    with open(path, "w") as f:
        for i, seq in enumerate(reads):
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
    batch = BatchSpec(KmerSpec(k), 64, 64)
    py = ReadPacker(batch, collapse=True)
    py_bufs = []
    for seq in reads:
        py_bufs.extend(pb.buf.copy() for pb in py.feed(seq))
    py_bufs.extend(pb.buf.copy() for pb in py.finish())
    nat = NativeFileReader(path, batch, collapse=True)
    nat_bufs = [pb.buf.copy() for pb in nat]
    assert len(py_bufs) == len(nat_bufs)
    for a, b in zip(py_bufs, nat_bufs):
        np.testing.assert_array_equal(a, b)
    assert nat.stats.hp_bonus == py.stats.hp_bonus
    assert sum(nat.stats.hp_bonus) > 0
    assert nat.stats.windows == py.stats.windows


@pytest.mark.parametrize("canonical", [False, True])
def test_sharded_counts_exact_with_collapse(canonical):
    from tsxcount_tpu.parallel.sharded import ShardedKmerCounter

    rng = np.random.default_rng(11)
    k = 9
    reads = _hp_reads(rng, n_reads=16, k=k)
    kw = dict(k=k, n_shards=4, l=12, batch_words=64, canonical=canonical)
    counter = ShardedKmerCounter(collapse_homopolymers=True, **kw)
    counter.add_reads(reads)
    counter.finish()
    ref = ShardedKmerCounter(collapse_homopolymers=False, **kw)
    ref.add_reads(reads)
    ref.finish()
    assert sum(counter.packer.stats.hp_bonus) > 0
    assert counter.total_kmers == ref.total_kmers
    assert counter.to_dict() == ref.to_dict()


def test_read_time_bonus_large_counts():
    """Owed bonus above 2^30 applied losslessly at read time, including
    for keys the store never saw (simulated partial-resume state)."""
    counter = KmerCounter(k=5, l=10, batch_words=64)
    counter.add_reads(["AAAAAGG"])  # store sees AAAAA once
    counter.finish()
    counter.packer.stats.hp_bonus = (3, (1 << 30) + 7, 0, 2)
    d = counter.to_dict()
    assert d["AAAAA"] == 3 + 1
    assert d["CCCCC"] == (1 << 30) + 7
    assert d["TTTTT"] == 2
    assert counter.get_counts(["AAAAA", "CCCCC", "GGGGG", "TTTTT"]) == [
        4, (1 << 30) + 7, 0, 2,
    ]


def test_read_time_bonus_canonical_query_spellings():
    """In canonical mode both homopolymer spellings of a complement pair
    see the folded bonus."""
    counter = KmerCounter(k=5, l=10, batch_words=64, canonical=True)
    counter.add_reads(["AAAAA" + "CGTAG"])
    counter.finish()
    counter.packer.stats.hp_bonus = (2, 0, 0, 5)  # A-runs + T-runs
    base = counter.get_counts(["AAAAA"])[0]
    assert counter.get_counts(["TTTTT"])[0] == base
    assert counter.to_dict()["AAAAA"] == base
    assert base >= 7  # 2 + 5 folded into the canonical A key
