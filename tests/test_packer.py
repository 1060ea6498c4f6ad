"""Tests for the host read packer: window semantics vs a naive reference."""

import collections

import numpy as np
import pytest

from tsxcount_tpu.config import BASES_PER_WORD, BatchSpec, KmerSpec
from tsxcount_tpu.io.packer import ReadPacker, pack_reads
from tsxcount_tpu.utils.sequence import unpack_words


def naive_kmers(reads, k, drop_n=True):
    """Inclusive len-k+1 sliding window (reference testExecution.h:15-36)."""
    out = collections.Counter()
    for seq in reads:
        if len(seq) < k:
            continue
        for i in range(len(seq) - k + 1):
            win = seq[i : i + k]
            if drop_n and any(c not in "ACGT" for c in win):
                continue
            out[win] += 1
    return out


def kmers_from_batches(batches, k):
    """Recover the multiset of valid k-mer strings from packed batches."""
    out = collections.Counter()
    for pb in batches:
        codes = unpack_words(pb.words, len(pb.words) * BASES_PER_WORD)
        chars = np.array(list("ACGT"))[codes]
        for w in range(len(pb.vmask)):
            bits = int(pb.vmask[w])
            for s in range(32):
                if bits & (1 << s):
                    p = w * 32 + s
                    out["".join(chars[p : p + k])] += 1
    return out


def rand_reads(rng, n, lo, hi, alphabet="ACGT"):
    return [
        "".join(rng.choice(list(alphabet), size=rng.integers(lo, hi)))
        for _ in range(n)
    ]


@pytest.mark.parametrize("k", [4, 14, 31])
def test_packer_matches_naive_windows(k):
    rng = np.random.default_rng(k)
    reads = rand_reads(rng, 30, 1, 80)
    batch = BatchSpec(KmerSpec(k), capacity_words=32)
    got = kmers_from_batches(pack_reads(reads, batch), k)
    assert got == naive_kmers(reads, k)


def test_packer_skips_short_reads():
    batch = BatchSpec(KmerSpec(10), capacity_words=8)
    packer = ReadPacker(batch)
    list(packer.feed("ACGTACGT"))  # len 8 < k=10
    list(packer.finish())
    assert packer.stats.reads_skipped == 1
    assert packer.stats.windows == 0


def test_packer_split_long_read_no_loss():
    # read much longer than one batch: windows must be exactly preserved
    k = 14
    rng = np.random.default_rng(7)
    read = "".join(rng.choice(list("ACGT"), size=5000))
    batch = BatchSpec(KmerSpec(k), capacity_words=16)  # 256 bases/batch
    got = kmers_from_batches(pack_reads([read], batch), k)
    assert got == naive_kmers([read], k)
    assert sum(got.values()) == 5000 - k + 1


def test_packer_drop_policy_masks_n_windows():
    k = 5
    reads = ["ACGTNACGTACGT"]
    batch = BatchSpec(KmerSpec(k), capacity_words=8)
    got = kmers_from_batches(pack_reads(reads, batch), k)
    assert got == naive_kmers(reads, k)
    # windows overlapping the N (positions 0..4) are dropped
    assert sum(got.values()) == len(reads[0]) - k + 1 - k


def test_packer_random_policy_is_deterministic_and_counts_all_windows():
    k = 5
    reads = ["ACGTNACGTACGT"]
    batch = BatchSpec(KmerSpec(k), capacity_words=8)
    a = kmers_from_batches(pack_reads(reads, batch, n_policy="random", seed=3), k)
    b = kmers_from_batches(pack_reads(reads, batch, n_policy="random", seed=3), k)
    assert a == b
    assert sum(a.values()) == len(reads[0]) - k + 1


def test_packer_interval_budget_early_flush():
    # more valid runs than max_intervals in one segment: the packer must
    # truncate mid-segment, flush early, and preserve every window
    k = 4
    read = ("ACGTA" + "N") * 3000  # 3000 runs of 2 windows each at k=4
    batch = BatchSpec(KmerSpec(k), capacity_words=2048)
    assert batch.max_intervals == 1024
    batches = list(pack_reads([read], batch))
    assert len(batches) >= 3  # early flushes happened
    for pb in batches:
        n_ivs = int((pb.iv_starts != 0xFFFFFFFF).sum())
        assert n_ivs <= batch.max_intervals
    assert kmers_from_batches(batches, k) == naive_kmers([read], k)


def test_short_read_interval_budget_scales_with_hint():
    # 150 bp reads (the dominant Illumina regime): the historical fixed
    # positions//384 budget flushed at ~40% word fill; a matching hint
    # must reach essentially full batches
    k = 14
    spec = KmerSpec(k)
    old = BatchSpec(spec, capacity_words=1 << 16)           # hint 384
    new = BatchSpec(spec, capacity_words=1 << 16, read_len_hint=150)
    # a 150 bp read occupies 10 words -> 6553 reads fill the batch
    assert new.max_intervals >= (1 << 16) // 10
    assert new.max_intervals > old.max_intervals

    rng = np.random.default_rng(11)
    reads = ["".join(rng.choice(list("ACGT"), size=150)) for _ in range(8000)]
    batches = list(pack_reads(reads, new))
    fills = [pb.n_bases / new.capacity_bases for pb in batches[:-1]]
    assert fills and min(fills) >= 0.85
    got = kmers_from_batches(batches, k)
    assert sum(got.values()) == 8000 * (150 - k + 1)


def test_counter_auto_adapts_read_len_hint():
    from tsxcount_tpu.core.counter import KmerCounter

    k = 8
    rng = np.random.default_rng(5)
    reads = ["".join(rng.choice(list("ACGT"), size=150)) for _ in range(40)]
    counter = KmerCounter(k=k, l=14, batch_words=1 << 16)
    assert counter._auto_hint
    counter.add_reads(reads)
    counter.finish()
    assert counter.batch.read_len_hint == 150
    assert not counter._auto_hint
    assert counter.to_dict() == dict(naive_kmers(reads, k))

    # an explicit hint disables auto-adaptation
    fixed = KmerCounter(k=k, l=14, batch_words=1 << 16, read_len_hint=500)
    fixed.add_reads(reads[:2])
    assert fixed.batch.read_len_hint == 500


def test_word_alignment_of_reads():
    batch = BatchSpec(KmerSpec(4), capacity_words=8)
    packer = ReadPacker(batch)
    list(packer.feed("ACGTA"))  # 5 bases -> 1 word
    list(packer.feed("TTTT"))
    batches = list(packer.finish())
    assert len(batches) == 1
    words = batches[0].words
    codes = unpack_words(words, 32)
    # second read starts at base 16 (word 1)
    assert "".join("ACGT"[c] for c in codes[16:20]) == "TTTT"
