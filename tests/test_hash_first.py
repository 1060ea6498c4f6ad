"""Hash-first dedupe (single-chip): store holds hashed keys, dedupe sorts
a 64-bit uniform prefix with payload lanes (ops/count.py
_sort_uniform_prefix), exports inverse-map — mirroring the sharded path.
Auto-engages at lanes >= 4 (k >= 49)."""

import numpy as np
import pytest

from tsxcount_tpu.core.counter import KmerCounter

from tests.test_packer import naive_kmers, rand_reads


def _reads():
    return rand_reads(np.random.default_rng(5), 20, 80, 300)


@pytest.mark.parametrize("k,forced", [(63, True), (127, True), (14, True)])
def test_hash_first_counts_exact(k, forced):
    reads = _reads()
    counter = KmerCounter(k=k, l=14, batch_words=64, hash_first=forced)
    assert counter.hash_first
    counter.add_reads(reads)
    counter.finish()
    want = dict(naive_kmers(reads, k))
    assert counter.to_dict() == want
    some = list(want)[:25] + ["A" * k]
    assert counter.get_counts(some) == [want.get(x, 0) for x in some]


def test_hash_first_auto_rule():
    # r4 measured auto rule: "mix" hash-first engages from 8 lanes up
    # (k=127: +11%) and stays off below (k=63: slight loss)
    assert not KmerCounter(k=31, l=10, batch_words=64).hash_first
    assert not KmerCounter(k=63, l=10, batch_words=64).hash_first
    assert KmerCounter(k=127, l=10, batch_words=64).hash_first == "mix"
    assert not KmerCounter(
        k=127, l=10, batch_words=64, hash_first=False
    ).hash_first
    # identity GF(2) is not uniform -> gf2 mode refuses; the r4 ARX mix
    # bijection is independent of the GF(2) matrix, so True (= "mix")
    # still engages under identity_hash
    assert not KmerCounter(
        k=63, l=10, batch_words=64, identity_hash=True, hash_first="gf2"
    ).hash_first
    assert KmerCounter(
        k=63, l=10, batch_words=64, identity_hash=True, hash_first=True
    ).hash_first == "mix"
    # table backend stores slot encodings, not sorted keys
    assert not KmerCounter(
        k=63, l=14, batch_words=64, backend="table", hash_first=True
    ).hash_first


def test_hash_first_checkpoint_roundtrip(tmp_path):
    from tsxcount_tpu.core.checkpoint import load_counter, save_counter

    reads = _reads()
    counter = KmerCounter(k=63, l=14, batch_words=64, hash_first=True)
    counter.add_reads(reads)
    counter.finish()
    path = tmp_path / "hf.npz"
    save_counter(counter, path)
    resumed = load_counter(path, batch_words=64)
    assert resumed.hash_first
    assert resumed.to_dict() == dict(naive_kmers(reads, 63))


def test_hash_first_canonical_and_collapse():
    reads = [r + "A" * 40 for r in _reads()]
    counter = KmerCounter(k=9, l=14, batch_words=64, hash_first=True,
                          canonical=True, collapse_homopolymers=True)
    ref = KmerCounter(k=9, l=14, batch_words=64, hash_first=False,
                      canonical=True, collapse_homopolymers=True)
    for c in (counter, ref):
        c.add_reads(reads)
        c.finish()
    assert sum(counter.packer.stats.hp_bonus) > 0
    assert counter.to_dict() == ref.to_dict()
