"""LSM multi-level store tests: exact equivalence with the flat store."""

import collections

import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.config import KmerSpec, counts_to_int
from tsxcount_tpu.core.counter import KmerCounter
from tsxcount_tpu.core.lsm import LSMStore
from tsxcount_tpu.core.store import CountStore
from tsxcount_tpu.ops.count import count_unique


def _stream_batches(rng, spec, n_batches, p, vocab):
    vocab_keys = rng.integers(0, 2**32, size=(vocab, spec.lanes),
                              dtype=np.uint32)
    vocab_keys[:, -1] &= spec.top_lane_mask
    for _ in range(n_batches):
        idx = rng.integers(0, vocab, size=p)
        valid = rng.random(p) < 0.9
        yield vocab_keys[idx], valid


@pytest.mark.parametrize("growth,n_batches", [(2, 9), (3, 14)])
def test_lsm_matches_flat_store(growth, n_batches):
    spec = KmerSpec(21)
    p = 256
    rng = np.random.default_rng(5)
    flat = CountStore(spec, capacity=4096)
    lsm = LSMStore(spec, capacity=4096, base_capacity=p, growth=growth)
    assert len(lsm.levels) >= 3  # exercise a real cascade
    fs = flat.init_state()
    ls = lsm.init_state()
    expected = collections.Counter()
    for kmers, valid in _stream_batches(rng, spec, n_batches, p, vocab=700):
        uc = count_unique(jnp.asarray(kmers), jnp.asarray(valid), spec=spec)
        for row, ok in zip(kmers.tolist(), valid.tolist()):
            if ok:
                expected[tuple(row)] += 1
        fs = flat.merge(fs, uc.keys, uc.counts, uc.valid)
        ls = lsm.merge_stacked(ls, uc.keys[None], uc.counts[None],
                               uc.valid[None])
    ls = lsm.collapse(ls)
    fk, fc, fn = flat.to_host(fs)
    lk, lc, ln = lsm.to_host(ls)
    assert ln == fn == len(expected)
    np.testing.assert_array_equal(lk, fk)
    assert [int(c) for c in lc] == [int(c) for c in fc]
    got = {tuple(k): int(c) for k, c in zip(lk.tolist(), lc)}
    assert got == dict(expected)


def test_lsm_lookup_without_collapse():
    spec = KmerSpec(14)
    p = 128
    rng = np.random.default_rng(11)
    lsm = LSMStore(spec, capacity=2048, base_capacity=p, growth=2)
    ls = lsm.init_state()
    expected = collections.Counter()
    for kmers, valid in _stream_batches(rng, spec, 5, p, vocab=60):
        uc = count_unique(jnp.asarray(kmers), jnp.asarray(valid), spec=spec)
        for row, ok in zip(kmers.tolist(), valid.tolist()):
            if ok:
                expected[tuple(row)] += 1
        ls = lsm.merge_stacked(ls, uc.keys[None], uc.counts[None],
                               uc.valid[None])
    queries = np.array(sorted(expected), dtype=np.uint32)
    digits, found = lsm.lookup(ls, jnp.asarray(queries))
    assert bool(np.asarray(found).all())
    got = [counts_to_int(*d) for d in np.asarray(digits)]
    assert got == [expected[tuple(q)] for q in queries.tolist()]


def test_counter_lsm_end_to_end_matches_flat():
    reads = []
    rng = np.random.default_rng(3)
    base = np.array(list("ACGT"))
    for _ in range(60):
        n = int(rng.integers(30, 90))
        reads.append("".join(base[rng.integers(0, 4, size=n)]))
    flat = KmerCounter(k=11, l=14, batch_words=64, merge_every=1)
    lsmc = KmerCounter(k=11, l=14, batch_words=64, merge_every=1,
                       lsm=True, lsm_growth=2)
    assert lsmc.lsm, "LSM should engage at these shapes"
    flat.add_reads(reads)
    flat.finish()
    lsmc.add_reads(reads)
    lsmc.finish()
    assert lsmc.distinct == flat.distinct
    assert lsmc.to_dict() == flat.to_dict()


def test_counter_lsm_fallback_when_capacity_small():
    c = KmerCounter(k=11, l=10, batch_words=64, lsm=True, lsm_growth=8)
    assert not c.lsm  # capacity < growth * flush -> flat store


def test_counter_lsm_auto_engages_when_profitable():
    # default lsm=None: the cascade engages automatically once
    # capacity * (growth-1) > growth^2 * flush (and not below)
    big = KmerCounter(k=11, l=20, batch_words=64, merge_every=1)
    assert big.lsm
    small = KmerCounter(k=11, l=14, batch_words=64, merge_every=4)
    assert not small.lsm

    rng = np.random.default_rng(3)
    reads = ["".join(rng.choice(list("ACGT"), size=70)) for _ in range(60)]
    flat = KmerCounter(k=11, l=20, batch_words=64, merge_every=1, lsm=False)
    flat.add_reads(reads)
    flat.finish()
    big.add_reads(reads)
    big.finish()
    assert big.to_dict() == flat.to_dict()


def test_lsm_checkpoint_roundtrip(tmp_path):
    from tsxcount_tpu.core.checkpoint import load_counter, save_counter

    rng = np.random.default_rng(8)
    base = np.array(list("ACGT"))
    reads = ["".join(base[rng.integers(0, 4, size=50)]) for _ in range(30)]
    c = KmerCounter(k=9, l=13, batch_words=64, merge_every=1,
                    lsm=True, lsm_growth=2)
    assert c.lsm
    c.add_reads(reads)
    c.finish()
    want = c.to_dict()
    path = tmp_path / "lsm.npz"
    save_counter(c, path)
    c2 = load_counter(path, batch_words=64)
    assert c2.to_dict() == want
