"""Sort+segmented-sum counting and store merge tests."""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.config import KmerSpec, counts_to_int, int_to_counts
from tsxcount_tpu.core.store import CountStore
from tsxcount_tpu.ops.count import count_unique, int32_to_digits, renorm_digits
from tsxcount_tpu.ops.lanes import np_lanes_to_int


def _random_kmer_batch(rng, n, lanes, top_mask, vocab=32):
    """Batch with heavy duplication drawn from a small vocabulary."""
    vocab_keys = rng.integers(0, 2**32, size=(vocab, lanes), dtype=np.uint32)
    vocab_keys[:, -1] &= top_mask
    idx = rng.integers(0, vocab, size=n)
    return vocab_keys[idx]


@pytest.mark.parametrize("lanes,k", [(1, 14), (2, 32), (4, 63), (8, 127)])
def test_count_unique_exact(lanes, k):
    spec = KmerSpec(k)
    rng = np.random.default_rng(lanes)
    kmers = _random_kmer_batch(rng, 512, spec.lanes, spec.top_lane_mask)
    valid = rng.random(512) < 0.9
    uc = jax.jit(count_unique)(jnp.asarray(kmers), jnp.asarray(valid))
    n = int(uc.n_unique)
    keys = np.asarray(uc.keys)[:n]
    counts = np.asarray(uc.counts)[:n]
    expected = collections.Counter(
        tuple(row) for row, ok in zip(kmers.tolist(), valid.tolist()) if ok
    )
    got = {tuple(row): int(c) for row, c in zip(keys.tolist(), counts)}
    assert got == dict(expected)
    # ascending order over the valid prefix
    ints = np_lanes_to_int(keys)
    assert all(ints[i] < ints[i + 1] for i in range(n - 1))


@pytest.mark.parametrize("lanes,k", [(1, 14), (2, 31), (4, 63)])
def test_count_unique_pallas_path_matches_xla(lanes, k):
    """The TPU fast path (Pallas boundary compaction) must agree with the
    XLA position-sort path, including junk-tail masking semantics."""
    spec = KmerSpec(k)
    rng = np.random.default_rng(100 + lanes)
    p = 4096
    kmers = _random_kmer_batch(rng, p, spec.lanes, spec.top_lane_mask,
                               vocab=300)
    valid = rng.random(p) < 0.85
    kj, vj = jnp.asarray(kmers), jnp.asarray(valid)
    ref = count_unique(kj, vj, spec=spec, force_pallas=False)
    got = count_unique(kj, vj, spec=spec, force_pallas=True)
    n = int(ref.n_unique)
    assert int(got.n_unique) == n
    np.testing.assert_array_equal(
        np.asarray(got.keys)[:n], np.asarray(ref.keys)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(got.counts)[:n], np.asarray(ref.counts)[:n]
    )
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))


@pytest.mark.parametrize("lanes,k", [(2, 31), (3, 48), (4, 63), (8, 127)])
def test_count_unique_uniform_prefix_matches_full_sort(lanes, k):
    """The 64-bit-prefix dedupe sort (hashed-key fast path) must agree
    with the full multi-key sort on uniformly distributed keys."""
    spec = KmerSpec(k)
    rng = np.random.default_rng(7 + lanes)
    p = 2048
    kmers = _random_kmer_batch(rng, p, spec.lanes, spec.top_lane_mask,
                               vocab=200)
    valid = rng.random(p) < 0.85
    kj, vj = jnp.asarray(kmers), jnp.asarray(valid)
    ref = count_unique(kj, vj, spec=spec)
    got = count_unique(kj, vj, spec=spec, uniform_prefix=True)
    n = int(ref.n_unique)
    assert int(got.n_unique) == n
    np.testing.assert_array_equal(
        np.asarray(got.keys)[:n], np.asarray(ref.keys)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(got.counts)[:n], np.asarray(ref.counts)[:n]
    )


def test_count_unique_uniform_prefix_collision_fallback():
    """Distinct keys that share the whole 64-bit prefix force the exact
    cond fallback — counts must still be correct."""
    spec = KmerSpec(63)  # 4 lanes, top_lane_bits=30 (flag in-lane)
    rng = np.random.default_rng(3)
    p = 256
    kmers = _random_kmer_batch(rng, p, spec.lanes, spec.top_lane_mask,
                               vocab=40)
    # two distinct keys, equal in the top TWO lanes (the sort prefix),
    # differing only in lane 0 — a deliberate prefix collision
    a = np.array([1, 2, 3, 4], np.uint32)
    b = np.array([9, 2, 3, 4], np.uint32)
    kmers[10] = kmers[100] = kmers[200] = a
    kmers[11] = kmers[150] = b
    valid = np.ones(p, bool)
    ref = count_unique(jnp.asarray(kmers), jnp.asarray(valid), spec=spec)
    got = count_unique(jnp.asarray(kmers), jnp.asarray(valid), spec=spec,
                       uniform_prefix=True)
    n = int(ref.n_unique)
    assert int(got.n_unique) == n
    np.testing.assert_array_equal(
        np.asarray(got.keys)[:n], np.asarray(ref.keys)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(got.counts)[:n], np.asarray(ref.counts)[:n]
    )


def test_count_unique_pallas_all_and_none_valid():
    spec = KmerSpec(14)
    p = 4096
    rng = np.random.default_rng(7)
    kmers = _random_kmer_batch(rng, p, 1, spec.top_lane_mask, vocab=9)
    for valid in (np.ones(p, bool), np.zeros(p, bool)):
        ref = count_unique(jnp.asarray(kmers), jnp.asarray(valid), spec=spec,
                           force_pallas=False)
        got = count_unique(jnp.asarray(kmers), jnp.asarray(valid), spec=spec,
                           force_pallas=True)
        n = int(ref.n_unique)
        assert int(got.n_unique) == n
        np.testing.assert_array_equal(
            np.asarray(got.counts)[:n], np.asarray(ref.counts)[:n]
        )


def test_count_unique_all_invalid():
    spec = KmerSpec(14)
    kmers = jnp.zeros((64, 1), jnp.uint32)
    valid = jnp.zeros((64,), jnp.bool_)
    uc = count_unique(kmers, valid)
    assert int(uc.n_unique) == 0


def test_poly_t_not_confused_with_invalid():
    # all-ones key (poly-T) must still be counted when valid
    spec = KmerSpec(16)
    kmers = jnp.full((8, 1), 0xFFFFFFFF, jnp.uint32)
    valid = jnp.asarray([True] * 5 + [False] * 3)
    uc = count_unique(kmers, valid)
    assert int(uc.n_unique) == 1
    assert int(uc.counts[0]) == 5


def test_u64_digit_roundtrip_and_carry_sum():
    from tsxcount_tpu.ops.count import (
        _segmented_sum_rev_u64, digits_to_u64, u64_to_digits,
    )

    vals = [0, 1, 2**20 - 1, 2**20, 2**32 - 1, 2**32, 2**40 + 12345,
            2**52 - 7]
    d = jnp.asarray([int_to_counts(v) for v in vals], jnp.int32)
    lo, hi = digits_to_u64(d)
    back = u64_to_digits(lo, hi)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(d))
    got = [counts_to_int(*row) for row in np.asarray(back)]
    assert got == vals

    # carry across 2^32 inside a segment: two rows of (2^31 + 5) must sum
    # to 2^32 + 10 at the segment head
    lo2 = jnp.asarray([2**31 + 5, 2**31 + 5, 7, 0], jnp.uint32)
    hi2 = jnp.asarray([0, 0, 1, 0], jnp.int32)
    flag = jnp.asarray([True, False, True, True])
    slo, shi = _segmented_sum_rev_u64(lo2, hi2, flag, 2)
    assert int(slo[0]) == (2**32 + 10) % 2**32
    assert int(shi[0]) == 1
    assert int(slo[2]) == 7 and int(shi[2]) == 1


def test_absorb_pallas_interpret_counts_cross_2_32():
    """Store-to-store absorb (LSM cascade) summing counts past 2^32,
    via the Pallas path in interpret mode."""
    spec = KmerSpec(14)
    store = CountStore(spec, capacity=1024)
    big = 2**33 + 17
    key = np.array([[5]], np.uint32)

    def state_with(count):
        st = store.init_state()
        digits = np.zeros((1024, 3), np.int32)
        digits[0] = int_to_counts(count)
        keys = np.zeros((1024, 1), np.uint32)
        keys[0] = key
        return st._replace(
            keys=jnp.asarray(keys),
            digits=jnp.asarray(digits),
            used=jnp.asarray(np.arange(1024) < 1),
            n=jnp.asarray(1, jnp.int32),
        )

    a = state_with(big)
    b = state_with(2**31 + 3)
    # drive the pallas path directly (backend detection would pick XLA here)
    n_keys = 1
    from tsxcount_tpu.ops.count import digits_to_u64, pack_flag_key

    lo, hi = digits_to_u64(jnp.where(b.used[:, None], b.digits, 0))
    ops = pack_flag_key(b.keys, ~b.used, spec)
    consts = store._inv_consts(n_keys)
    ops = [jnp.where(b.used, op, c) for op, c in zip(ops, consts)]
    st = a._replace(overflowed=a.overflowed | b.overflowed)
    out = store._reduce_runs_pallas(
        st, [tuple(ops) + (lo, hi)], n_keys, run_has_hi=True, fanin=2,
        interpret=True,
    )
    keys_h, counts_h, n = store.to_host(out)
    assert n == 1
    assert int(counts_h[0]) == big + 2**31 + 3
    for v in [0, 1, 5, 2**20 - 1, 2**20, 2**31 - 1, 2**40 + 123]:
        assert counts_to_int(*int_to_counts(v)) == v
    # renorm propagates carries
    d = jnp.asarray([[(1 << 20) + 5, (1 << 20) - 1, 0]], jnp.int32)
    out = np.asarray(renorm_digits(d))[0]
    assert counts_to_int(*out) == ((1 << 20) + 5) + (((1 << 20) - 1) << 20)


def test_store_merge_accumulates_across_batches():
    spec = KmerSpec(14)
    store = CountStore(spec, capacity=256)
    state = store.init_state()
    rng = np.random.default_rng(0)
    expected = collections.Counter()
    merge = jax.jit(store.merge)
    for _ in range(5):
        kmers = _random_kmer_batch(rng, 128, 1, spec.top_lane_mask, vocab=40)
        valid = rng.random(128) < 0.8
        expected.update(
            int(row[0]) for row, ok in zip(kmers.tolist(), valid.tolist()) if ok
        )
        uc = count_unique(jnp.asarray(kmers), jnp.asarray(valid))
        state = merge(state, uc.keys, uc.counts, uc.valid)
    keys, counts, n = store.to_host(state)
    got = {int(k[0]): int(c) for k, c in zip(keys, counts)}
    assert got == dict(expected)
    assert not bool(jax.device_get(state.overflowed))


def test_store_large_counts_cross_digit_boundary():
    spec = KmerSpec(14)
    store = CountStore(spec, capacity=16)
    state = store.init_state()
    merge = jax.jit(store.merge)
    key = jnp.asarray([[42]], jnp.uint32)
    # feed count close to int32 max repeatedly -> total crosses 2^32
    big = (1 << 30) + 12345
    for _ in range(5):
        state = merge(
            state,
            key,
            jnp.asarray([big], jnp.int32),
            jnp.asarray([True]),
        )
    _, counts, n = store.to_host(state)
    assert n == 1
    assert int(counts[0]) == 5 * big


def test_store_overflow_flag():
    spec = KmerSpec(14)
    store = CountStore(spec, capacity=4)
    state = store.init_state()
    kmers = jnp.asarray(np.arange(8, dtype=np.uint32)[:, None])
    uc = count_unique(kmers, jnp.ones((8,), jnp.bool_))
    state = store.merge(state, uc.keys, uc.counts, uc.valid)
    assert bool(jax.device_get(state.overflowed))


def test_store_lookup():
    spec = KmerSpec(14)
    store = CountStore(spec, capacity=64)
    state = store.init_state()
    kmers = np.array([[7], [3], [9], [3], [7], [7]], dtype=np.uint32)
    uc = count_unique(jnp.asarray(kmers), jnp.ones((6,), jnp.bool_))
    state = store.merge(state, uc.keys, uc.counts, uc.valid)
    queries = jnp.asarray(np.array([[3], [7], [9], [100]], dtype=np.uint32))
    digits, found = jax.jit(store.lookup)(state, queries)
    digits = np.asarray(digits)
    assert found.tolist() == [True, True, True, False]
    assert [counts_to_int(*d) for d in digits] == [2, 3, 1, 0]


def test_merge_stacked_pallas_interpret_matches_xla():
    """The Pallas merge fast path (interpret mode) must be bit-identical to
    the XLA merge_stacked path."""
    import jax.numpy as jnp

    spec = KmerSpec(14)
    store = CountStore(spec, capacity=2048)
    rng = np.random.default_rng(42)
    r, p = 2, 1024

    state = store.init_state()
    # preload the store with some keys
    pre = np.sort(rng.choice(2**28, size=600, replace=False)).astype(np.uint32)
    uc0 = count_unique(
        jnp.asarray(np.pad(pre[:, None], ((0, p - 600), (0, 0)))),
        jnp.asarray(np.arange(p) < 600),
        spec=spec,
    )
    state = store.merge(state, uc0.keys, uc0.counts, uc0.valid)

    ukeys = np.zeros((r, p, 1), np.uint32)
    ucounts = np.zeros((r, p), np.int32)
    uvalid = np.zeros((r, p), bool)
    for i in range(r):
        n = int(rng.integers(100, p))
        keys = np.sort(rng.choice(2**28, size=n, replace=False))
        ukeys[i, :n, 0] = keys
        ucounts[i, :n] = rng.integers(1, 100, size=n)
        uvalid[i, :n] = True

    xla = store.merge_stacked(
        state, jnp.asarray(ukeys), jnp.asarray(ucounts), jnp.asarray(uvalid)
    )
    pal = store._merge_stacked_pallas(
        state, jnp.asarray(ukeys), jnp.asarray(ucounts),
        jnp.asarray(uvalid), interpret=True, tile=1024,
    )
    assert int(pal.n) == int(xla.n)
    n = int(xla.n)
    np.testing.assert_array_equal(
        np.asarray(pal.keys[:n]), np.asarray(xla.keys[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(pal.digits[:n]), np.asarray(xla.digits[:n])
    )
    assert bool(pal.overflowed) == bool(xla.overflowed)


def test_merge_stacked_pallas_two_lane_matches_xla():
    """2-lane packed keys (k=31) through the Pallas path == XLA path."""
    import jax.numpy as jnp

    spec = KmerSpec(31)
    store = CountStore(spec, capacity=2048)
    rng = np.random.default_rng(7)
    r, p = 2, 1024
    state = store.init_state()

    def rand_keys(n):
        keys = rng.integers(0, 2**32, size=(n, 2), dtype=np.uint32)
        keys[:, 1] &= spec.top_lane_mask
        return np.unique(keys, axis=0)

    ukeys = np.zeros((r, p, 2), np.uint32)
    ucounts = np.zeros((r, p), np.int32)
    uvalid = np.zeros((r, p), bool)
    for i in range(r):
        keys = rand_keys(700)
        # sort lexicographically msb-first (lane1 major)
        order = np.lexsort((keys[:, 0], keys[:, 1]))
        keys = keys[order]
        n = len(keys)
        ukeys[i, :n] = keys
        ucounts[i, :n] = rng.integers(1, 50, size=n)
        uvalid[i, :n] = True

    xla = store.merge_stacked(
        state, jnp.asarray(ukeys), jnp.asarray(ucounts), jnp.asarray(uvalid)
    )
    pal = store._merge_stacked_pallas(
        state, jnp.asarray(ukeys), jnp.asarray(ucounts),
        jnp.asarray(uvalid), interpret=True, tile=1024,
    )
    n = int(xla.n)
    assert int(pal.n) == n
    np.testing.assert_array_equal(
        np.asarray(pal.keys[:n]), np.asarray(xla.keys[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(pal.digits[:n]), np.asarray(xla.digits[:n])
    )


@pytest.mark.parametrize("k", [16, 63, 127])
def test_merge_stacked_pallas_wide_keys_matches_xla(k):
    """Wide multi-lane keys (incl. the separate-flag k=16 case) through the
    Pallas merge path == XLA path."""
    import jax.numpy as jnp

    spec = KmerSpec(k)
    store = CountStore(spec, capacity=2048)
    rng = np.random.default_rng(k)
    r, p = 2, 1024
    state = store.init_state()
    lanes = spec.lanes

    ukeys = np.zeros((r, p, lanes), np.uint32)
    ucounts = np.zeros((r, p), np.int32)
    uvalid = np.zeros((r, p), bool)
    for i in range(r):
        keys = rng.integers(0, 2**32, size=(800, lanes), dtype=np.uint32)
        keys[:, -1] &= spec.top_lane_mask
        keys = np.unique(keys, axis=0)
        order = np.lexsort(tuple(keys[:, j] for j in range(lanes)))
        keys = keys[order]
        n = len(keys)
        ukeys[i, :n] = keys
        ucounts[i, :n] = rng.integers(1, 50, size=n)
        uvalid[i, :n] = True

    xla = store.merge_stacked(
        state, jnp.asarray(ukeys), jnp.asarray(ucounts), jnp.asarray(uvalid)
    )
    pal = store._merge_stacked_pallas(
        state, jnp.asarray(ukeys), jnp.asarray(ucounts),
        jnp.asarray(uvalid), interpret=True, tile=1024,
    )
    n = int(xla.n)
    assert int(pal.n) == n
    np.testing.assert_array_equal(
        np.asarray(pal.keys[:n]), np.asarray(xla.keys[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(pal.digits[:n]), np.asarray(xla.digits[:n])
    )
