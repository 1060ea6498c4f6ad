"""Pallas sorted-run merge kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.ops.pallas_merge import merge_path_partition, merge_sorted

TILE = 1024


def _random_sorted(rng, n, hi=2**31):
    return np.sort(rng.integers(0, hi, size=n, dtype=np.uint32))


def test_merge_path_partition_valid():
    rng = np.random.default_rng(0)
    a = _random_sorted(rng, 1000)
    b = _random_sorted(rng, 1048)
    a_s, b_s = merge_path_partition((jnp.asarray(a),), (jnp.asarray(b),), TILE)
    a_s, b_s = np.asarray(a_s), np.asarray(b_s)
    assert a_s[0] == 0 and b_s[0] == 0
    assert a_s[-1] == 1000 and b_s[-1] == 1048
    assert (np.diff(a_s) >= 0).all() and (np.diff(b_s) >= 0).all()
    assert (np.diff(a_s) <= TILE).all() and (np.diff(b_s) <= TILE).all()
    # each tile's extent is a contiguous merged range
    merged = np.sort(np.concatenate([a, b]))
    for t in range(len(a_s) - 1):
        tile_elems = np.sort(
            np.concatenate([a[a_s[t]:a_s[t + 1]], b[b_s[t]:b_s[t + 1]]])
        )
        np.testing.assert_array_equal(
            tile_elems, merged[t * TILE:(t + 1) * TILE]
        )


@pytest.mark.parametrize("m,n", [(1024, 1024), (2000, 48), (0, 2048),
                                 (3072, 1024)])
def test_merge_sorted_keys_only(m, n):
    rng = np.random.default_rng(m + n)
    a = _random_sorted(rng, m)
    b = _random_sorted(rng, n)
    (out,) = merge_sorted(
        (jnp.asarray(a),), (jnp.asarray(b),), tile=TILE, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.concatenate([a, b]))
    )


def test_merge_sorted_with_payloads_stable():
    rng = np.random.default_rng(7)
    m, n = 1700, 348
    # heavy duplication to stress tie handling across tile boundaries
    a = np.sort(rng.integers(0, 50, size=m, dtype=np.uint32))
    b = np.sort(rng.integers(0, 50, size=n, dtype=np.uint32))
    pa = np.arange(m, dtype=np.int32)
    pb = np.arange(n, dtype=np.int32) + 10000
    out_k, out_p = merge_sorted(
        (jnp.asarray(a), jnp.asarray(pa)),
        (jnp.asarray(b), jnp.asarray(pb)),
        tile=TILE, interpret=True,
    )
    out_k, out_p = np.asarray(out_k), np.asarray(out_p)
    # stable reference merge: A rows before B rows on ties
    import heapq

    ref = list(heapq.merge(
        [(int(k), int(p)) for k, p in zip(a, pa)],
        [(int(k), int(p)) for k, p in zip(b, pb)],
        key=lambda kp: kp[0],
    ))
    np.testing.assert_array_equal(out_k, [k for k, _ in ref])
    np.testing.assert_array_equal(out_p, [p for _, p in ref])


@pytest.mark.fast
def test_merge_sorted_multiset_exact():
    rng = np.random.default_rng(9)
    m, n = 4096, 4096
    a = _random_sorted(rng, m, hi=1000)
    b = _random_sorted(rng, n, hi=1000)
    pa = rng.integers(0, 2**31, size=m, dtype=np.int32)
    pb = rng.integers(0, 2**31, size=n, dtype=np.int32)
    out_k, out_p = merge_sorted(
        (jnp.asarray(a), jnp.asarray(pa)),
        (jnp.asarray(b), jnp.asarray(pb)),
        tile=TILE, interpret=True,
    )
    got = sorted(zip(np.asarray(out_k).tolist(), np.asarray(out_p).tolist()))
    want = sorted(
        list(zip(a.tolist(), pa.tolist())) + list(zip(b.tolist(), pb.tolist()))
    )
    assert got == want


def test_merge_sorted_two_key_columns():
    """n_keys=2: lexicographic (hi, lo) uint32 pairs (k<=31 keys)."""
    rng = np.random.default_rng(11)
    m, n = 2048, 2048
    ah = rng.integers(0, 8, size=m, dtype=np.uint32)
    al = rng.integers(0, 2**32, size=m, dtype=np.uint32)
    a = np.sort(ah.astype(np.uint64) << 32 | al)
    bh = rng.integers(0, 8, size=n, dtype=np.uint32)
    bl = rng.integers(0, 2**32, size=n, dtype=np.uint32)
    b = np.sort(bh.astype(np.uint64) << 32 | bl)
    pa = np.arange(m, dtype=np.int32)
    pb = np.arange(n, dtype=np.int32) + 100000
    out = merge_sorted(
        (jnp.asarray((a >> 32).astype(np.uint32)),
         jnp.asarray((a & 0xFFFFFFFF).astype(np.uint32)),
         jnp.asarray(pa)),
        (jnp.asarray((b >> 32).astype(np.uint32)),
         jnp.asarray((b & 0xFFFFFFFF).astype(np.uint32)),
         jnp.asarray(pb)),
        tile=TILE, interpret=True, n_keys=2,
    )
    got = sorted(zip(
        ((np.asarray(out[0]).astype(np.uint64) << 32)
         | np.asarray(out[1])).tolist(),
        np.asarray(out[2]).tolist(),
    ))
    want = sorted(
        list(zip(a.tolist(), pa.tolist())) + list(zip(b.tolist(), pb.tolist()))
    )
    assert got == want
