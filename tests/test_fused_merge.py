"""Fused merge+dedupe+compact kernel vs a numpy reference.

Covers: single/multi-operand keys, duplicate keys within and across the
two runs, runs spanning many tiles (SMEM carry), uint32 count overflow
into the hi word, and the trailing invalid run.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.ops.pallas_merge_dedupe import merge_dedupe_sorted

INV_MIN = 1 << 30  # test convention: msb >= 2^30 marks the invalid run


def _np_reference(a_cols, b_cols, n_keys):
    """Stable merge + group-by-key + 64-bit sum, in numpy."""
    cols = [
        np.concatenate([np.asarray(a), np.asarray(b)])
        for a, b in zip(a_cols, b_cols)
    ]
    keys = np.stack(cols[:n_keys], axis=1).astype(np.uint64)
    order = np.lexsort(tuple(keys[:, j] for j in reversed(range(n_keys))))
    keys = keys[order]
    tot = (
        cols[n_keys][order].astype(np.uint64)
        + (cols[n_keys + 1][order].astype(np.uint64) << np.uint64(32))
    )
    boundary = np.ones(len(keys), bool)
    boundary[1:] = (keys[1:] != keys[:-1]).any(axis=1)
    idx = np.flatnonzero(boundary)
    sums = np.add.reduceat(tot, idx)
    ukeys = keys[idx]
    n_runs = len(idx)
    invalid = ukeys[:, 0] >= INV_MIN
    return ukeys, sums, n_runs, int(n_runs - invalid.sum())


def _make_run(rng, n, n_keys, n_invalid, key_space, max_lo):
    """A sorted run: random (possibly duplicated) keys + counts, with
    n_invalid rows masked to the shared invalid constant at the end."""
    keys = rng.integers(0, key_space, size=(n, n_keys), dtype=np.uint32)
    order = np.lexsort(tuple(keys[:, j] for j in reversed(range(n_keys))))
    keys = keys[order]
    if n_invalid:
        keys[n - n_invalid :, 0] = INV_MIN
        keys[n - n_invalid :, 1:] = 0
    lo = rng.integers(0, max_lo, size=n, dtype=np.uint32)
    hi = rng.integers(0, 3, size=n).astype(np.int32)
    if n_invalid:
        lo[n - n_invalid :] = 0
        hi[n - n_invalid :] = 0
    cols = tuple(jnp.asarray(keys[:, j]) for j in range(n_keys)) + (
        jnp.asarray(lo), jnp.asarray(hi),
    )
    return cols


def _run_and_check(a_cols, b_cols, n_keys, tile=1024):
    out, n_runs, n_valid = merge_dedupe_sorted(
        a_cols, b_cols, n_keys=n_keys, inv_min=INV_MIN, tile=tile,
        interpret=True,
    )
    ukeys, sums, want_runs, want_valid = _np_reference(
        a_cols, b_cols, n_keys
    )
    n_runs = int(n_runs)
    assert n_runs == want_runs
    assert int(n_valid) == want_valid
    got_keys = np.stack(
        [np.asarray(out[j][:n_runs]) for j in range(n_keys)], axis=1
    )
    np.testing.assert_array_equal(got_keys, ukeys.astype(np.uint32))
    got = (
        np.asarray(out[n_keys][:n_runs]).astype(np.uint64)
        + (np.asarray(out[n_keys + 1][:n_runs]).astype(np.uint64)
           << np.uint64(32))
    )
    np.testing.assert_array_equal(got, sums)


@pytest.mark.fast
@pytest.mark.parametrize("n_keys", [1, 2, 3])
def test_random_runs(n_keys):
    rng = np.random.default_rng(7 + n_keys)
    a = _make_run(rng, 4096, n_keys, n_invalid=37, key_space=3000,
                  max_lo=2**32 - 1)
    b = _make_run(rng, 2048, n_keys, n_invalid=11, key_space=3000,
                  max_lo=2**32 - 1)
    _run_and_check(a, b, n_keys)


def test_heavy_duplication_cross_tile_carry():
    # one key dominating both runs -> a single run spanning many tiles,
    # summed through the SMEM carry, with lo-word wraparound into hi
    rng = np.random.default_rng(3)
    a_keys = np.zeros(4096, np.uint32)
    a_keys[3000:] = rng.integers(1, 50, size=1096).astype(np.uint32)
    a_keys.sort()
    b_keys = np.zeros(4096, np.uint32)
    cols_a = (jnp.asarray(a_keys),
              jnp.asarray(rng.integers(2**31, 2**32 - 1, size=4096,
                                       dtype=np.uint32)),
              jnp.asarray(np.zeros(4096, np.int32)))
    cols_b = (jnp.asarray(b_keys),
              jnp.asarray(rng.integers(2**31, 2**32 - 1, size=4096,
                                       dtype=np.uint32)),
              jnp.asarray(np.zeros(4096, np.int32)))
    _run_and_check(cols_a, cols_b, n_keys=1)


def test_all_invalid_b_side():
    rng = np.random.default_rng(11)
    a = _make_run(rng, 2048, 2, n_invalid=0, key_space=500, max_lo=1000)
    b = _make_run(rng, 1024, 2, n_invalid=1024, key_space=500,
                  max_lo=1000)
    _run_and_check(a, b, n_keys=2)


def test_disjoint_and_unbalanced():
    rng = np.random.default_rng(5)
    a = _make_run(rng, 7168, 1, n_invalid=100, key_space=10_000,
                  max_lo=100)
    b = _make_run(rng, 1024, 1, n_invalid=0, key_space=10_000,
                  max_lo=100)
    _run_and_check(a, b, n_keys=1)


def test_store_junk_tail_is_harmless():
    """A store whose unused tail holds junk keys (uninitialized memory,
    or a state produced by the XLA/3-pass paths) must merge exactly: the
    caller re-masks unused rows to the shared invalid constant.  This is
    the regression test for the round-2 n_keys>=2 hardware corruption
    (junk tails repacked as many unsorted 'invalid' rows broke the
    merge-path ascending-run precondition)."""
    import jax.numpy as jnp

    from tsxcount_tpu.config import KmerSpec
    from tsxcount_tpu.core.store import CountStore, StoreState
    from tsxcount_tpu.ops.count import int32_to_digits

    rng = np.random.default_rng(17)
    spec = KmerSpec(31)  # 2 lanes
    cap = 4096
    store = CountStore(spec, capacity=cap)
    n0 = 1000
    keys0 = rng.integers(0, 2**32, size=(cap, 2), dtype=np.uint32)
    keys0[:, -1] &= np.uint32(spec.top_lane_mask)
    keys0 = keys0[np.lexsort((keys0[:, 0], keys0[:, 1]))]
    counts0 = rng.integers(1, 50, size=cap).astype(np.int32)
    used = np.arange(cap) < n0
    # junk tail: REAL-looking unsorted keys beyond the used prefix
    state = StoreState(
        keys=jnp.asarray(keys0),
        digits=jnp.asarray(np.asarray(int32_to_digits(jnp.asarray(counts0)))),
        used=jnp.asarray(used),
        n=jnp.asarray(n0, jnp.int32),
        overflowed=jnp.asarray(False),
    )
    bk = rng.integers(0, 2**32, size=(2048, 2), dtype=np.uint32)
    bk[:, -1] &= np.uint32(spec.top_lane_mask)
    bk[:512] = keys0[100:612]  # overlap with the used prefix AND the junk
    bk = np.unique(bk, axis=0)
    bk = bk[np.lexsort((bk[:, 0], bk[:, 1]))]
    pad = 2048 - len(bk)
    bcounts = rng.integers(1, 50, size=2048).astype(np.int32)
    bvalid = np.arange(2048) < len(bk)
    bk = np.concatenate([bk, np.zeros((pad, 2), np.uint32)])
    out = store._merge_stacked_pallas(
        state, jnp.asarray(bk)[None], jnp.asarray(bcounts)[None],
        jnp.asarray(bvalid)[None], interpret=True, tile=1024,
    )
    # reference via dict arithmetic
    want = {}
    for i in range(n0):
        want[tuple(keys0[i])] = int(counts0[i])
    for i in range(int(bvalid.sum())):
        k = tuple(bk[i])
        want[k] = want.get(k, 0) + int(bcounts[i])
    n_out = int(out.n)
    assert n_out == len(want)
    okeys = np.asarray(out.keys)[:n_out]
    od = np.asarray(out.digits)[:n_out]
    got = {
        tuple(okeys[i]): int(od[i, 0]) + (int(od[i, 1]) << 20)
        + (int(od[i, 2]) << 40)
        for i in range(n_out)
    }
    assert got == want
    # produced state is canonical: zeroed tail
    assert not np.asarray(out.keys)[n_out:].any()


def _store_merge_both_ways(k: int, seed: int):
    """Run one store merge with the fused kernel forced ON and OFF (same
    inputs, interpret mode) and return both output states."""
    import jax.numpy as jnp

    from tsxcount_tpu.config import KmerSpec
    from tsxcount_tpu.core.store import CountStore, StoreState
    from tsxcount_tpu.ops.count import int32_to_digits

    rng = np.random.default_rng(seed)
    spec = KmerSpec(k)
    lanes = spec.lanes
    cap = 4096
    store = CountStore(spec, capacity=cap)
    n0 = 700
    keys0 = rng.integers(0, 2**32, size=(cap, lanes), dtype=np.uint32)
    keys0[:, -1] &= np.uint32(spec.top_lane_mask)
    keys0 = keys0[np.lexsort(tuple(keys0[:, j] for j in range(lanes)))]
    keys0[n0:] = 0  # canonical zeroed tail
    counts0 = rng.integers(1, 50, size=cap).astype(np.int32)
    counts0[n0:] = 0
    state = StoreState(
        keys=jnp.asarray(keys0),
        digits=jnp.asarray(
            np.asarray(int32_to_digits(jnp.asarray(counts0)))
        ),
        used=jnp.asarray(np.arange(cap) < n0),
        n=jnp.asarray(n0, jnp.int32),
        overflowed=jnp.asarray(False),
    )
    bk = rng.integers(0, 2**32, size=(1024, lanes), dtype=np.uint32)
    bk[:, -1] &= np.uint32(spec.top_lane_mask)
    bk[:200] = keys0[300:500]  # overlap with the store
    bk = np.unique(bk, axis=0)
    bk = bk[np.lexsort(tuple(bk[:, j] for j in range(lanes)))]
    nb = len(bk)
    bk = np.concatenate([bk, np.zeros((1024 - nb, lanes), np.uint32)])
    bcounts = rng.integers(1, 50, size=1024).astype(np.int32)
    bvalid = np.arange(1024) < nb
    args = (state, jnp.asarray(bk)[None], jnp.asarray(bcounts)[None],
            jnp.asarray(bvalid)[None])
    on = store._merge_stacked_pallas(*args, interpret=True, tile=1024,
                                     fused=True)
    off = store._merge_stacked_pallas(*args, interpret=True, tile=1024,
                                      fused=False)
    return on, off


@pytest.mark.parametrize("k", [63, 127])  # n_keys = 4 and 8: the auto cutoff
def test_fused_auto_boundary_parity(k):
    """Fused and 3-pass merges must agree exactly at both sides of the
    auto-by-width cutoff (n_keys=4 on, n_keys=8 off) — ADVICE r3: the
    boundary was only exercised implicitly by TPU benches."""
    on, off = _store_merge_both_ways(k, seed=19 + k)
    n = int(on.n)
    assert n == int(off.n)
    np.testing.assert_array_equal(
        np.asarray(on.keys)[:n], np.asarray(off.keys)[:n]
    )
    np.testing.assert_array_equal(
        np.asarray(on.digits)[:n], np.asarray(off.digits)[:n]
    )
    assert bool(on.overflowed) == bool(off.overflowed)


def test_fused_auto_rule_sides():
    """The auto rule picks the documented side: on at n_keys<=4; at wide
    keys on only up to the measured 12.6M-row win point (r5 fusedwide)."""
    from tsxcount_tpu.core import store as store_mod

    if store_mod._FUSED_MERGE is None:  # only meaningful un-forced
        assert store_mod._fused_default(4) is True
        assert store_mod._fused_default(8) is False
        assert store_mod._fused_default(4, 1 << 26) is True
        assert store_mod._fused_default(8, store_mod._FUSED_WIN_ROWS) \
            is True
        assert store_mod._fused_default(
            8, store_mod._FUSED_WIN_ROWS + 1) is False
        # the single-chip k=127 production store merge stays 3-pass
        assert store_mod._fused_default(8, (1 << 24) + 19_267_584) is False


def test_fused_env_rejects_unknown(monkeypatch):
    from tsxcount_tpu.core import store as store_mod

    monkeypatch.setenv("TSX_FUSED_MERGE", "true")
    with pytest.raises(ValueError):
        store_mod._parse_fused_env()
    monkeypatch.setenv("TSX_FUSED_MERGE", "1")
    assert store_mod._parse_fused_env() is True
    monkeypatch.delenv("TSX_FUSED_MERGE")
    assert store_mod._parse_fused_env() is None


def test_larger_tile_multi_tile():
    rng = np.random.default_rng(13)
    a = _make_run(rng, 16384, 2, n_invalid=200, key_space=8000,
                  max_lo=2**20)
    b = _make_run(rng, 16384, 2, n_invalid=50, key_space=8000,
                  max_lo=2**20)
    _run_and_check(a, b, n_keys=2, tile=4096)
