"""apply_sorted_unique (butterfly distributor) vs numpy, interpret mode."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from tsxcount_tpu.ops.pallas_apply import BIG, apply_sorted_unique


def _ref(slots, dst2, val):
    out = slots.copy()
    for d2, v in zip(dst2, val):
        if d2 >= BIG or (d2 & 1) == 0:
            continue
        out[d2 >> 1] += v
    return out


def _run(slots, dst2, val, **kw):
    out, over = apply_sorted_unique(
        jnp.asarray(slots), jnp.asarray(dst2), jnp.asarray(val),
        interpret=True, **kw,
    )
    return np.asarray(out), int(over)


def _case(rng, total, n_upd, tile, u_win, dead_frac=0.3):
    slots = rng.integers(0, 2**31, size=total, dtype=np.uint32)
    # strictly increasing unique destinations for the live subset
    n_live = max(1, int(n_upd * (1 - dead_frac)))
    live_dst = np.sort(
        rng.choice(total, size=min(n_live, total), replace=False)
    ).astype(np.int64)
    dst2 = (live_dst * 2 + 1).astype(np.int32)
    # interleave dead elements (even doubled dst, non-decreasing overall)
    n_dead = n_upd - len(live_dst)
    if n_dead > 0:
        dead = np.sort(
            rng.integers(0, total, size=n_dead, dtype=np.int64)
        )
        dst2 = np.sort(
            np.concatenate([dst2, (dead * 2).astype(np.int32)]),
            kind="stable",
        )
    val = rng.integers(0, 2**31, size=len(dst2), dtype=np.uint32)
    return slots, dst2.astype(np.int32), val


@pytest.mark.parametrize("seed", range(4))
def test_apply_random(seed):
    rng = np.random.default_rng(seed)
    total = 4096
    slots, dst2, val = _case(rng, total, 1500, tile=1024, u_win=2048)
    got, over = _run(slots, dst2, val, tile=1024, u_win=2048)
    assert over == 0
    np.testing.assert_array_equal(got, _ref(slots, dst2, val))


def test_apply_dense_and_sparse():
    rng = np.random.default_rng(42)
    total = 8192
    # dense: every slot updated
    slots = rng.integers(0, 1000, size=total, dtype=np.uint32)
    dst2 = (np.arange(total, dtype=np.int32) * 2 + 1)
    val = rng.integers(0, 1000, size=total, dtype=np.uint32)
    got, over = _run(slots, dst2, val, tile=2048, u_win=4096)
    assert over == 0
    np.testing.assert_array_equal(got, slots + val)
    # sparse: one update in the last tile only
    dst2 = np.array([(total - 3) * 2 + 1], np.int32)
    val = np.array([7], np.uint32)
    got, over = _run(slots, dst2, val, tile=2048, u_win=1024)
    assert over == 0
    want = slots.copy()
    want[total - 3] += 7
    np.testing.assert_array_equal(got, want)


def test_apply_all_dead_and_empty_tail():
    rng = np.random.default_rng(1)
    total = 2048
    slots = rng.integers(0, 2**31, size=total, dtype=np.uint32)
    dst2 = np.full(512, BIG, np.int32)  # everything dead in the BIG tail
    val = rng.integers(0, 2**31, size=512, dtype=np.uint32)
    got, over = _run(slots, dst2, val, tile=1024, u_win=1024)
    assert over == 0
    np.testing.assert_array_equal(got, slots)


def test_apply_run_straddles_tiles():
    # live run crossing several tile boundaries, including tile edges
    total = 4096
    slots = np.zeros(total, np.uint32)
    live = np.array(
        [0, 1, 1023, 1024, 1025, 2047, 2048, 4095], np.int64
    )
    dst2 = (live * 2 + 1).astype(np.int32)
    val = np.arange(1, len(live) + 1, dtype=np.uint32)
    got, over = _run(slots, dst2, val, tile=1024, u_win=1024)
    assert over == 0
    want = np.zeros(total, np.uint32)
    want[live] = val
    np.testing.assert_array_equal(got, want)


def test_apply_overflow_reported():
    # more run elements than the window: first u_win apply, rest counted
    total = 2048
    slots = np.zeros(total, np.uint32)
    live = np.arange(1500, dtype=np.int64)  # all in tile 0 at tile=2048
    dst2 = (live * 2 + 1).astype(np.int32)
    val = np.ones(1500, np.uint32)
    got, over = _run(slots, dst2, val, tile=2048, u_win=1024)
    assert over == 1500 - 1024
    want = np.zeros(total, np.uint32)
    want[:1024] = 1
    np.testing.assert_array_equal(got, want)


def test_apply_wraps_cannot_fire_stress():
    # adversarial: alternating live/dead at maximal density per window
    rng = np.random.default_rng(9)
    total = 2048
    slots = rng.integers(0, 2**31, size=total, dtype=np.uint32)
    live = np.arange(0, total, 2, dtype=np.int64)
    dead = np.arange(1, total, 2, dtype=np.int64)
    dst2 = np.sort(np.concatenate(
        [(live * 2 + 1), (dead * 2)]
    )).astype(np.int32)
    val = rng.integers(0, 2**31, size=len(dst2), dtype=np.uint32)
    got, over = _run(slots, dst2, val, tile=1024, u_win=2048)
    assert over == 0
    np.testing.assert_array_equal(got, _ref(slots, dst2, val))


def test_gather_sorted_random():
    from tsxcount_tpu.ops.pallas_apply import gather_sorted

    for seed in range(4):
        rng = np.random.default_rng(seed)
        total = 4096
        slots = rng.integers(0, 2**31, size=total, dtype=np.uint32)
        n_live = 1200
        live = np.sort(
            rng.choice(total, size=n_live, replace=False)
        ).astype(np.int64)
        dst2 = (live * 2 + 1).astype(np.int32)
        dead = np.sort(rng.integers(0, total, size=500, dtype=np.int64))
        dst2 = np.sort(np.concatenate(
            [dst2, (dead * 2).astype(np.int32)]
        ), kind="stable")
        out, over = gather_sorted(
            jnp.asarray(slots), jnp.asarray(dst2),
            tile=1024, u_win=2048, interpret=True,
        )
        out = np.asarray(out)
        assert int(over) == 0
        want = np.where(
            (dst2 & 1) == 1, slots[dst2 >> 1], 0
        ).astype(np.uint32)
        np.testing.assert_array_equal(out, want)


def test_gather_sorted_edges_and_dense():
    from tsxcount_tpu.ops.pallas_apply import gather_sorted

    rng = np.random.default_rng(7)
    total = 4096
    slots = rng.integers(0, 2**31, size=total, dtype=np.uint32)
    # dense: every element gathered
    dst2 = (np.arange(total, dtype=np.int32) * 2 + 1)
    out, over = gather_sorted(
        jnp.asarray(slots), jnp.asarray(dst2),
        tile=1024, u_win=2048, interpret=True,
    )
    assert int(over) == 0
    np.testing.assert_array_equal(np.asarray(out), slots)
    # tile-edge positions + BIG tail
    live = np.array([0, 1023, 1024, 2047, 2048, 4095], np.int64)
    dst2 = np.concatenate([
        (live * 2 + 1).astype(np.int32),
        np.full(100, 1 << 30, np.int32),
    ])
    out, _ = gather_sorted(
        jnp.asarray(slots), jnp.asarray(dst2),
        tile=1024, u_win=1024, interpret=True,
    )
    out = np.asarray(out)
    np.testing.assert_array_equal(out[:6], slots[live])
    assert (out[6:] == 0).all()
