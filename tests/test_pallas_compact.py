"""Pallas stream-compaction kernel tests (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.ops.pallas_compact import compact_flagged

TILE = 1024


@pytest.mark.parametrize("route", ["butterfly", "bitonic"])
@pytest.mark.parametrize("total,density,seed", [
    (1024, 0.5, 0),
    (4096, 0.1, 1),
    (4096, 0.9, 2),
    (8192, 0.0, 3),
    (8192, 1.0, 4),
])
def test_compact_matches_numpy(total, density, seed, route):
    rng = np.random.default_rng(seed)
    flag = (rng.random(total) < density).astype(np.int32)
    a = rng.integers(0, 2**31, size=total, dtype=np.int32)
    b = rng.integers(0, 2**31, size=total, dtype=np.uint32)
    out_a, out_b = compact_flagged(
        jnp.asarray(flag), (jnp.asarray(a), jnp.asarray(b)),
        tile=TILE, interpret=True, route=route,
    )
    n = int(flag.sum())
    np.testing.assert_array_equal(np.asarray(out_a)[:n], a[flag == 1])
    np.testing.assert_array_equal(np.asarray(out_b)[:n], b[flag == 1])


def test_compact_cross_tile_boundaries():
    # offsets hit every alignment residue across tiles
    rng = np.random.default_rng(9)
    total = 16 * TILE
    flag = np.zeros(total, np.int32)
    # irregular counts per tile to exercise do in [0, 1024)
    for t in range(16):
        c = int(rng.integers(0, TILE))
        idx = rng.choice(TILE, size=c, replace=False) + t * TILE
        flag[idx] = 1
    vals = np.arange(total, dtype=np.int32)
    (out,) = compact_flagged(
        jnp.asarray(flag), (jnp.asarray(vals),), tile=TILE, interpret=True
    )
    n = int(flag.sum())
    np.testing.assert_array_equal(np.asarray(out)[:n], vals[flag == 1])
