"""Pallas TPU kernel: stream compaction of flagged rows (stable).

The merge pipeline ends by moving each key-run's boundary row (which holds
the run's summed digits) to the front of the store — a stable stream
compaction.  The XLA formulation is a payload-carrying sort over the whole
array (~550 ms at 67M rows); this kernel does it in one linear pass:

  * phase A (XLA, tiny): per-tile flag counts -> exclusive prefix = each
    tile's output offset;
  * phase B (Pallas, sequential grid): each tile compacts its C rows in
    VMEM with a LSB-first butterfly routing network (log2(C) roll+select
    steps: element at local position p must move left by
    p - rank(p) = #unflagged-before-p, a monotone shift, which a butterfly
    routes collision-free — ~6x cheaper than the bitonic sort it replaced,
    which needed log^2/2 compare-exchange stages) — then places the rows at
    the global output offset with a dynamic 1-D roll (lane roll + two row
    rolls + select; Mosaic supports dynamic shifts) and read-modify-writes
    an ALIGN-aligned output window.  TPU grid steps execute sequentially
    and every DMA is waited inside the body, so tile t+1 reads tile t's
    tail before overwriting the junk beyond it.

Output columns have TOTAL + ALIGN elements; rows [0, n_flags) are the
compacted result, the tail is junk (callers slice and mask by n as usual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 1024
LANES = 128
DEFAULT_TILE = 4096


def _bitonic_sort_tile(cols2d: list[jax.Array], rows: int
                       ) -> list[jax.Array]:
    """Full bitonic sort (ascending) of a (rows, 128) row-major tile.
    cols2d[0] (int32) is the key; remaining columns follow the exchanges.
    Ties keep arbitrary order (keys are unique except the junk plateau)."""
    n = rows * LANES
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = row_id * LANES + lane_id

    k = 2
    while k <= n:
        asc = (flat & k) == 0
        s = k // 2
        while s >= 1:
            if s >= LANES:
                sr = s // LANES
                ups = [pltpu.roll(c, rows - sr, axis=0) for c in cols2d]
                downs = [pltpu.roll(c, sr, axis=0) for c in cols2d]
                is_lower = (row_id & sr) == 0
            else:
                ups = [pltpu.roll(c, LANES - s, axis=1) for c in cols2d]
                downs = [pltpu.roll(c, s, axis=1) for c in cols2d]
                is_lower = (lane_id & s) == 0
            partner = [
                jnp.where(is_lower, up, down)
                for up, down in zip(ups, downs)
            ]
            p_lt = partner[0] < cols2d[0]
            s_lt = cols2d[0] < partner[0]
            take_min = (asc & is_lower) | ~(asc | is_lower)
            sel_partner = (take_min & p_lt) | (~take_min & s_lt)
            cols2d = [
                jnp.where(sel_partner, p, c)
                for c, p in zip(cols2d, partner)
            ]
            s //= 2
        k *= 2
    return cols2d


def _roll_flat_right(x2d: jax.Array, d: int, rows: int) -> jax.Array:
    """Static circular roll of a row-major (rows, 128) buffer viewed as 1-D:
    out[i] = in[(i - d) % n].  Lane roll + two row rolls + select."""
    dl, dr = d % LANES, d // LANES
    if dl == 0:
        return pltpu.roll(x2d, dr % rows, axis=0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    y = pltpu.roll(x2d, dl, axis=1)
    a = pltpu.roll(y, dr % rows, axis=0)
    b = pltpu.roll(y, (dr + 1) % rows, axis=0)
    return jnp.where(lane_id >= dl, a, b)


def _roll_flat_left(x2d: jax.Array, d: int, rows: int) -> jax.Array:
    """out[i] = in[(i + d) % n] for a row-major (rows, 128) buffer."""
    dl, dr = d % LANES, d // LANES
    if dl == 0:
        return pltpu.roll(x2d, (rows - dr) % rows, axis=0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    y = pltpu.roll(x2d, LANES - dl, axis=1)
    a = pltpu.roll(y, (rows - dr) % rows, axis=0)
    b = pltpu.roll(y, (rows - dr - 1) % rows, axis=0)
    return jnp.where(lane_id < LANES - dl, a, b)


def _butterfly_compact_tile(flag2d: jax.Array, cols2d: list[jax.Array],
                            rows: int) -> list[jax.Array]:
    """Stable in-VMEM compaction of flagged rows to the tile front.

    flag2d: int32 (rows, 128) 0/1; cols2d: payload columns.  Flagged
    element at flat position p must move LEFT by s(p) = p - rank(p) =
    #unflagged before p — monotone non-decreasing, so routing one shift
    bit at a time (LSB first) is collision-free (butterfly concentrator):
    at step b, slot p takes slot p+2^b's element iff that element's
    remaining shift has bit b; an element whose own bit b is set and is
    not replaced zeroes its shift (kills the stale copy).  Wrapped
    incoming can never fire: an element's remaining shift never exceeds
    its current position, so sources below 2^b have bit b clear.
    Validated exhaustively (all 2^16 flag patterns at n=16) plus randomized
    up to n=5000 against np reference.
    """
    n = rows * LANES
    nbits = (n - 1).bit_length()
    flat_pos = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )
    # inclusive prefix sum of flags over the flat tile
    prefix = flag2d
    d = 1
    while d < n:
        rolled = _roll_flat_right(prefix, d, rows)
        prefix = prefix + jnp.where(flat_pos >= d, rolled, 0)
        d *= 2
    s = jnp.where(flag2d != 0, flat_pos - (prefix - flag2d), 0)
    cols = list(cols2d)
    for b in range(nbits):
        d = 1 << b
        inc_s = _roll_flat_left(s, d, rows)
        take_in = ((inc_s >> b) & 1) == 1
        move_out = ((s >> b) & 1) == 1
        new_cols = []
        for c in cols:
            inc_c = _roll_flat_left(c, d, rows)
            new_cols.append(jnp.where(take_in, inc_c, c))
        cols = new_cols
        s = jnp.where(take_in, inc_s, jnp.where(move_out, 0, s))
    return cols


def _dynamic_roll_1d(x2d: jax.Array, shift, rows: int) -> jax.Array:
    """Logical 1-D circular roll of a row-major (rows, 128) buffer by a
    dynamic `shift` (0 <= shift < rows*128): out[p] = in[(p - shift) % n].
    Composed of a dynamic lane roll, two dynamic row rolls, and a select."""
    q = shift // LANES
    sft = shift % LANES
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    lanes_rolled = pltpu.roll(x2d, sft, axis=1)
    a = pltpu.roll(lanes_rolled, q, axis=0)
    b = pltpu.roll(lanes_rolled, q + 1, axis=0)
    return jnp.where(lane_id >= sft, a, b)


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "route"))
def compact_flagged(flag: jax.Array, cols: tuple, tile: int = DEFAULT_TILE,
                    interpret: bool = False, route: str = "butterfly"):
    """Stable-compact rows where flag != 0 to the front.

    flag: int32 [TOTAL] (0/1); cols: tuple of int32/uint32 [TOTAL] columns.
    TOTAL must be a multiple of `tile`; tile a power of two >= 1024.
    Returns compacted columns of length TOTAL + ALIGN (valid prefix =
    number of flagged rows; tail junk).
    route: "butterfly" (log-step routing network, default) or "bitonic"
    (the original per-tile sort; kept for A/B benchmarking).
    """
    if tile < ALIGN or tile & (tile - 1):
        raise ValueError("tile must be a power of two >= 1024")
    total = flag.shape[0]
    while tile > ALIGN and total % tile:  # shrink to a divisor of total
        tile //= 2
    if total % tile != 0:
        raise ValueError(f"total {total} not a multiple of any tile >= "
                         f"{ALIGN}")
    t_tiles = total // tile
    n_cols = len(cols)
    win = tile + ALIGN
    win_rows = win // LANES
    tile_rows = tile // LANES
    out_len = total + ALIGN

    counts = jnp.sum(flag.reshape(t_tiles, tile), axis=1, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]]
    )
    align_rows = (starts // ALIGN) * (ALIGN // LANES)
    do = starts % ALIGN

    def kernel(align_ref, do_ref, flag_ref, *refs):
        col_refs = refs[0:n_cols]
        out_refs = refs[n_cols : 2 * n_cols]
        scratch = refs[2 * n_cols : 3 * n_cols]
        sems = refs[-1]
        t = pl.program_id(0)
        ar = align_ref[t]
        do_t = do_ref[t]

        if route == "butterfly":
            compacted = _butterfly_compact_tile(
                flag_ref[:], [c[:] for c in col_refs], tile_rows
            )
        else:
            pos = (
                jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
                * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
            )
            comp_key = jnp.where(flag_ref[:] != 0, pos, tile)
            cols2d = [comp_key] + [c[:] for c in col_refs]
            compacted = _bitonic_sort_tile(cols2d, tile_rows)[1:]

        win_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 0)
            * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 1)
        )
        pad2d = jnp.zeros((win_rows - tile_rows, LANES), jnp.int32)

        # read the existing window (holds the previous tile's tail), place
        # this tile's compacted rows at offset do, write back
        dmas_in = [
            pltpu.make_async_copy(
                out_refs[i].at[pl.ds(ar, win_rows), :], scratch[i],
                sems.at[i],
            )
            for i in range(n_cols)
        ]
        for dma in dmas_in:
            dma.start()
        for dma in dmas_in:
            dma.wait()
        for i in range(n_cols):
            col = compacted[i]
            buf = jnp.concatenate(
                [col, pad2d.astype(col.dtype)], axis=0
            )
            rolled = _dynamic_roll_1d(buf, do_t, win_rows)
            merged = jnp.where(win_pos >= do_t, rolled, scratch[i][:])
            scratch[i][:] = merged
        dmas_out = [
            pltpu.make_async_copy(
                scratch[i], out_refs[i].at[pl.ds(ar, win_rows), :],
                sems.at[i],
            )
            for i in range(n_cols)
        ]
        for dma in dmas_out:
            dma.start()
        for dma in dmas_out:
            dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles,),
        in_specs=(
            [pl.BlockSpec((tile_rows, LANES), lambda t, *_: (t, 0),
                          memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((tile_rows, LANES), lambda t, *_: (t, 0),
                            memory_space=pltpu.VMEM)] * n_cols
        ),
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_cols,
        scratch_shapes=(
            [pltpu.VMEM((win_rows, LANES), c.dtype) for c in cols]
            + [pltpu.SemaphoreType.DMA((n_cols,))]
        ),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((out_len // LANES, LANES), c.dtype)
            for c in cols
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        align_rows, do,
        flag.reshape(total // LANES, LANES),
        *[c.reshape(total // LANES, LANES) for c in cols],
    )
    return tuple(o.reshape(out_len) for o in out)
