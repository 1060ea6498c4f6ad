"""Pallas TPU kernel: stream compaction of flagged rows (stable).

The merge pipeline ends by moving each key-run's boundary row (which holds
the run's summed digits) to the front of the store — a stable stream
compaction.  The XLA formulation is a payload-carrying sort over the whole
array (~550 ms at 67M rows); this kernel does it in one linear pass:

  * phase A (XLA, tiny): per-tile flag counts -> exclusive prefix = each
    tile's output offset;
  * phase B (Pallas, sequential grid): each tile bitonic-sorts its C rows by
    where(flag, local_pos, C) in VMEM — flagged rows to the front, in
    order — then places them at the global output offset with a dynamic
    1-D roll (lane roll + two row rolls + select; Mosaic supports dynamic
    shifts) and read-modify-writes an ALIGN-aligned output window.  TPU
    grid steps execute sequentially and every DMA is waited inside the
    body, so tile t+1 reads tile t's tail before overwriting the junk
    beyond it.

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


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def compact_flagged(flag: jax.Array, cols: tuple, tile: int = DEFAULT_TILE,
                    interpret: bool = False):
    """Stable-compact rows where flag != 0 to the front.

    flag: int32 [TOTAL] (0/1); cols: tuple of int32/uint32 [TOTAL] columns.
    TOTAL must be a multiple of `tile`; tile a power of two >= 1024.
    Returns compacted columns of length TOTAL + ALIGN (valid prefix =
    number of flagged rows; tail junk).
    """
    if tile < ALIGN or tile & (tile - 1):
        raise ValueError("tile must be a power of two >= 1024")
    total = flag.shape[0]
    if total % tile != 0:
        raise ValueError(f"total {total} not a multiple of {tile}")
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

        pos = (
            jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
            * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
        )
        comp_key = jnp.where(flag_ref[:] != 0, pos, tile)
        cols2d = [comp_key] + [c[:] for c in col_refs]
        sorted_cols = _bitonic_sort_tile(cols2d, tile_rows)

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
            col = sorted_cols[1 + i]
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
