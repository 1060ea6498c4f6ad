"""Pallas TPU kernel: apply slot-sorted unique updates with linear DMA.

The table backend's per-round slot update was an XLA scatter-add of one
combined row per contender (core/table.py _round_body).  XLA TPU scatter
costs per ROW (~765 ms for a 9.6M-row round at l=26, tools/tablebench.py
r5), which made the table backend 17x slower than the sort backend
(VERDICT r4 weakness #1 / next-step #2).  But the claim sort already
orders contenders by slot, so the scatter's destinations are SORTED and
UNIQUE — nothing about the hardware forces per-row cost:

  * grid over SLOT TILES: each grid step owns a contiguous block of the
    flattened [slots * cols] table and reads/writes it with one linear
    DMA (the classic owner-computes sweep);
  * the tile's update elements are a contiguous run of the (sorted)
    update array, located by a precomputed per-tile binary search; the
    run is loaded with one ALIGN-aligned dynamic DMA per side;
  * inside VMEM the update elements move to their in-tile offsets with a
    butterfly DISTRIBUTOR — the exact inverse of the concentrator in
    ops/pallas_compact.py: compact the run's live elements to the front
    (LSB-first, left), then SPREAD them to their strictly-increasing
    destinations (MSB-first, right).  Time-reversal of the concentrator's
    collision-freedom argument covers the spread: its intermediate states
    are the concentrator's, reversed;
  * the spread staging buffer is zero everywhere except landed elements,
    so the slot update is one vector add — the "claim adds a combined
    row into a zero slot" encoding (core/table.py TableState) unchanged.

Updates are FLAT ELEMENTS, not rows: row j targeting slot p contributes
elements (p*C + c) for its C columns, so destinations stay strictly
increasing across the whole table and a tile boundary may split a row
between two grid steps without any special casing.

Replaces the reference's per-slot CAS/TSX retry loop slot write
(reference src/tsxcount/TSXHashMap.h:1135-1229 storeKeyValElement) with a
conflict-free batched sweep.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsxcount_tpu.ops.pallas_compact import (
    _butterfly_compact_tile,
    _roll_flat_left,
    _roll_flat_right,
)

ALIGN = 1024
LANES = 128
BIG = 1 << 30  # > any doubled flat destination (2*S*C < 2^30 at l<=26, C<=12)


def _butterfly_spread_tile(vals2d: list[jax.Array], s2d: jax.Array,
                           alive2d: jax.Array, rows: int
                           ) -> tuple[list[jax.Array], jax.Array]:
    """Move alive element at flat position p RIGHT by s2d[p] (in-VMEM).

    Preconditions: over alive elements, destinations p + s are strictly
    increasing, s >= 0, and every destination < rows*128.  This is the
    inverse of _butterfly_compact_tile: bits route MSB-first and elements
    move right; collision-freedom follows by time-reversing the
    concentrator's argument (its intermediate occupancies are exactly
    these, in reverse).  Returns (routed columns, landed mask int32);
    positions without a landed element hold junk — mask with `landed`.
    """
    n = rows * LANES
    nbits = (n - 1).bit_length()
    cols = list(vals2d)
    alive = alive2d
    s = jnp.where(alive != 0, s2d, 0)
    for b in reversed(range(nbits)):
        d = 1 << b
        inc_s = _roll_flat_right(s, d, rows)
        inc_alive = _roll_flat_right(alive, d, rows)
        take_in = (inc_alive != 0) & (((inc_s >> b) & 1) == 1)
        move_out = (alive != 0) & (((s >> b) & 1) == 1)
        new_cols = []
        for c in cols:
            inc_c = _roll_flat_right(c, d, rows)
            new_cols.append(jnp.where(take_in, inc_c, c))
        cols = new_cols
        s = jnp.where(take_in, inc_s - d, s)
        alive = jnp.where(
            take_in, 1, jnp.where(move_out, 0, alive)
        )
    landed = jnp.where((alive != 0) & (s == 0), 1, 0)
    return cols, landed


@functools.partial(
    jax.jit, static_argnames=("tile", "u_win", "interpret")
)
def apply_sorted_unique(slots_flat: jax.Array, dst2: jax.Array,
                        val: jax.Array, tile: int = 1 << 17,
                        u_win: int = 1 << 15,
                        interpret: bool = False
                        ) -> tuple[jax.Array, jax.Array]:
    """slots_flat[dst2[e] >> 1] += val[e] for every odd dst2[e].

    slots_flat: uint32 [S*C] flattened combined slot rows.
    dst2: int32 [UE], non-decreasing; element e is LIVE iff dst2[e] is
    odd, and over live elements (dst2 >> 1) is strictly increasing and
    < S*C.  Dead elements (even dst2, or the BIG tail) are ignored.
    val: uint32 [UE] values to add.

    tile: slot elements per grid step (must divide S*C, multiple of 1024).
    u_win: update-window elements per grid step.  A tile whose update run
    exceeds the window applies only the first u_win elements; the
    overflow count (elements, live or dead) is returned so the caller can
    fail loudly — with hash-uniform destinations and u_win >= 4x the mean
    run this never fires.

    Returns (updated slots_flat, overflow_elements int32 scalar).
    """
    total = slots_flat.shape[0]
    while tile > ALIGN and total % tile:
        tile //= 2
    if total % tile or tile % ALIGN:
        raise ValueError(f"no valid tile divides {total}")
    t_tiles = total // tile
    ue = dst2.shape[0]
    tile_rows = tile // LANES
    win_rows = u_win // LANES

    # per-tile update runs: boundaries in the doubled-destination domain
    bounds = jnp.arange(t_tiles + 1, dtype=jnp.int32) * (2 * tile)
    edges = jnp.searchsorted(dst2, bounds, side="left").astype(jnp.int32)
    u_start = edges[:-1]
    u_end = edges[1:]
    u_al = (u_start // ALIGN) * ALIGN
    lo = u_start - u_al
    hi_raw = u_end - u_al
    overflow = jnp.sum(jnp.maximum(hi_raw - u_win, 0))
    hi = jnp.minimum(hi_raw, u_win)

    # pad the update arrays so any aligned window is in bounds
    pad = u_win + ALIGN
    dst2_p = jnp.concatenate(
        [dst2, jnp.full((pad,), BIG, jnp.int32)]
    )
    val_p = jnp.concatenate([val, jnp.zeros((pad,), jnp.uint32)])
    pad_len = ((dst2_p.shape[0] + LANES - 1) // LANES) * LANES
    dst2_p = jnp.concatenate(
        [dst2_p, jnp.full((pad_len - dst2_p.shape[0],), BIG, jnp.int32)]
    )
    val_p = jnp.concatenate(
        [val_p, jnp.zeros((pad_len - val_p.shape[0],), jnp.uint32)]
    )

    def kernel(u_al_ref, lo_ref, hi_ref, dst_ref, val_ref, slot_ref,
               out_ref, dst_s, val_s, sems):
        t = pl.program_id(0)
        ar = u_al_ref[t] // LANES
        d_in = pltpu.make_async_copy(
            dst_ref.at[pl.ds(ar, win_rows), :], dst_s, sems.at[0]
        )
        v_in = pltpu.make_async_copy(
            val_ref.at[pl.ds(ar, win_rows), :], val_s, sems.at[1]
        )
        d_in.start()
        v_in.start()
        d_in.wait()
        v_in.wait()

        wpos = (
            jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 0)
            * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 1)
        )
        dstw = dst_s[:]
        in_run = (wpos >= lo_ref[t]) & (wpos < hi_ref[t])
        alive = jnp.where(in_run & ((dstw & 1) == 1), 1, 0)
        ld = (dstw >> 1) - t * tile
        # compact live elements to the window front (rank r element then
        # has ld >= r, so the spread shift is >= 0 and monotone)
        comp = _butterfly_compact_tile(
            alive, [val_s[:], jnp.where(alive != 0, ld, 0)], win_rows
        )
        n_alive = jnp.sum(alive)
        cpos = wpos
        calive = jnp.where(cpos < n_alive, 1, 0)
        cval, cld = comp[0], comp[1]
        shift = jnp.where(calive != 0, cld - cpos, 0)
        if win_rows < tile_rows:
            padr = tile_rows - win_rows
            cval = jnp.concatenate(
                [cval, jnp.zeros((padr, LANES), cval.dtype)], axis=0
            )
            shift = jnp.concatenate(
                [shift, jnp.zeros((padr, LANES), jnp.int32)], axis=0
            )
            calive = jnp.concatenate(
                [calive, jnp.zeros((padr, LANES), jnp.int32)], axis=0
            )
        elif win_rows > tile_rows:
            # destinations are unique within the tile, so live elements
            # occupy ranks < tile after compaction — the excess window
            # rows hold only dead junk
            cval = jax.lax.slice_in_dim(cval, 0, tile_rows, axis=0)
            shift = jax.lax.slice_in_dim(shift, 0, tile_rows, axis=0)
            calive = jax.lax.slice_in_dim(calive, 0, tile_rows, axis=0)
        spread, landed = _butterfly_spread_tile(
            [cval], shift, calive, tile_rows
        )
        add = jnp.where(landed != 0, spread[0], jnp.uint32(0))
        out_ref[:] = slot_ref[:] + add

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # dst windows
            pl.BlockSpec(memory_space=pl.ANY),  # val windows
            pl.BlockSpec((tile_rows, LANES), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),  # slot block
        ],
        out_specs=pl.BlockSpec((tile_rows, LANES), lambda t, *_: (t, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((win_rows, LANES), jnp.int32),
            pltpu.VMEM((win_rows, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((total // LANES, LANES),
                                       jnp.uint32),
        interpret=interpret,
    )(
        u_al, lo, hi,
        dst2_p.reshape(-1, LANES),
        val_p.reshape(-1, LANES),
        slots_flat.reshape(-1, LANES),
    )
    return out.reshape(total), overflow


@functools.partial(
    jax.jit, static_argnames=("tile", "u_win", "interpret")
)
def gather_sorted(slots_flat: jax.Array, dst2: jax.Array,
                  tile: int = 1 << 17, u_win: int = 1 << 15,
                  interpret: bool = False) -> jax.Array:
    """out[e] = slots_flat[dst2[e] >> 1] for every odd dst2[e], else 0.

    The monotone-gather mirror of apply_sorted_unique: grid over slot
    tiles; each tile compacts its live window destinations to dense
    ranks, spreads rank marks into the tile to build the wanted-element
    mask, compacts the slot elements by that mask (aligned with ranks by
    monotonicity), and spreads the values back to their window positions,
    read-modify-writing the ALIGN-aligned output window (sequential grid
    makes the overlap with neighbor windows safe).  Same dst2 contract as
    apply_sorted_unique, plus: live (odd) destinations must be strictly
    increasing GLOBALLY (one gather element per slot element — callers
    gather run heads and fill forward).  Window overflow elements return
    0 AND are counted in the returned overflow scalar — a zero row would
    silently read as an empty slot, so callers must fail loudly on it
    (with hash-uniform destinations and u_win >= 4x the mean run it
    never fires).  Returns (values [UE], overflow int32).
    """
    total = slots_flat.shape[0]
    while tile > ALIGN and total % tile:
        tile //= 2
    if total % tile or tile % ALIGN:
        raise ValueError(f"no valid tile divides {total}")
    t_tiles = total // tile
    ue = dst2.shape[0]
    tile_rows = tile // LANES
    win_rows = u_win // LANES

    bounds = jnp.arange(t_tiles + 1, dtype=jnp.int32) * (2 * tile)
    edges = jnp.searchsorted(dst2, bounds, side="left").astype(jnp.int32)
    u_start = edges[:-1]
    u_end = edges[1:]
    u_al = (u_start // ALIGN) * ALIGN
    lo = u_start - u_al
    hi_raw = u_end - u_al
    overflow = jnp.sum(jnp.maximum(hi_raw - u_win, 0))
    hi = jnp.minimum(hi_raw, u_win)

    pad = u_win + ALIGN
    dst2_p = jnp.concatenate(
        [dst2, jnp.full((pad,), BIG, jnp.int32)]
    )
    pad_len = ((dst2_p.shape[0] + LANES - 1) // LANES) * LANES
    dst2_p = jnp.concatenate(
        [dst2_p, jnp.full((pad_len - dst2_p.shape[0],), BIG, jnp.int32)]
    )
    out_len = pad_len

    def kernel(u_al_ref, lo_ref, hi_ref, dst_ref, slot_ref, out_ref,
               dst_s, out_s, sems):
        t = pl.program_id(0)
        ar = u_al_ref[t] // LANES
        d_in = pltpu.make_async_copy(
            dst_ref.at[pl.ds(ar, win_rows), :], dst_s, sems.at[0]
        )
        d_in.start()
        d_in.wait()

        wpos = (
            jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 0)
            * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 1)
        )
        dstw = dst_s[:]
        in_run = (wpos >= lo_ref[t]) & (wpos < hi_ref[t])
        alive = jnp.where(in_run & ((dstw & 1) == 1), 1, 0)
        ld = (dstw >> 1) - t * tile
        # dense ranks: (ld, wpos) compacted by aliveness
        comp = _butterfly_compact_tile(
            alive, [jnp.where(alive != 0, ld, 0),
                    jnp.where(alive != 0, wpos, 0)], win_rows
        )
        n_alive = jnp.sum(alive)
        rankpos = wpos
        ralive = jnp.where(rankpos < n_alive, 1, 0)
        cld, cwpos = comp[0], comp[1]
        # spread rank marks into the slot tile: landed = wanted elements
        if win_rows < tile_rows:
            padr = tile_rows - win_rows

            def up(x):
                return jnp.concatenate(
                    [x, jnp.zeros((padr, LANES), x.dtype)], axis=0
                )

            cld_t, ralive_t = up(cld), up(ralive)
            rp_t = up(rankpos)
        else:
            cld_t = jax.lax.slice_in_dim(cld, 0, tile_rows, axis=0)
            ralive_t = jax.lax.slice_in_dim(ralive, 0, tile_rows, axis=0)
            rp_t = jax.lax.slice_in_dim(rankpos, 0, tile_rows, axis=0)
        shift_t = jnp.where(ralive_t != 0, cld_t - rp_t, 0)
        spread_marks, landed = _butterfly_spread_tile(
            [ralive_t], shift_t, ralive_t, tile_rows
        )
        want = jnp.where(landed != 0, 1, 0)
        # values at wanted elements, dense in rank order
        vals_dense = _butterfly_compact_tile(
            want, [slot_ref[:]], tile_rows
        )[0]
        # route values back to window positions of their ranks
        if win_rows < tile_rows:
            vals_w = jax.lax.slice_in_dim(
                vals_dense, 0, win_rows, axis=0
            )
        elif win_rows == tile_rows:
            vals_w = vals_dense
        else:
            vals_w = jnp.concatenate([
                vals_dense,
                jnp.zeros((win_rows - tile_rows, LANES), jnp.uint32),
            ], axis=0)
        shift_w = jnp.where(ralive != 0, cwpos - rankpos, 0)
        ral_w = ralive
        spread_vals, landed_w = _butterfly_spread_tile(
            [vals_w], shift_w, ral_w, win_rows
        )
        mine = (wpos >= lo_ref[t]) & (wpos < hi_ref[t])
        merged = jnp.where(
            (landed_w != 0) & mine, spread_vals[0], jnp.uint32(0)
        )
        # RMW the output window (keep neighbors' slop)
        o_in = pltpu.make_async_copy(
            out_ref.at[pl.ds(ar, win_rows), :], out_s, sems.at[1]
        )
        o_in.start()
        o_in.wait()
        out_s[:] = jnp.where(mine, merged, out_s[:])
        o_out = pltpu.make_async_copy(
            out_s, out_ref.at[pl.ds(ar, win_rows), :], sems.at[1]
        )
        o_out.start()
        o_out.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # dst windows
            pl.BlockSpec((tile_rows, LANES), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM),  # slot block
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((win_rows, LANES), jnp.int32),
            pltpu.VMEM((win_rows, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_len // LANES, LANES),
                                       jnp.uint32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        u_al, lo, hi,
        dst2_p.reshape(-1, LANES),
        slots_flat.reshape(-1, LANES),
    )
    return out.reshape(out_len)[:ue], overflow
