"""Pallas TPU kernel: fused merge + dedupe + compaction in ONE pass.

The store merge previously ran three device passes over the M+N merged
rows: the merge-path kernel (ops/pallas_merge.py, writes M+N rows), XLA
boundary flags + log-step segmented sums (read + write again), and the
butterfly compaction kernel (ops/pallas_compact.py, read + write again).
This kernel fuses the whole reduction: each merge tile, after its bitonic
merge network, computes run-boundary flags in VMEM, a carry-aware
segmented inclusive sum of the (lo, hi) count columns, compacts the
run-END representatives with the butterfly routing network, and
read-modify-writes them at a global output frontier kept in SMEM across
the (sequential) grid steps.  The M+N intermediate rows never reach HBM.

Runs straddling tile boundaries are handled by an SMEM carry of the open
run's key and partial (lo, hi) sum — a tile never emits its last element
(the final grid step does), so a run that spans any number of tiles is
emitted exactly once, with the full sum.  Fan-in is therefore UNBOUNDED
(any key multiplicity), unlike the XLA path's log2(fanin) shifted adds.

Layout/alignment tricks shared with ops/pallas_merge.py (merge-path
partitioning, aligned A/B windows, reversed-B loads, static two-way
output slice — see that docstring for why da+db is in {0, ALIGN}) and
ops/pallas_compact.py (butterfly concentrator, dynamic-roll RMW windows).
The idx tiebreak column through the network is load-bearing beyond
stability: merge-path assigns equal keys to tiles under the stable
(A-before-B, position-ascending) order, and without a total order the
bitonic network could swap an equal-key row across the window slice —
emitting it in two tiles and dropping another.

This is the TPU replacement for the per-key count accumulation the
reference serializes with TSX/CAS/locks (reference
src/tsxcount/TSXHashMapTSXPerf.h addKmer_tsx / incrementElement_tsx):
equal keys are adjacent after the merge, so the "increment" is a
conflict-free segmented sum fused into the same kernel pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsxcount_tpu.ops.pallas_compact import (
    _butterfly_compact_tile,
    _dynamic_roll_1d,
    _roll_flat_left,
    _roll_flat_right,
)
from tsxcount_tpu.ops.pallas_merge import (
    MAX_KEY,
    _bitonic_merge_2d,
    merge_path_partition,
)

ALIGN = 1024
LANES = 128
DEFAULT_TILE = 1 << 14


def _flat_pos(rows: int) -> jax.Array:
    return (
        jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    )


def _sel1_i32(mask: jax.Array, x: jax.Array) -> jax.Array:
    """Reduce the single `mask`-selected element of `x` to an int32
    scalar.  Mosaic has no unsigned reductions, so uint32 inputs are
    bitcast to int32 first — exact, since only one summand is nonzero."""
    sel = jnp.where(mask, x, jnp.zeros_like(x))
    if x.dtype != jnp.int32:
        sel = pltpu.bitcast(sel, jnp.int32)
    return jnp.sum(sel)


@functools.partial(
    jax.jit, static_argnames=("n_keys", "inv_min", "tile", "interpret")
)
def merge_dedupe_sorted(a_cols: tuple, b_cols: tuple, n_keys: int,
                        inv_min: int, tile: int = DEFAULT_TILE,
                        interpret: bool = False):
    """Merge two sorted runs and reduce equal-key runs to (key, sum) rows.

    a_cols/b_cols: tuples of 1-D columns — `n_keys` msb-first uint32 key
    operands followed by exactly two count columns (lo uint32, hi int32).
    Both runs must be sorted ascending with invalid rows pre-masked to one
    shared constant whose msb operand is >= `inv_min` (so they form a
    single run at the global end).

    Returns (out_cols, n_runs, n_valid): out_cols are n_keys+2 columns of
    length M+N+ALIGN whose rows [0, n_runs) are the distinct keys
    ascending with exact 64-bit summed counts (tail junk); n_valid
    excludes the trailing invalid run if present.
    """
    if tile < ALIGN or tile & (tile - 1):
        raise ValueError("tile must be a power of two >= 1024")
    n_cols = len(a_cols)
    if n_cols != n_keys + 2 or len(b_cols) != n_cols:
        raise ValueError("expected n_keys key columns + (lo, hi) counts")
    m = a_cols[0].shape[0]
    n = b_cols[0].shape[0]
    total = m + n
    # VMEM budget: the network holds ~(n_cols+1) live copies of 4*tile
    # elements; shrink the tile for wide keys
    while tile > ALIGN and 16 * tile * (n_cols + 1) > (6 << 20):
        tile //= 2
    while tile > ALIGN and total % tile:
        tile //= 2
    if total % tile != 0:
        raise ValueError(f"total {total} not a multiple of any tile >= "
                         f"{ALIGN}")
    t_tiles = total // tile
    win = tile + ALIGN
    win_rows = win // LANES
    tile_rows = tile // LANES
    half_rows = 2 * tile // LANES
    pad_rows = half_rows - win_rows
    seq_rows = 2 * half_rows
    out_len = total + ALIGN

    a_starts, b_starts = merge_path_partition(
        tuple(a_cols[:n_keys]), tuple(b_cols[:n_keys]), tile
    )
    a_al = (a_starts[:-1] // ALIGN) * ALIGN
    b_al = (b_starts[:-1] // ALIGN) * ALIGN
    da = a_starts[:-1] - a_al
    db = b_starts[:-1] - b_al
    off_rows = (da + db) // LANES  # 0 or ALIGN//LANES (see pallas_merge)

    def pad_to(col, length):
        fill = jnp.full((length - col.shape[0],), MAX_KEY, jnp.uint32)
        return jnp.concatenate([col, fill.astype(col.dtype)])

    m_pad = ((m + win + LANES - 1) // LANES) * LANES
    a_pad = [pad_to(c, m_pad) for c in a_cols]
    n_front = (-n) % ALIGN
    front_len = n_front + win
    n_pad_len = front_len + n + win
    n_pad_len = ((n_pad_len + LANES - 1) // LANES) * LANES

    def rev_pad(col):
        return jnp.concatenate([
            jnp.full((front_len,), MAX_KEY, jnp.uint32).astype(col.dtype),
            jnp.flip(col),
            jnp.full((n_pad_len - front_len - n,), MAX_KEY,
                     jnp.uint32).astype(col.dtype),
        ])

    b_rev = [rev_pad(c) for c in b_cols]
    brev_row0 = n_front + n - b_al

    def kernel(a_row_ref, brev_row_ref, da_ref, db_ref, off_ref, *refs):
        a_refs = refs[0 : 2 * n_cols : 2]
        b_refs = refs[1 : 2 * n_cols : 2]
        out_refs = refs[2 * n_cols : 3 * n_cols]
        stats_ref = refs[3 * n_cols]
        scratch = refs[3 * n_cols + 1 : 5 * n_cols + 1]
        out_scratch = refs[5 * n_cols + 1 : 6 * n_cols + 1]
        smem_u = refs[6 * n_cols + 1]   # carry keys + carry lo (uint32)
        smem_i = refs[6 * n_cols + 2]   # carry hi, frontier (int32)
        sems = refs[-1]
        t = pl.program_id(0)
        is_first = t == 0
        is_final = t == t_tiles - 1
        ar = a_row_ref[t]
        br = brev_row_ref[t]

        # --- load A/B windows (as in pallas_merge) ---
        dmas = []
        for i in range(n_cols):
            dmas.append(pltpu.make_async_copy(
                a_refs[i].at[pl.ds(ar, win_rows), :], scratch[2 * i],
                sems.at[2 * i],
            ))
            dmas.append(pltpu.make_async_copy(
                b_refs[i].at[pl.ds(br, win_rows), :], scratch[2 * i + 1],
                sems.at[2 * i + 1],
            ))
        for dma in dmas:
            dma.start()
        for dma in dmas:
            dma.wait()

        da_t = da_ref[t]
        db_t = db_ref[t]
        win_pos = _flat_pos(win_rows)
        a_masked = win_pos < da_t
        a_keys = [
            jnp.where(a_masked, 0, scratch[2 * i][:]) for i in range(n_keys)
        ]
        a_idx = jnp.where(a_masked, -1, (ar * LANES) + win_pos)
        b_masked = win_pos >= (win - db_t)
        b_keys = [
            jnp.where(b_masked, 0, scratch[2 * i + 1][:])
            for i in range(n_keys)
        ]
        q = br * LANES + win_pos  # position in the reversed array
        b_idx = jnp.where(b_masked, -1, m + ((n_front + win) + n - 1 - q))

        maxpad_key = jnp.full((pad_rows, LANES), MAX_KEY, jnp.uint32)
        maxpad_idx = jnp.full((pad_rows, LANES), 2**31 - 1, jnp.int32)

        def seq(a2d, pad2d, b2d):
            return jnp.concatenate([a2d, pad2d, pad2d, b2d], axis=0)

        cols2d = [
            seq(ak, maxpad_key.astype(ak.dtype), bk)
            for ak, bk in zip(a_keys, b_keys)
        ]
        cols2d.append(seq(a_idx, maxpad_idx, b_idx))
        for i in range(n_keys, n_cols):  # lo, hi payloads
            pa = scratch[2 * i][:]
            pb = scratch[2 * i + 1][:]
            cols2d.append(seq(pa, maxpad_idx.astype(pa.dtype), pb))

        merged = _bitonic_merge_2d(cols2d, seq_rows, n_order=n_keys + 1)

        # --- slice the tile's true output range (drop the idx column) ---
        # key columns keep ONE extra row: flat element `tile` of the slice
        # is the next GLOBAL merged element (both windows provably extend
        # past the consumed extent: a_end <= a_al + (ALIGN-1) + tile and
        # the window holds a_al + tile + ALIGN), used to decide whether
        # the tile's last element ends its run.
        shifted = off_ref[t] != 0

        def pick(src, rows):
            lo_slice = jax.lax.slice_in_dim(src, 0, rows, axis=0)
            hi_slice = jax.lax.slice_in_dim(
                src, ALIGN // LANES, ALIGN // LANES + rows, axis=0
            )
            return jnp.where(shifted, hi_slice, lo_slice)

        keys_ext = [pick(merged[i], tile_rows + 1) for i in range(n_keys)]
        keys = [
            jax.lax.slice_in_dim(k, 0, tile_rows, axis=0) for k in keys_ext
        ]
        x_lo = pick(merged[n_keys + 1], tile_rows)
        x_hi = pick(merged[n_keys + 2], tile_rows)

        # peek the next global element's key (lane 0 of the extra row);
        # at the global end this is the MAX_KEY pad, which can never equal
        # a real packed key (msb op < 2^31), so the final run always emits.
        # Scalars live in the int32 bitcast domain (Mosaic has no unsigned
        # reductions); != is bit-equality either way.
        lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        peeks = [
            _sel1_i32(
                lane_id == 0,
                jax.lax.slice_in_dim(k, tile_rows, tile_rows + 1, axis=0),
            )
            for k in keys_ext
        ]

        # --- run-start flags (position 0 compares against the SMEM carry) -
        pos = _flat_pos(tile_rows)
        start = jnp.zeros((tile_rows, LANES), jnp.int32)
        carry_neq = jnp.zeros((tile_rows, LANES), jnp.bool_)
        for j, k in enumerate(keys):
            prev = _roll_flat_right(k, 1, tile_rows)
            start = start | jnp.where(k != prev, 1, 0)
            carry_neq = carry_neq | (
                pltpu.bitcast(k, jnp.int32) != smem_u[j]
            )
        start0 = is_first | carry_neq
        start = jnp.where(pos == 0, jnp.where(start0, 1, 0), start)

        # --- carry-aware segmented inclusive sum of (lo, hi) ---
        # f blocks adds across run starts; g is the plain OR-scan of start
        # flags (g == 0 <=> still in run 0, which may continue the carry)
        f = start
        g = start
        d = 1
        while d < tile:
            lo_s = _roll_flat_right(x_lo, d, tile_rows)
            hi_s = _roll_flat_right(x_hi, d, tile_rows)
            f_s = _roll_flat_right(f, d, tile_rows)
            g_s = _roll_flat_right(g, d, tile_rows)
            valid_in = pos >= d
            blocked = (f != 0) | ~valid_in
            add_lo = jnp.where(blocked, jnp.uint32(0), lo_s)
            add_hi = jnp.where(blocked, 0, hi_s)
            new_lo = x_lo + add_lo
            carry = jnp.where(new_lo < add_lo, 1, 0)
            x_hi = x_hi + add_hi + carry
            x_lo = new_lo
            f = f | jnp.where(valid_in, f_s, 1)
            g = g | jnp.where(valid_in, g_s, 0)
            d *= 2

        # fold the carried partial sum into run 0 (continuation only)
        run0 = g == 0
        add_lo = pltpu.bitcast(
            jnp.where(run0, smem_u[n_keys], 0), jnp.uint32
        )
        add_hi = jnp.where(run0, smem_i[0], 0)
        new_lo = x_lo + add_lo
        x_hi = x_hi + add_hi + jnp.where(new_lo < add_lo, 1, 0)
        x_lo = new_lo

        # --- emit run-END rows (last element: compare against the peek) -
        next_start = _roll_flat_left(start, 1, tile_rows)
        is_last_pos = pos == tile - 1
        tail_ends = jnp.zeros((tile_rows, LANES), jnp.bool_)
        for k, pk in zip(keys, peeks):
            tail_ends = tail_ends | (pltpu.bitcast(k, jnp.int32) != pk)
        emit_b = (~is_last_pos & (next_start != 0)) | (
            is_last_pos & tail_ends
        )
        emit = jnp.where(emit_b, 1, 0)
        emit_count = jnp.sum(emit)

        # --- carry out this tile's open run (key + partial sum) ---
        for j, k in enumerate(keys):
            smem_u[j] = _sel1_i32(is_last_pos, k)
        smem_u[n_keys] = _sel1_i32(is_last_pos, x_lo)
        smem_i[0] = _sel1_i32(is_last_pos, x_hi)

        # --- compact emitted rows and RMW them at the global frontier ---
        compacted = _butterfly_compact_tile(
            emit, list(keys) + [x_lo, x_hi], tile_rows
        )

        @pl.when(is_first)
        def _():
            smem_i[1] = 0

        fr = smem_i[1]
        fr_rows = (fr // ALIGN) * (ALIGN // LANES)
        do = fr - fr_rows * LANES
        dmas_in = [
            pltpu.make_async_copy(
                out_refs[i].at[pl.ds(fr_rows, win_rows), :],
                out_scratch[i], sems.at[2 * n_cols + i],
            )
            for i in range(n_cols)
        ]
        for dma in dmas_in:
            dma.start()
        for dma in dmas_in:
            dma.wait()
        win_pos_o = _flat_pos(win_rows)
        pad2d = jnp.zeros((win_rows - tile_rows, LANES), jnp.int32)
        for i in range(n_cols):
            col = compacted[i]
            buf = jnp.concatenate([col, pad2d.astype(col.dtype)], axis=0)
            rolled = _dynamic_roll_1d(buf, do, win_rows)
            out_scratch[i][:] = jnp.where(
                win_pos_o >= do, rolled, out_scratch[i][:]
            )
        dmas_out = [
            pltpu.make_async_copy(
                out_scratch[i],
                out_refs[i].at[pl.ds(fr_rows, win_rows), :],
                sems.at[2 * n_cols + i],
            )
            for i in range(n_cols)
        ]
        for dma in dmas_out:
            dma.start()
        for dma in dmas_out:
            dma.wait()
        smem_i[1] = fr + emit_count

        @pl.when(is_final)
        def _():
            n_runs = fr + emit_count
            # valid msb ops and the invalid constant are all < 2^31, so
            # the int32-bitcast compare is sign-safe
            msb_last = _sel1_i32(is_last_pos, keys[0])
            invalid_run = jnp.where(msb_last >= inv_min, 1, 0)
            stats_ref[0, 0] = n_runs
            stats_ref[0, 1] = n_runs - invalid_run

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(t_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_cols),
        out_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * n_cols
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((win_rows, LANES), c.dtype)
             for pair in zip(a_cols, b_cols) for c in pair]
            + [pltpu.VMEM((win_rows, LANES), c.dtype) for c in a_cols]
            + [pltpu.SMEM((n_keys + 1,), jnp.int32),
               pltpu.SMEM((2,), jnp.int32),
               pltpu.SemaphoreType.DMA((3 * n_cols,))]
        ),
    )

    inputs = []
    for a_c, b_c in zip(a_pad, b_rev):
        inputs.append(a_c.reshape(-1, LANES))
        inputs.append(b_c.reshape(-1, LANES))

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            [jax.ShapeDtypeStruct((out_len // LANES, LANES), c.dtype)
             for c in a_cols]
            + [jax.ShapeDtypeStruct((1, 2), jnp.int32)]
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        a_al // LANES, brev_row0 // LANES, da, db, off_rows,
        *inputs,
    )
    cols = tuple(o.reshape(out_len) for o in out[:n_cols])
    stats = out[n_cols]
    return cols, stats[0, 0], stats[0, 1]
