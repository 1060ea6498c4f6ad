"""Pallas TPU kernel: merge two SORTED runs in one linear pass.

The store merge combines runs that are already sorted (the store's key
prefix and each batch's deduped histogram), but `jax.lax.sort` cannot
exploit that and pays O(n log^2 n) compare-exchange passes.  This kernel is
the classic GPU-style merge-path merge, adapted to TPU/Mosaic constraints:

  * merge-path partitioning (vectorized binary search, computed in XLA
    outside the kernel) gives each grid tile an independent, exactly-`tile`
    slice of the output;
  * Mosaic requires dynamic DMA starts to be 1024-element aligned, so each
    tile loads an ALIGNED window of tile+1024 elements per side and masks
    the `da`/`db` elements below its true extent to (key=0, idx=-1).
    Because tile boundaries and alignment are both 1024-multiples,
    da+db is provably in {0, 1024} — the output is a STATIC two-way slice
    select, no dynamic shifts anywhere;
  * the 4*tile sequence [masked A ascending, MAX pad | MAX pad, B
    descending, masked] is bitonic; a log2(4*tile)-stage bitonic merger
    runs on the VPU using only `pltpu.roll` (sublane axis for strides >=
    128, lane axis below) + elementwise selects — an element's stride-s
    partner is index XOR s, and the wrong-direction wrap of the circular
    roll is discarded by the is_lower select;
  * a global-index column makes the compare a total order, so the merge is
    stable (A before B on ties) and duplicate keys keep their payloads
    intact across tile boundaries.

Keys are single uint32 (the packed flag|kmer key for k <= 15; wider keys
fall back to lax.sort).  Any number of uint32/int32 payload columns ride
through the network.  B inputs are passed globally reversed because Mosaic
has no `rev` primitive: loading the reversed array yields each tile's B
window already descending.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1 << 14  # output elements per grid step (pow2, >= 1024);
# bigger tiles amortize the bitonic merger's log(4*tile) stages over more
# outputs: 16384 beat 8192 by 14% end-to-end (tools/kernelbench.py A/B)
ALIGN = 1024            # Mosaic dynamic-slice alignment for 32-bit dtypes
LANES = 128
MAX_KEY = 0xFFFFFFFF  # python int: jnp scalars would be captured consts in the kernel


def _cols_leq(a_cols, b_cols) -> jax.Array:
    """Lexicographic a <= b over msb-first column tuples."""
    leq = jnp.ones(a_cols[0].shape, jnp.bool_)
    lt = jnp.zeros(a_cols[0].shape, jnp.bool_)
    eq = jnp.ones(a_cols[0].shape, jnp.bool_)
    for a, b in zip(a_cols, b_cols):
        lt = lt | (eq & (a < b))
        eq = eq & (a == b)
    del leq
    return lt | eq


def merge_path_partition(a_keys: tuple, b_keys: tuple,
                         tile: int) -> tuple[jax.Array, jax.Array]:
    """Per-tile split points (a_starts, b_starts), each int32 [T+1].

    a_keys/b_keys: msb-first tuples of uint32 key columns.
    a_starts[t] = number of A elements among the first t*tile merged
    elements, under the stable order (A wins ties)."""
    m = a_keys[0].shape[0]
    n = b_keys[0].shape[0]
    total = m + n
    t_tiles = pl.cdiv(total, tile)
    diag = jnp.minimum(
        jnp.arange(t_tiles + 1, dtype=jnp.int32) * tile, total
    )
    if m == 0:
        return jnp.zeros_like(diag), diag
    if n == 0:
        return diag, jnp.zeros_like(diag)
    lo = jnp.maximum(0, diag - n)
    hi = jnp.minimum(diag, m)
    iters = max(1, int(m).bit_length() + 1)

    def body(_, lohi):
        lo, hi = lohi
        active = lo < hi
        mid = (lo + hi) >> 1
        a_val = tuple(k[jnp.clip(mid, 0, m - 1)] for k in a_keys)
        b_val = tuple(
            k[jnp.clip(diag - 1 - mid, 0, n - 1)] for k in b_keys
        )
        take_a = _cols_leq(a_val, b_val)  # stable: equal keys -> A first
        lo = jnp.where(active & take_a, mid + 1, lo)
        hi = jnp.where(active & ~take_a, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo, diag - lo


def _bitonic_merge_2d(cols2d: list[jax.Array], rows: int,
                      n_order: int = 2) -> list[jax.Array]:
    """Bitonic merger on a row-major (rows, 128) bitonic sequence.
    cols2d[0:n_order] (msb-first key columns, then the idx tiebreak)
    define the total order; the rest are payload."""
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    s = (rows * LANES) // 2
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
            jnp.where(is_lower, up, down) for up, down in zip(ups, downs)
        ]
        self_less = jnp.zeros_like(is_lower)
        eq = jnp.ones_like(is_lower)
        for c_s, c_p in zip(cols2d[:n_order], partner[:n_order]):
            self_less = self_less | (eq & (c_s < c_p))
            eq = eq & (c_s == c_p)
        # pure i1 logic: Mosaic rejects jnp.where on boolean operands
        # ("unsupported target bitwidth for truncation")
        keep_self = (is_lower & self_less) | ~(is_lower | self_less)
        cols2d = [
            jnp.where(keep_self, c, p) for c, p in zip(cols2d, partner)
        ]
        s //= 2
    return cols2d


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret", "n_keys"))
def merge_sorted(a_cols: tuple, b_cols: tuple, tile: int = DEFAULT_TILE,
                 interpret: bool = False, n_keys: int = 1):
    """Merge two sorted runs given as tuples of equal-length 1-D columns.

    The first `n_keys` columns are msb-first uint32 sort keys (ascending,
    msb column < 0xFFFFFFFF); remaining columns are payload.  Returns merged
    columns of length M+N (must be a multiple of `tile`; tile must be a
    power of two >= 1024).
    """
    if tile < ALIGN or tile & (tile - 1):
        raise ValueError("tile must be a power of two >= 1024")
    n_cols = len(a_cols)
    m = a_cols[0].shape[0]
    n = b_cols[0].shape[0]
    total = m + n
    while tile > ALIGN and total % tile:  # shrink to a divisor of total
        tile //= 2
    if total % tile != 0:
        raise ValueError(f"total length {total} not a multiple of any "
                         f"tile >= {ALIGN}")
    t_tiles = total // tile
    win = tile + ALIGN       # aligned load window per side
    win_rows = win // LANES
    half_rows = 2 * tile // LANES
    pad_rows = half_rows - win_rows
    seq_rows = 2 * half_rows  # 4*tile elements

    a_starts, b_starts = merge_path_partition(
        tuple(a_cols[:n_keys]), tuple(b_cols[:n_keys]), tile
    )
    a_al = (a_starts[:-1] // ALIGN) * ALIGN
    b_al = (b_starts[:-1] // ALIGN) * ALIGN
    da = a_starts[:-1] - a_al
    db = b_starts[:-1] - b_al
    # da+db is 0 or ALIGN (both tile boundaries and alignments are
    # ALIGN-multiples); the kernel selects the output slice statically
    off_rows = (da + db) // LANES  # 0 or 8

    def pad_to(col, length, is_key):
        fill = jnp.full((length - col.shape[0],), MAX_KEY, jnp.uint32)
        return jnp.concatenate([col, fill.astype(col.dtype)])

    # A side: padded so any aligned window [a_al, a_al+win) is in bounds
    m_pad = ((m + win + LANES - 1) // LANES) * LANES
    a_pad = [pad_to(c, m_pad, i < n_keys) for i, c in enumerate(a_cols)]
    # B side: globally reversed.  Window for tile t loads reversed rows
    # starting at q0 = n_front + n - b_al (ALIGN-aligned since
    # n_front + n == 0 and b_al == 0 mod ALIGN); with a front fill of
    # n_front + win elements, reversed position q maps to original index
    # j = (n_front + win) + n - 1 - q, so the window covers original
    # [b_al, b_al + win) in DESCENDING order.
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # a_al_rows, brev_rows, da, db, off_rows
        grid=(t_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_cols),
        out_specs=[
            pl.BlockSpec((tile // LANES, LANES), lambda t, *_: (t, 0),
                         memory_space=pltpu.VMEM)
        ] * n_cols,
        scratch_shapes=(
            [pltpu.VMEM((win_rows, LANES), c.dtype)
             for pair in zip(a_cols, b_cols) for c in pair]
            + [pltpu.SemaphoreType.DMA((2 * n_cols,))]
        ),
    )

    def kernel(a_row_ref, brev_row_ref, da_ref, db_ref, off_ref, *refs):
        a_refs = refs[0 : 2 * n_cols : 2]
        b_refs = refs[1 : 2 * n_cols : 2]
        out_refs = refs[2 * n_cols : 3 * n_cols]
        scratch = refs[3 * n_cols : 5 * n_cols]
        sems = refs[-1]
        t = pl.program_id(0)
        ar = a_row_ref[t]
        br = brev_row_ref[t]

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
        win_pos = (
            jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (win_rows, LANES), 1)
        )
        # A window (ascending): mask below-extent elements to (0.., -1)
        a_masked = win_pos < da_t
        a_keys = [
            jnp.where(a_masked, 0, scratch[2 * i][:]) for i in range(n_keys)
        ]
        a_idx = jnp.where(a_masked, -1, (ar * LANES) + win_pos)
        # B window (descending): below-extent elements sit at the END
        b_masked = win_pos >= (win - db_t)
        b_keys = [
            jnp.where(b_masked, 0, scratch[2 * i + 1][:])
            for i in range(n_keys)
        ]
        q = br * LANES + win_pos  # position in the reversed array
        b_idx = jnp.where(
            b_masked, -1, m + ((n_front + win) + n - 1 - q)
        )

        maxpad_key = jnp.full((pad_rows, LANES), MAX_KEY, jnp.uint32)
        maxpad_idx = jnp.full((pad_rows, LANES), 2**31 - 1, jnp.int32)

        def seq(a2d, pad2d, b2d):
            return jnp.concatenate([a2d, pad2d, pad2d, b2d], axis=0)

        cols2d = [
            seq(ak, maxpad_key.astype(ak.dtype), bk)
            for ak, bk in zip(a_keys, b_keys)
        ]
        cols2d.append(seq(a_idx, maxpad_idx, b_idx))
        for i in range(n_keys, n_cols):
            pa = scratch[2 * i][:]
            pb = scratch[2 * i + 1][:]
            cols2d.append(seq(pa, maxpad_idx.astype(pa.dtype), pb))

        merged = _bitonic_merge_2d(cols2d, seq_rows, n_order=n_keys + 1)

        shifted = off_ref[t] != 0
        tr = tile // LANES
        for i in range(n_cols):
            # merged layout: keys[0:n_keys], idx, payloads
            src = merged[i] if i < n_keys else merged[i + 1]
            lo_slice = jax.lax.slice_in_dim(src, 0, tr, axis=0)
            hi_slice = jax.lax.slice_in_dim(
                src, ALIGN // LANES, ALIGN // LANES + tr, axis=0
            )
            out_refs[i][:] = jnp.where(shifted, hi_slice, lo_slice)

    # reshape inputs to row-major 2D for aligned row-sliced DMA
    inputs = []
    for a_c, b_c in zip(a_pad, b_rev):
        inputs.append(a_c.reshape(-1, LANES))
        inputs.append(b_c.reshape(-1, LANES))

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((total // LANES, LANES), c.dtype)
            for c in a_cols
        ],
        interpret=interpret,
    )(
        a_al // LANES, brev_row0 // LANES, da, db, off_rows,
        *inputs,
    )
    return tuple(o.reshape(total) for o in out)
