"""Pallas TPU kernel: merge two SORTED runs in one linear pass.

The store merge combines runs that are already sorted (the store's key
prefix and each batch's deduped histogram), but `jax.lax.sort` cannot
exploit that and pays O(n log^2 n) compare-exchange passes (~80 ms per 16.7M
x 2 operands on v5e, tools/microbench.py).  This kernel is the classic
GPU-style merge, TPU-ified:

  * merge-path partitioning (computed OUTSIDE the kernel with a vectorized
    binary search — tiny) gives each grid tile an independent, exactly-C
    slice of the output;
  * each tile DMAs a fixed C-window of each input (merge-path guarantees
    every element beyond a tile's true extent is >= all tile elements, so no
    masking is needed), concatenates A with reversed(B) into a bitonic
    sequence, and runs a log2(2C)-stage bitonic merger on the VPU;
  * ties are broken by a global index column (A before B), making the
    compare total and the merge stable — so duplicate keys keep their
    payloads intact across tile boundaries;
  * the C smallest of the 2C merged elements ARE the output tile.

Keys are single uint32 (covers the packed flag|kmer key for k <= 15; wider
keys fall back to lax.sort).  An arbitrary number of int32/uint32 payload
columns ride along through the compare-exchange network.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = 1 << 14  # C: output elements per grid step


def merge_path_partition(a_keys: jax.Array, b_keys: jax.Array,
                         tile: int) -> tuple[jax.Array, jax.Array]:
    """Per-tile split points (a_starts, b_starts), each int32 [T+1].

    a_starts[t] = number of A elements among the first t*tile merged
    elements, under the stable order (A wins ties).  Vectorized binary
    search on the cross-diagonal; O(T log(M+N)) — negligible.
    """
    m = a_keys.shape[0]
    n = b_keys.shape[0]
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
        a_val = a_keys[jnp.clip(mid, 0, m - 1)]
        b_val = b_keys[jnp.clip(diag - 1 - mid, 0, n - 1)]
        take_a = a_val <= b_val  # stable: equal keys -> A first
        lo = jnp.where(active & take_a, mid + 1, lo)
        hi = jnp.where(active & ~take_a, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo, diag - lo


def _bitonic_merge(cols: list[jax.Array], c2: int) -> list[jax.Array]:
    """Bitonic merger over a (c2,)-bitonic sequence; cols[0:2]=(key, idx)
    define the total order, remaining cols are payload."""
    s = c2 // 2
    while s >= 1:
        split = [col.reshape(c2 // (2 * s), 2, s) for col in cols]
        lo = [col[:, 0, :] for col in split]
        hi = [col[:, 1, :] for col in split]
        swap = (lo[0] > hi[0]) | ((lo[0] == hi[0]) & (lo[1] > hi[1]))
        new_cols = []
        for lo_c, hi_c in zip(lo, hi):
            nlo = jnp.where(swap, hi_c, lo_c)
            nhi = jnp.where(swap, lo_c, hi_c)
            new_cols.append(
                jnp.stack([nlo, nhi], axis=1).reshape(c2)
            )
        cols = new_cols
        s //= 2
    return cols


def _merge_kernel(a_start_ref, b_start_ref, a_refs, b_refs, out_refs,
                  scratch_refs, sems, *, tile: int, n_cols: int, m: int):
    t = pl.program_id(0)
    a0 = a_start_ref[t]
    b0 = b_start_ref[t]

    # DMA fixed C-windows of every column of both inputs into VMEM
    dmas = []
    for i in range(n_cols):
        dmas.append(pltpu.make_async_copy(
            a_refs[i].at[pl.ds(a0, tile)], scratch_refs[2 * i],
            sems.at[2 * i],
        ))
        dmas.append(pltpu.make_async_copy(
            b_refs[i].at[pl.ds(b0, tile)], scratch_refs[2 * i + 1],
            sems.at[2 * i + 1],
        ))
    for dma in dmas:
        dma.start()
    for dma in dmas:
        dma.wait()

    c2 = 2 * tile
    # global tiebreak index: A rows = global position, B rows = m + position
    pos = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0).reshape(tile)
    a_idx = a0 + pos
    b_idx = m + b0 + pos

    cols = []
    key_a = scratch_refs[0][:].reshape(tile)
    key_b = scratch_refs[1][:].reshape(tile)
    cols.append(jnp.concatenate([key_a, key_b[::-1]]))
    cols.append(jnp.concatenate([a_idx, b_idx[::-1]]))
    for i in range(1, n_cols):
        pay_a = scratch_refs[2 * i][:].reshape(tile)
        pay_b = scratch_refs[2 * i + 1][:].reshape(tile)
        cols.append(jnp.concatenate([pay_a, pay_b[::-1]]))

    merged = _bitonic_merge(cols, c2)
    out_refs[0][:] = merged[0][:tile].reshape(out_refs[0].shape)
    for i in range(1, n_cols):
        out_refs[i][:] = merged[2 + i - 1][:tile].reshape(out_refs[i].shape)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def merge_sorted(a_cols: tuple, b_cols: tuple, tile: int = DEFAULT_TILE,
                 interpret: bool = False):
    """Merge two sorted runs given as tuples of equal-length columns.

    a_cols[0]/b_cols[0] are the uint32 sort keys (ascending); remaining
    columns are payloads.  Returns merged columns of length M+N.
    Total length must be a multiple of `tile`.
    """
    n_cols = len(a_cols)
    m = a_cols[0].shape[0]
    n = b_cols[0].shape[0]
    total = m + n
    if total % tile != 0:
        raise ValueError(f"total length {total} not a multiple of {tile}")
    t_tiles = total // tile
    a_starts, b_starts = merge_path_partition(a_cols[0], b_cols[0], tile)

    # pad inputs so fixed C-windows never read out of bounds; KEY padding
    # must be the maximum value so overruns sort after every real element
    # (keys must therefore be < 0xFFFFFFFF; the packed flag|kmer keys are)
    def pad(col, is_key):
        fill = jnp.full(
            (tile,),
            0xFFFFFFFF if is_key else 0,
            col.dtype if not is_key else jnp.uint32,
        ).astype(col.dtype)
        return jnp.concatenate([col, fill])

    a_pad = [pad(c, i == 0) for i, c in enumerate(a_cols)]
    b_pad = [pad(c, i == 0) for i, c in enumerate(b_cols)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * n_cols),
        out_specs=[
            pl.BlockSpec((tile,), lambda t, *_: (t,),
                         memory_space=pltpu.VMEM)
        ] * n_cols,
        scratch_shapes=(
            [pltpu.VMEM((tile,), c.dtype) for pair in zip(a_cols, b_cols)
             for c in pair]
            + [pltpu.SemaphoreType.DMA((2 * n_cols,))]
        ),
    )

    def kernel(a_start_ref, b_start_ref, *refs):
        a_refs = refs[0 : 2 * n_cols : 2]
        b_refs = refs[1 : 2 * n_cols : 2]
        out_refs = refs[2 * n_cols : 3 * n_cols]
        scratch = refs[3 * n_cols : 3 * n_cols + 2 * n_cols]
        sems = refs[-1]
        _merge_kernel(a_start_ref, b_start_ref, a_refs, b_refs, out_refs,
                      scratch, sems, tile=tile, n_cols=n_cols, m=m)

    inputs = []
    for a_c, b_c in zip(a_pad, b_pad):
        inputs.extend([a_c, b_c])
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((total,), c.dtype) for c in a_cols
        ],
        interpret=interpret,
    )(a_starts, b_starts, *inputs)
    return tuple(out)
