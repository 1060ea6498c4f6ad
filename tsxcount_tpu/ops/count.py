"""Sort + segmented-sum exact counting primitives.

This is the TPU replacement for the reference's entire concurrency story:
instead of serializing concurrent increments on a shared bit-packed table
(TSX transactions / CAS / locks — reference src/tsxcount/TSXHashMapTSXPerf.h,
TSXHashMapCAS.h etc.), occurrences of equal k-mers are brought together by a
lexicographic multi-lane sort and reduced with a conflict-free segmented sum.
Exact, deterministic, no contention by construction.

Key ordering: uint32 lanes little-endian (lane 0 least significant); the sort
is keyed on (invalid_flag, lane_{L-1}, ..., lane_0) so invalid windows sink to
the end and can never collide with the all-ones poly-T k-mer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tsxcount_tpu.config import COUNT_DIGIT_BITS, COUNT_DIGIT_MASK, COUNT_DIGITS


class UniqueCounts(NamedTuple):
    """Compacted unique-key histogram of one batch (fixed shape).

    Entries [0, n_unique) are real and ascending; the tail is garbage
    (marked by valid=False).
    """

    keys: jax.Array     # uint32 [P, lanes], sorted ascending where valid
    counts: jax.Array   # int32  [P]
    valid: jax.Array    # bool   [P]
    n_unique: jax.Array # int32  scalar


def sort_by_keys(invalid: jax.Array, keys: jax.Array, *payload: jax.Array):
    """Lexicographic sort by (invalid, key lanes msb..lsb); payloads ride along.

    Returns (invalid_sorted, keys_sorted, *payload_sorted).
    """
    lanes = keys.shape[1]
    ops = (invalid.astype(jnp.uint32),) + tuple(
        keys[:, j] for j in reversed(range(lanes))
    ) + tuple(payload)
    out = jax.lax.sort(ops, num_keys=1 + lanes)
    inv_s = out[0]
    keys_s = jnp.stack(tuple(reversed(out[1 : 1 + lanes])), axis=1)
    return (inv_s, keys_s) + tuple(out[1 + lanes :])


def segment_ids(inv_s: jax.Array, keys_s: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Segment ids for a sorted key stream; returns (seg, new_flag int32)."""
    neq = jnp.any(keys_s[1:] != keys_s[:-1], axis=1) | (inv_s[1:] != inv_s[:-1])
    flag = jnp.concatenate([jnp.ones((1,), jnp.int32), neq.astype(jnp.int32)])
    seg = jnp.cumsum(flag) - 1
    return seg, flag


def count_unique(kmers: jax.Array, valid: jax.Array,
                 weights: jax.Array | None = None) -> UniqueCounts:
    """Exact histogram of the valid rows of `kmers`.

    weights: optional int32 per-row multiplicities (default 1).
    """
    p, lanes = kmers.shape
    inv = (~valid).astype(jnp.uint32)
    w = jnp.ones((p,), jnp.int32) if weights is None else weights.astype(jnp.int32)
    inv_s, keys_s, w_s = sort_by_keys(inv, kmers, w)
    seg, flag = segment_ids(inv_s, keys_s)
    is_valid = inv_s == 0
    counts = jnp.zeros((p,), jnp.int32).at[seg].add(jnp.where(is_valid, w_s, 0))
    ukeys = jnp.zeros((p, lanes), jnp.uint32).at[seg].set(keys_s)
    n_unique = jnp.sum(flag * is_valid.astype(jnp.int32))
    uvalid = jnp.arange(p, dtype=jnp.int32) < n_unique
    return UniqueCounts(keys=ukeys, counts=counts, valid=uvalid, n_unique=n_unique)


def renorm_digits(d: jax.Array) -> jax.Array:
    """Propagate carries through base-2^20 digit lanes (int32 [..., 3]).

    The analog of the reference's overflow-chain carry walk
    (`handleOverflow`, reference src/tsxcount/TSXHashMap.h:1501-1623), as a
    pure vector op.
    """
    d0, d1, d2 = d[..., 0], d[..., 1], d[..., 2]
    c0 = d0 >> COUNT_DIGIT_BITS
    d0 = d0 & COUNT_DIGIT_MASK
    d1 = d1 + c0
    c1 = d1 >> COUNT_DIGIT_BITS
    d1 = d1 & COUNT_DIGIT_MASK
    d2 = d2 + c1
    return jnp.stack([d0, d1, d2], axis=-1)


def int32_to_digits(c: jax.Array) -> jax.Array:
    """int32 counts [...,] -> digit triple [..., 3] (c must be >= 0)."""
    d0 = c & COUNT_DIGIT_MASK
    d1 = (c >> COUNT_DIGIT_BITS) & COUNT_DIGIT_MASK
    d2 = jnp.zeros_like(c)
    return jnp.stack([d0, d1, d2], axis=-1)


assert COUNT_DIGITS == 3, "digit helpers assume 3 lanes"
