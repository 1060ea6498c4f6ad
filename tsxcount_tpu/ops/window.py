"""Batched k-mer window extraction on device.

The reference materializes every window as a std::string and re-packs it bit
by bit (`createKMers` reference src/mains/testExecution.h:15-36 +
`fromSequence` src/utils/SequenceUtils.h:86-160) — a per-kmer scalar loop.
The TPU formulation is a *shift network* with zero gathers:

With bases packed 16-per-uint32 LSB-first and positions p = 16q + s
(s in 0..15), lane j of the window starting at p is bits
[32(q+j) + 2s, 32(q+j+1) + 2s) of the base stream, i.e.

    lane_j(p) = (words[q+j] >> 2s) | (words[q+j+1] << (32-2s))

There are only 16 distinct shifts, so we precompute 16 shifted streams and
every k-mer lane is a contiguous slice — pure VPU work that XLA fuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsxcount_tpu.config import BASES_PER_WORD, BatchSpec


def extract_kmers(words: jax.Array, batch: BatchSpec) -> jax.Array:
    """words: uint32[total_words] -> kmers uint32[positions, lanes].

    Row p holds the window starting at base position p (p = 16q + s ordering
    is plain position order).  Invalid positions produce garbage rows; the
    caller masks them with the packer's validity bitmask (expand_vmask).
    """
    spec = batch.spec
    lanes = spec.lanes
    q_words = batch.capacity_words

    w0 = words[:-1]
    w1 = words[1:]
    # shifts 0,2,...,30; express `<< (32-2s)` as `<< (31-2s) << 1` so every
    # single shift amount stays < 32 (shift-by-32 is undefined).
    sh = (2 * jnp.arange(BASES_PER_WORD, dtype=jnp.uint32))[:, None]
    streams = (w0[None, :] >> sh) | ((w1[None, :] << (31 - sh)) << jnp.uint32(1))

    # lane j of position 16q+s = streams[s, q+j]
    per_lane = [
        jax.lax.slice_in_dim(streams, j, j + q_words, axis=1)
        for j in range(lanes)
    ]
    kmers = jnp.stack(per_lane, axis=-1)          # (16, Q, lanes)
    kmers = kmers.transpose(1, 0, 2).reshape(batch.positions, lanes)
    if spec.top_lane_bits < 32:
        mask = jnp.uint32(spec.top_lane_mask)
        kmers = kmers.at[:, lanes - 1].set(kmers[:, lanes - 1] & mask)
    return kmers


def expand_vmask(vmask: jax.Array, batch: BatchSpec) -> jax.Array:
    """vmask uint32[vmask_words] -> bool[positions]: bit p%32 of word p//32
    marks window position p valid (dense: 32 positions per uint32)."""
    sh = jnp.arange(32, dtype=jnp.uint32)[None, :]
    bits = (vmask[:, None] >> sh) & jnp.uint32(1)
    return bits.reshape(batch.positions).astype(jnp.bool_)
