"""Host-side read packer: sequences -> fixed-shape device batches.

Replaces the reference's per-kmer string materialization
(`createKMers` sliding window, reference src/mains/testExecution.h:15-36, and
`fromSequence` per-kmer bit packing, src/utils/SequenceUtils.h:86-160) with a
batched layout the TPU can window-extract without gathers:

  * bases are 2-bit packed into uint32 words, 16 bases/word, LSB-first;
  * every read starts on a word boundary (fresh uint32);
  * a validity *bitmask* marks which window start positions yield a real
    k-mer: bit p%32 of `vmask[p//32]` covers position p.  A position is valid
    iff the window [p, p+k) lies inside one read and (drop policy) contains
    no N.  Reads shorter than k are skipped, matching the reference
    (testExecution.h:18-19);
  * reads longer than the remaining batch capacity are split with a k-1 base
    overlap so no window is lost or duplicated at the seam.

N handling is policy-driven: "drop" (default — the deliberate design) or
"random" (reference bug-compat: the reference substitutes random bits,
SequenceUtils.h:126-137, which makes counts nondeterministic).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator

import numpy as np

from tsxcount_tpu.config import BASES_PER_WORD, BatchSpec
from tsxcount_tpu.utils.sequence import encode_bases

N_POLICIES = ("drop", "random")


@dataclasses.dataclass
class PackedBatch:
    """One fixed-shape device batch."""

    words: np.ndarray          # uint32 [total_words]; last pad_words are zero
    vmask: np.ndarray          # uint32 [vmask_words]; bit p%32 of word p//32 = pos p valid
    n_valid: int               # number of valid window positions
    n_bases: int               # bases packed into this batch (incl. overlaps)


@dataclasses.dataclass
class PackStats:
    reads: int = 0
    reads_skipped: int = 0     # len < k (reference testExecution.h:18-19)
    bases: int = 0
    n_bases: int = 0           # non-ACGT bases seen
    windows: int = 0           # valid window positions emitted
    batches: int = 0


class ReadPacker:
    """Streaming packer producing PackedBatch objects of a fixed BatchSpec."""

    def __init__(self, batch: BatchSpec, n_policy: str = "drop", seed: int = 0):
        if n_policy not in N_POLICIES:
            raise ValueError(f"n_policy must be one of {N_POLICIES}")
        self.batch = batch
        self.spec = batch.spec
        self.n_policy = n_policy
        self.rng = np.random.default_rng(seed)
        self.stats = PackStats()
        self._reset()

    def _reset(self) -> None:
        b = self.batch
        self._words = np.zeros(b.total_words, dtype=np.uint32)
        self._vmask = np.zeros(b.vmask_words, dtype=np.uint32)
        self._cur_word = 0
        self._n_valid = 0
        self._n_bases = 0

    def _flush(self) -> PackedBatch:
        out = PackedBatch(
            words=self._words,
            vmask=self._vmask,
            n_valid=self._n_valid,
            n_bases=self._n_bases,
        )
        self.stats.batches += 1
        self._reset()
        return out

    def _place_segment(self, codes: np.ndarray, invalid: np.ndarray,
                       start: int, seg_len: int) -> None:
        """Pack codes[start:start+seg_len] at the current word boundary and
        mark valid window positions fully contained in the segment."""
        k = self.spec.k
        w0 = self._cur_word
        seg = codes[start : start + seg_len].astype(np.uint32)
        seg_words = (seg_len + BASES_PER_WORD - 1) // BASES_PER_WORD
        padded = np.zeros(seg_words * BASES_PER_WORD, dtype=np.uint32)
        padded[:seg_len] = seg
        lanes = padded.reshape(seg_words, BASES_PER_WORD)
        shifts = (2 * np.arange(BASES_PER_WORD, dtype=np.uint32))[None, :]
        self._words[w0 : w0 + seg_words] = np.bitwise_or.reduce(
            lanes << shifts, axis=1
        )

        # window validity: start i in [0, seg_len-k], no invalid base inside
        inv = invalid[start : start + seg_len]
        n_win = seg_len - k + 1
        if inv.any():
            cs = np.zeros(seg_len + 1, dtype=np.int64)
            np.cumsum(inv, out=cs[1:])
            ok = (cs[k : k + n_win] - cs[:n_win]) == 0
            idx = np.nonzero(ok)[0].astype(np.int64)
        else:
            idx = np.arange(n_win, dtype=np.int64)
        if idx.size:
            gpos = w0 * BASES_PER_WORD + idx  # global window position
            np.bitwise_or.at(
                self._vmask,
                gpos >> 5,
                (np.uint32(1) << (gpos & 31).astype(np.uint32)),
            )
        self._n_valid += int(idx.size)
        self.stats.windows += int(idx.size)
        self._n_bases += seg_len
        self._cur_word += seg_words

    def feed(self, seq: str | bytes) -> Iterator[PackedBatch]:
        """Pack one read; yield any batches that filled up along the way."""
        k = self.spec.k
        codes, invalid = encode_bases(seq)
        n = len(codes)
        self.stats.reads += 1
        self.stats.bases += n
        n_invalid = int(invalid.sum())
        self.stats.n_bases += n_invalid
        if n < k:
            self.stats.reads_skipped += 1
            return
        if n_invalid and self.n_policy == "random":
            # reference bug-compat: N -> random base (SequenceUtils.h:126-137)
            codes = np.where(
                invalid, self.rng.integers(0, 4, size=n, dtype=np.uint8), codes
            )
            invalid = np.zeros_like(invalid)

        start = 0
        cap = self.batch.capacity_words
        while n - start >= k:
            avail_bases = (cap - self._cur_word) * BASES_PER_WORD
            if avail_bases < k:
                yield self._flush()
                continue
            seg_len = min(n - start, avail_bases)
            self._place_segment(codes, invalid, start, seg_len)
            if start + seg_len >= n:
                break
            start = start + seg_len - (k - 1)
        if self._cur_word >= cap:
            yield self._flush()

    def finish(self) -> Iterator[PackedBatch]:
        """Yield the final partial batch, if any."""
        if self._cur_word > 0 or self._n_valid > 0:
            yield self._flush()


def pack_reads(
    reads: Iterable[str | bytes],
    batch: BatchSpec,
    n_policy: str = "drop",
    seed: int = 0,
) -> Iterator[PackedBatch]:
    """Convenience: pack an iterable of sequences into batches."""
    packer = ReadPacker(batch, n_policy=n_policy, seed=seed)
    for seq in reads:
        yield from packer.feed(seq)
    yield from packer.finish()
