"""Device window extraction vs host reference."""

import collections

import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.config import BASES_PER_WORD, BatchSpec, KmerSpec
from tsxcount_tpu.io.packer import pack_reads
from tsxcount_tpu.ops.window import (
    expand_vmask,
    extract_kmers,
    intervals_to_valid,
)
from tsxcount_tpu.utils.sequence import kmers_to_strings

from tests.test_packer import naive_kmers, rand_reads


@pytest.mark.parametrize("k", [4, 14, 16, 17, 33, 63, 127])
def test_extract_matches_naive(k):
    rng = np.random.default_rng(k)
    reads = rand_reads(rng, 12, max(1, k - 3), 3 * k + 40)
    spec = KmerSpec(k)
    batch = BatchSpec(spec, capacity_words=64)
    got = collections.Counter()
    for pb in pack_reads(reads, batch):
        kmers = np.asarray(extract_kmers(jnp.asarray(pb.words), batch))
        valid = np.asarray(expand_vmask(jnp.asarray(pb.vmask), batch))
        got.update(kmers_to_strings(kmers[valid], spec))
    assert got == naive_kmers(reads, k)


def test_extract_position_order():
    # position p corresponds to row p of the output
    spec = KmerSpec(4)
    batch = BatchSpec(spec, capacity_words=2)
    reads = ["ACGTTGCA"]
    pb = next(iter(pack_reads(reads, batch)))
    kmers = np.asarray(extract_kmers(jnp.asarray(pb.words), batch))
    valid = np.asarray(expand_vmask(jnp.asarray(pb.vmask), batch))
    assert valid[:5].all() and not valid[5:].any()
    strings = kmers_to_strings(kmers[:5], spec)
    assert strings == ["ACGT", "CGTT", "GTTG", "TTGC", "TGCA"]


@pytest.mark.parametrize("k", [1, 4, 5, 14, 31, 63])
def test_intervals_to_valid_matches_dense(k):
    # the on-device interval expansion must agree with the dense bitmask
    # for real packed batches, including N holes and read splits
    rng = np.random.default_rng(100 + k)
    reads = rand_reads(rng, 25, max(1, k - 2), 4 * k + 50, alphabet="ACGTN")
    batch = BatchSpec(KmerSpec(k), capacity_words=32)
    n_batches = 0
    for pb in pack_reads(reads, batch):
        dense = np.asarray(expand_vmask(jnp.asarray(pb.vmask), batch))
        from_iv = np.asarray(
            intervals_to_valid(jnp.asarray(pb.buf[batch.total_words :]),
                               batch)
        )
        np.testing.assert_array_equal(from_iv, dense)
        assert int(from_iv.sum()) == pb.n_valid
        n_batches += 1
    assert n_batches > 0


def test_top_lane_masked():
    spec = KmerSpec(14)  # 28 bits used of lane 0
    batch = BatchSpec(spec, capacity_words=4)
    pb = next(iter(pack_reads(["T" * 40], batch)))
    kmers = np.asarray(extract_kmers(jnp.asarray(pb.words), batch))
    assert (kmers >> 28 == 0).all()
