"""Device window extraction vs host reference."""

import collections

import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.config import BASES_PER_WORD, BatchSpec, KmerSpec
from tsxcount_tpu.io.packer import pack_reads
from tsxcount_tpu.ops.window import expand_vmask, extract_kmers
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


def test_top_lane_masked():
    spec = KmerSpec(14)  # 28 bits used of lane 0
    batch = BatchSpec(spec, capacity_words=4)
    pb = next(iter(pack_reads(["T" * 40], batch)))
    kmers = np.asarray(extract_kmers(jnp.asarray(pb.words), batch))
    assert (kmers >> 28 == 0).all()
