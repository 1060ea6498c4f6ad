"""Checkpoint save/resume tests."""

import numpy as np
import pytest

from tsxcount_tpu.core.checkpoint import load_counter, save_counter
from tsxcount_tpu.core.counter import KmerCounter

from tests.test_packer import naive_kmers, rand_reads


@pytest.mark.parametrize("backend", ["sort", "table"])
def test_save_load_roundtrip(tmp_path, backend):
    rng = np.random.default_rng(3)
    reads = rand_reads(rng, 30, 10, 90)
    counter = KmerCounter(k=9, l=13, backend=backend, batch_words=32)
    counter.add_reads(reads)
    counter.finish()
    ckpt = tmp_path / "state.npz"
    save_counter(counter, ckpt)

    restored = load_counter(ckpt, batch_words=32)
    assert restored.to_dict() == counter.to_dict()
    assert restored.total_kmers == counter.total_kmers


@pytest.mark.parametrize("backend", ["sort", "table"])
def test_sharded_save_load_roundtrip(tmp_path, backend):
    from tsxcount_tpu.parallel.sharded import ShardedKmerCounter

    rng = np.random.default_rng(7)
    reads = rand_reads(rng, 30, 10, 90)
    counter = ShardedKmerCounter(
        k=9, n_shards=4, l=13, backend=backend, batch_words=32
    )
    counter.add_reads(reads)
    counter.finish()
    ckpt = tmp_path / "sharded.npz"
    save_counter(counter, ckpt)

    restored = load_counter(ckpt, batch_words=32)
    assert restored.n_shards == 4
    assert restored.to_dict() == counter.to_dict()
    assert restored.total_kmers == counter.total_kmers


def test_sharded_resume_counting_after_load(tmp_path):
    from tsxcount_tpu.parallel.sharded import ShardedKmerCounter

    rng = np.random.default_rng(8)
    reads_a = rand_reads(rng, 20, 10, 60)
    reads_b = rand_reads(rng, 20, 10, 60)
    counter = ShardedKmerCounter(k=7, n_shards=2, l=13, batch_words=32)
    counter.add_reads(reads_a)
    counter.finish()
    save_counter(counter, tmp_path / "s.npz")

    restored = load_counter(tmp_path / "s.npz", batch_words=32)
    restored.add_reads(reads_b)
    restored.finish()
    assert restored.to_dict() == dict(naive_kmers(reads_a + reads_b, 7))


def test_resume_counting_after_load(tmp_path):
    rng = np.random.default_rng(4)
    reads_a = rand_reads(rng, 20, 10, 60)
    reads_b = rand_reads(rng, 20, 10, 60)
    counter = KmerCounter(k=7, l=13, batch_words=32)
    counter.add_reads(reads_a)
    counter.finish()
    save_counter(counter, tmp_path / "a.npz")

    restored = load_counter(tmp_path / "a.npz", batch_words=32)
    restored.add_reads(reads_b)
    restored.finish()
    assert restored.to_dict() == dict(naive_kmers(reads_a + reads_b, 7))
