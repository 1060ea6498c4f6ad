"""Per-shard LSM cascade exactness (sharded counter, sort backend).

The sharded counter's LSM mirrors the single-chip store's cascade
(core/lsm.py): batch flushes land in a small L0 per shard and absorb
geometrically upward.  Counts must be identical to the flat per-shard
store, reads must collapse correctly mid-stream, and checkpoints must
round-trip through the collapsed top level.
"""

import numpy as np
import pytest

from tsxcount_tpu.parallel.sharded import ShardedKmerCounter

from tests.test_packer import naive_kmers, rand_reads

K = 9
KW = dict(
    k=K, n_shards=2, l=16, batch_words=64, merge_every=1,
    capacity_factor=1.0, lsm_growth=4,
)


def _reads():
    return rand_reads(np.random.default_rng(21), 40, 60, 400)


def test_sharded_lsm_engages_and_counts_exact():
    counter = ShardedKmerCounter(lsm=True, **KW)
    assert counter.lsm, "LSM should engage at this geometry"
    assert len(counter._lsm_stores) >= 3  # a real cascade, not just L0+top
    reads = _reads()
    counter.add_reads(reads)
    counter.finish()
    flat = ShardedKmerCounter(lsm=False, **KW)
    assert not flat.lsm
    flat.add_reads(reads)
    flat.finish()
    want = dict(naive_kmers(reads, K))
    assert counter.to_dict() == want
    assert flat.to_dict() == want
    assert counter.distinct == flat.distinct == len(want)


def test_sharded_lsm_auto_engage_rule():
    # same geometry, lsm=None -> the auto rule should engage it
    counter = ShardedKmerCounter(lsm=None, **KW)
    assert counter.lsm


def test_sharded_lsm_mid_stream_reads_and_resume(tmp_path):
    from tsxcount_tpu.core.checkpoint import load_counter, save_counter

    reads = _reads()
    counter = ShardedKmerCounter(lsm=True, **KW)
    counter.add_reads(reads[:20])
    # mid-stream read forces a collapse; ingest must continue correctly
    mid = counter.get_counts([reads[0][:K]])[0]
    assert mid >= 1
    counter.add_reads(reads[20:])
    counter.finish()
    want = dict(naive_kmers(reads, K))
    assert counter.to_dict() == want

    path = tmp_path / "lsm.npz"
    save_counter(counter, path)
    resumed = load_counter(path, batch_words=64)
    assert resumed.to_dict() == want


@pytest.mark.parametrize("canonical", [False, True])
def test_sharded_lsm_reset_reuse(canonical):
    reads = _reads()
    counter = ShardedKmerCounter(lsm=True, canonical=canonical, **KW)
    counter.add_reads(reads)
    counter.finish()
    first = counter.to_dict()
    counter.reset()
    counter.add_reads(reads)
    counter.finish()
    assert counter.to_dict() == first
