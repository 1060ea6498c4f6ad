"""LaneMixBijection (ops/mix.py) — the r4 ARX replacement for the GF(2)
hash in the hash-first path: bijectivity across lane widths, host/device
agreement, prefix quality, and counter exactness via hash_first='mix'."""

import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.config import KmerSpec
from tsxcount_tpu.core.counter import KmerCounter
from tsxcount_tpu.ops.mix import LaneMixBijection

from tests.test_mix import _reads, naive_kmers


@pytest.mark.parametrize("k", [7, 14, 16, 31, 32, 63, 127, 200])
def test_bijection_roundtrip_and_space(k):
    spec = KmerSpec(k)
    bij = LaneMixBijection(spec)
    rng = np.random.default_rng(k)
    keys = rng.integers(0, 2**32, size=(1024, spec.lanes), dtype=np.uint32)
    keys[:, -1] &= np.uint32(spec.top_lane_mask)
    img = bij.apply_host(keys)
    # the image stays inside the 2k-bit key space (top lane masked)
    assert (img[:, -1] & ~np.uint32(spec.top_lane_mask)).max() == 0
    np.testing.assert_array_equal(bij.inv_apply_host(img), keys)
    # device matches host, both directions
    np.testing.assert_array_equal(
        np.asarray(bij.apply(jnp.asarray(keys))), img
    )
    np.testing.assert_array_equal(
        np.asarray(bij.inv_apply(jnp.asarray(img))), keys
    )


def test_apply_cols_matches_apply():
    spec = KmerSpec(63)
    bij = LaneMixBijection(spec)
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 2**32, size=(512, spec.lanes), dtype=np.uint32)
    keys[:, -1] &= np.uint32(spec.top_lane_mask)
    cols = bij.apply_cols([jnp.asarray(keys[:, j])
                           for j in range(spec.lanes)])
    np.testing.assert_array_equal(
        np.stack([np.asarray(c) for c in cols], axis=1),
        bij.apply_host(keys),
    )


def test_prefix_uniformity_on_sequential_keys():
    """Adjacent k-mer windows are near-sequential bit patterns; the image
    top lanes (the sort prefix / shard owner bits) must still spread."""
    spec = KmerSpec(63)
    bij = LaneMixBijection(spec)
    keys = np.zeros((4096, spec.lanes), np.uint32)
    keys[:, 0] = np.arange(4096)  # vary ONLY the least-significant lane
    img = bij.apply_host(keys)
    top64 = (img[:, -1].astype(np.uint64) << np.uint64(32)) | img[:, -2]
    assert len(set(top64.tolist())) == 4096  # no prefix collisions
    b = np.bincount(img[:, -1] >> np.uint32(spec.top_lane_bits - 4),
                    minlength=16)
    assert b.max() < 2.5 * 4096 / 16


@pytest.mark.parametrize("k", [31, 127])
def test_counter_hash_first_mix_matches_naive(k):
    reads = _reads(n=20)
    c = KmerCounter(k=k, l=14, batch_words=64, hash_first="mix")
    assert c.hash_first == "mix"
    c.add_reads(reads)
    c.finish()
    want = naive_kmers(reads, k)
    assert c.to_dict() == want
    qs = list(want)[:30]
    assert c.get_counts(qs) == [want[q] for q in qs]


def test_hash_first_true_aliases_mix_and_gf2_still_works():
    reads = _reads(n=10)
    want = naive_kmers(reads, 63)
    c_true = KmerCounter(k=63, l=13, batch_words=64, hash_first=True)
    assert c_true.hash_first == "mix"
    c_gf2 = KmerCounter(k=63, l=13, batch_words=64, hash_first="gf2")
    assert c_gf2.hash_first == "gf2"
    for c in (c_true, c_gf2):
        c.add_reads(reads)
        c.finish()
        assert c.to_dict() == want


def test_mix_checkpoint_roundtrip(tmp_path):
    from tsxcount_tpu.core.checkpoint import load_counter, save_counter

    reads = _reads(n=10)
    c = KmerCounter(k=63, l=13, batch_words=64, hash_first="mix")
    c.add_reads(reads)
    c.finish()
    path = tmp_path / "m.npz"
    save_counter(c, path)
    r = load_counter(path, batch_words=64)
    assert r.hash_first == "mix"
    assert r.to_dict() == naive_kmers(reads, 63)
