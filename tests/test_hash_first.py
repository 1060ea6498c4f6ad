"""Hash-first dedupe (single-chip): store holds hashed keys, dedupe sorts
a 64-bit uniform prefix with payload lanes (ops/count.py
_sort_uniform_prefix), exports inverse-map — mirroring the sharded path.
Auto-engages at lanes >= 4 (k >= 49)."""

import numpy as np
import pytest

from tsxcount_tpu.core.counter import KmerCounter

from tests.test_packer import naive_kmers, rand_reads


def _reads():
    return rand_reads(np.random.default_rng(5), 20, 80, 300)


@pytest.mark.parametrize("k,forced", [(63, True), (127, True), (14, True)])
def test_hash_first_counts_exact(k, forced):
    reads = _reads()
    counter = KmerCounter(k=k, l=14, batch_words=64, hash_first=forced)
    assert counter.hash_first
    counter.add_reads(reads)
    counter.finish()
    want = dict(naive_kmers(reads, k))
    assert counter.to_dict() == want
    some = list(want)[:25] + ["A" * k]
    assert counter.get_counts(some) == [want.get(x, 0) for x in some]


def test_hash_first_auto_rule():
    # r4 measured auto rule: "mix" hash-first engages from 8 lanes up
    # (k=127: +11%) and stays off below (k=63: slight loss)
    assert not KmerCounter(k=31, l=10, batch_words=64).hash_first
    assert not KmerCounter(k=63, l=10, batch_words=64).hash_first
    assert KmerCounter(k=127, l=10, batch_words=64).hash_first == "mix"
    assert not KmerCounter(
        k=127, l=10, batch_words=64, hash_first=False
    ).hash_first
    # identity GF(2) is not uniform -> gf2 mode refuses; the r4 ARX mix
    # bijection is independent of the GF(2) matrix, so True (= "mix")
    # still engages under identity_hash
    assert not KmerCounter(
        k=63, l=10, batch_words=64, identity_hash=True, hash_first="gf2"
    ).hash_first
    assert KmerCounter(
        k=63, l=10, batch_words=64, identity_hash=True, hash_first=True
    ).hash_first == "mix"
    # table backend stores slot encodings, not sorted keys
    assert not KmerCounter(
        k=63, l=14, batch_words=64, backend="table", hash_first=True
    ).hash_first


def test_hash_first_checkpoint_roundtrip(tmp_path):
    from tsxcount_tpu.core.checkpoint import load_counter, save_counter

    reads = _reads()
    counter = KmerCounter(k=63, l=14, batch_words=64, hash_first=True)
    counter.add_reads(reads)
    counter.finish()
    path = tmp_path / "hf.npz"
    save_counter(counter, path)
    resumed = load_counter(path, batch_words=64)
    assert resumed.hash_first
    assert resumed.to_dict() == dict(naive_kmers(reads, 63))


def test_hash_first_canonical_and_collapse():
    reads = [r + "A" * 40 for r in _reads()]
    counter = KmerCounter(k=9, l=14, batch_words=64, hash_first=True,
                          canonical=True, collapse_homopolymers=True)
    ref = KmerCounter(k=9, l=14, batch_words=64, hash_first=False,
                      canonical=True, collapse_homopolymers=True)
    for c in (counter, ref):
        c.add_reads(reads)
        c.finish()
    assert sum(counter.packer.stats.hp_bonus) > 0
    assert counter.to_dict() == ref.to_dict()


def test_uniform_prefix_nk_covers_64_bits():
    # ADVICE r4 high/medium: the comparator must always span >= 64
    # uniform bits.  Narrow top lanes (k=113: 2 bits) previously got
    # nk=2 = a 34-bit prefix that collides at production batch sizes.
    from tsxcount_tpu.config import KmerSpec
    from tsxcount_tpu.ops.count import uniform_prefix_nk

    for k in (31, 33, 63, 65, 97, 113, 117, 121, 127, 224):
        spec = KmerSpec(k)
        nk = uniform_prefix_nk(spec)
        key_bits_top = spec.top_lane_bits if spec.top_lane_bits < 32 else 0
        assert key_bits_top + 32 * (nk - 1) >= 64, (k, nk)


def test_narrow_top_lane_prefix_no_false_collision():
    # k=113 -> 8 lanes, 2-bit top lane.  With the r4 nk=2 rule the sort
    # prefix spanned only 34 bits: construct two DISTINCT keys whose mix
    # images agree on the top 34+ bits but differ in lane 5 (outside the
    # old comparator, inside the fixed one) -- previously flagged as a
    # collision (double-ingest / PrefixCollision); now sorted exactly.
    import jax.numpy as jnp

    from tsxcount_tpu.config import KmerSpec
    from tsxcount_tpu.ops.count import count_unique
    from tsxcount_tpu.ops.mix import LaneMixBijection

    spec = KmerSpec(113)
    mix = LaneMixBijection(spec)
    img = np.zeros((2, 8), np.uint32)
    img[:, 7] = 1          # top lane equal (within 2-bit mask)
    img[:, 6] = 0xDEADBEEF # next 32 bits equal
    img[0, 5] = 1          # differs below the old 34-bit prefix
    img[1, 5] = 2
    img[:, 0] = 7
    raw = mix.inv_apply_host(img)
    assert not np.array_equal(raw[0], raw[1])
    hashed = mix.apply(jnp.asarray(raw))
    np.testing.assert_array_equal(np.asarray(hashed), img)
    uc = count_unique(
        hashed, jnp.ones((2,), bool), spec=spec,
        uniform_prefix=True, collide_mode="flag",
    )
    assert not bool(uc.collided)
    assert int(uc.n_unique) == 2


def test_k113_hash_first_bulk_exact():
    # statistical guard: ~64k random keys at k=113 through the mix-image
    # uniform-prefix sort -- zero false collisions (>=66-bit prefix) and
    # an exact histogram against a host dedupe
    import jax.numpy as jnp

    from tsxcount_tpu.config import KmerSpec
    from tsxcount_tpu.ops.count import count_unique
    from tsxcount_tpu.ops.mix import LaneMixBijection

    spec = KmerSpec(113)
    mix = LaneMixBijection(spec)
    rng = np.random.default_rng(11)
    n = 1 << 16
    raw = rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)
    raw[:, 7] &= spec.top_lane_mask
    raw[n // 2:] = raw[: n // 2]  # force duplicates
    hashed = mix.apply(jnp.asarray(raw))
    uc = count_unique(
        hashed, jnp.ones((n,), bool), spec=spec,
        uniform_prefix=True, collide_mode="flag",
    )
    assert not bool(uc.collided)
    nu = int(uc.n_unique)
    want = np.unique(raw, axis=0)
    assert nu == len(want)
    counts = np.asarray(uc.counts[:nu])
    assert counts.sum() == n and (counts == 2).all()
