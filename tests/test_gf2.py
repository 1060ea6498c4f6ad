"""GF(2) bijective hash tests: invertibility, device/host agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsxcount_tpu.config import KmerSpec
from tsxcount_tpu.ops.gf2 import GF2Hash, random_invertible_gf2


@pytest.mark.parametrize("bits", [8, 28, 64, 254])
def test_random_matrix_invertible(bits):
    a, ai = random_invertible_gf2(bits, seed=bits)
    prod = (a.astype(np.int64) @ ai.astype(np.int64)) % 2
    np.testing.assert_array_equal(prod, np.eye(bits, dtype=np.int64))


@pytest.mark.fast
@pytest.mark.parametrize("k", [14, 32, 63, 127])
def test_apply_inverse_roundtrip_device(k):
    spec = KmerSpec(k)
    h = GF2Hash(spec, seed=1)
    rng = np.random.default_rng(k)
    keys = rng.integers(0, 2**32, size=(64, spec.lanes), dtype=np.uint32)
    keys[:, -1] &= spec.top_lane_mask
    hashed = jax.jit(h.apply)(jnp.asarray(keys))
    back = jax.jit(h.inv_apply)(hashed)
    np.testing.assert_array_equal(np.asarray(back), keys)


def test_device_matches_host():
    spec = KmerSpec(21)
    h = GF2Hash(spec, seed=2)
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**32, size=(32, spec.lanes), dtype=np.uint32)
    keys[:, -1] &= spec.top_lane_mask
    dev = np.asarray(jax.jit(h.apply)(jnp.asarray(keys)))
    host = h.apply_host(keys)
    np.testing.assert_array_equal(dev, host)


def test_hash_result_masked_to_key_width():
    spec = KmerSpec(14)
    h = GF2Hash(spec, seed=3)
    keys = np.arange(16, dtype=np.uint32)[:, None]
    hashed = np.asarray(jax.jit(h.apply)(jnp.asarray(keys)))
    assert (hashed >> spec.bits == 0).all()


def test_identity_mode():
    spec = KmerSpec(14)
    h = GF2Hash(spec, identity=True)
    keys = jnp.asarray(np.arange(8, dtype=np.uint32)[:, None])
    np.testing.assert_array_equal(np.asarray(h.apply(keys)), np.asarray(keys))


def test_hash_is_permutation_small():
    # exhaustively check bijectivity on a small key space
    spec = KmerSpec(6)  # 12 bits
    h = GF2Hash(spec, seed=5)
    keys = np.arange(4096, dtype=np.uint32)[:, None]
    hashed = np.asarray(jax.jit(h.apply)(jnp.asarray(keys)))[:, 0]
    assert len(np.unique(hashed)) == 4096
