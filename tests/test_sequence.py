"""Unit tests for host-side 2-bit encode/decode and lane packing."""

import numpy as np
import pytest

from tsxcount_tpu.config import KmerSpec
from tsxcount_tpu.utils.sequence import (
    decode_bases,
    encode_bases,
    kmer_to_string,
    kmers_to_strings,
    pack_codes,
    string_to_kmer,
    strings_to_kmers,
    unpack_words,
)


def test_encode_decode_roundtrip():
    seq = "ACGTACGTTTGGCCAA"
    codes, invalid = encode_bases(seq)
    assert not invalid.any()
    assert decode_bases(codes) == seq


def test_encode_values_match_reference_layout():
    # A=00 C=01 G=10 T=11 (reference SequenceUtils.h:86-160)
    codes, _ = encode_bases("ACGT")
    assert codes.tolist() == [0, 1, 2, 3]


def test_encode_n_flags_invalid():
    codes, invalid = encode_bases("ACNNT")
    assert invalid.tolist() == [False, False, True, True, False]
    assert codes[2] == 0 and codes[3] == 0


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=100, dtype=np.uint8)
    words = pack_codes(codes)
    assert words.dtype == np.uint32
    assert len(words) == 7
    out = unpack_words(words, 100)
    np.testing.assert_array_equal(out, codes)


def test_pack_bit_layout_lsb_first():
    # base 0 at bits [0,1]: "C" alone -> word 0 low bits = 01
    codes, _ = encode_bases("CA")
    assert pack_codes(codes)[0] == 1
    codes, _ = encode_bases("AG")  # base 1 = G(2) at bits [2,3] -> 8
    assert pack_codes(codes)[0] == 8


@pytest.mark.parametrize("k", [5, 14, 16, 17, 31, 32, 33, 63, 64, 127])
def test_kmer_string_roundtrip(k):
    rng = np.random.default_rng(k)
    kmer = "".join("ACGT"[c] for c in rng.integers(0, 4, size=k))
    spec = KmerSpec(k)
    lanes = string_to_kmer(kmer, spec)
    assert lanes.shape == (spec.lanes,)
    assert kmer_to_string(lanes, spec) == kmer


def test_batch_kmer_roundtrip():
    spec = KmerSpec(21)
    rng = np.random.default_rng(1)
    kmers = [
        "".join("ACGT"[c] for c in rng.integers(0, 4, size=21))
        for _ in range(50)
    ]
    keys = strings_to_kmers(kmers, spec)
    assert keys.shape == (50, spec.lanes)
    assert kmers_to_strings(keys, spec) == kmers
    # batch encoding must agree with per-kmer encoding
    single = np.stack([string_to_kmer(km, spec) for km in kmers])
    np.testing.assert_array_equal(keys, single)


def test_spec_geometry():
    assert KmerSpec(14).lanes == 1
    assert KmerSpec(16).lanes == 1
    assert KmerSpec(17).lanes == 2
    assert KmerSpec(32).lanes == 2
    assert KmerSpec(63).lanes == 4
    assert KmerSpec(127).lanes == 8
    assert KmerSpec(14).top_lane_mask == (1 << 28) - 1
    assert KmerSpec(16).top_lane_mask == 0xFFFFFFFF
