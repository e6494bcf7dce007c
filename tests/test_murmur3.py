"""Parity tests for MurmurHash3_x64_128 k-mer hashing.

Golden values were produced by compiling the reference's public-domain
murmur3 (reference: src/common/murmur3.h) and hashing the strings below with
seed 42, keeping the low 32 bits of h1 — exactly what the reference's
``CommonFunc::getHash`` (commonFunc.hpp:71-81) returns.
"""
import numpy as np
import pytest

from metamaps_tpu.ops.murmur3 import hash_kmers, hash_kmers_np

GOLDEN = [
    ("ACGTACGTACGTACGT", 0xAC055887),
    ("AAAAAAAAAAAAAAAA", 0xB20A1D07),
    ("GATTACA", 0x0F219870),
    ("ACGTNNACGTACGTACGTACGTA", 0x01FAF439),
    ("TTTTGGGGCCCCAAAATTTTGGGGCCCCAAAA", 0xE7456798),
    ("A", 0x39C26128),
    ("ACGTACGTACGTACG", 0x10C981C6),
]


def _bytes(s):
    return np.frombuffer(s.encode(), dtype=np.uint8)


@pytest.mark.parametrize("s,expected", GOLDEN)
def test_numpy_golden(s, expected):
    k = len(s)
    h = hash_kmers_np(_bytes(s), k)
    assert h.shape == (1,)
    assert int(h[0]) == expected


@pytest.mark.parametrize("s,expected", GOLDEN)
def test_jax_golden(s, expected):
    k = len(s)
    h = hash_kmers(_bytes(s), k)
    assert int(h[0]) == expected


@pytest.mark.parametrize("k", [3, 5, 8, 9, 15, 16, 17, 24, 31, 32, 33])
def test_jax_matches_numpy_random(k):
    rng = np.random.default_rng(k)
    seq = rng.integers(0, 256, size=300, dtype=np.uint8)
    hnp = hash_kmers_np(seq, k)
    hjx = np.asarray(hash_kmers(seq, k))
    np.testing.assert_array_equal(hnp, hjx)


def test_sliding_consistency():
    # hash of each window equals hashing that window alone
    rng = np.random.default_rng(0)
    seq = rng.integers(65, 91, size=64, dtype=np.uint8)
    k = 16
    h_all = hash_kmers_np(seq, k)
    for i in range(len(seq) - k + 1):
        h_one = hash_kmers_np(seq[i:i + k], k)
        assert h_all[i] == h_one[0]
