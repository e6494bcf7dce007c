"""Winnowing parity: oracle (deque) vs vectorized numpy vs JAX device."""
import numpy as np
import pytest

from metamaps_tpu.ops.winnow import winnow_oracle, winnow_np, winnow_jax


def _rand_seq(rng, n, mode):
    if mode == "random":
        return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n)
    if mode == "repetitive":
        unit = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=rng.integers(3, 12))
        reps = np.tile(unit, n // len(unit) + 1)[:n]
        # sprinkle mutations
        nmut = max(1, n // 30)
        idx = rng.integers(0, n, nmut)
        reps[idx] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=nmut)
        return reps
    if mode == "lowercase_n":
        seq = rng.choice(np.frombuffer(b"acgtACGTN", dtype=np.uint8), size=n)
        return seq
    raise ValueError(mode)


CASES = [
    (16, 16, "random", 500),
    (16, 16, "repetitive", 500),
    (16, 16, "lowercase_n", 300),
    (4, 5, "repetitive", 200),
    (4, 5, "random", 200),
    (5, 1, "random", 100),
    (6, 30, "repetitive", 400),
    (15, 10, "random", 300),
]


@pytest.mark.parametrize("k,w,mode,n", CASES)
def test_np_matches_oracle(k, w, mode, n):
    rng = np.random.default_rng((k * 7919 + w * 131 + len(mode)) % 2**32)
    for trial in range(10):
        seq = _rand_seq(rng, n, mode)
        oh, op, os_ = winnow_oracle(seq, k, w)
        vh, vp, vs = winnow_np(seq, k, w)
        np.testing.assert_array_equal(oh, vh, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(op, vp)
        np.testing.assert_array_equal(os_, vs)


@pytest.mark.parametrize("k,w,mode,n", CASES)
def test_jax_matches_oracle(k, w, mode, n):
    rng = np.random.default_rng((k * 104729 + w * 1031 + len(mode)) % 2**32)
    for trial in range(3):
        seq = _rand_seq(rng, n, mode)
        oh, op, os_ = winnow_oracle(seq, k, w)
        vh, vp, vs = winnow_jax(seq, k, w)
        np.testing.assert_array_equal(oh, vh, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(op, vp)
        np.testing.assert_array_equal(os_, vs)


def test_short_sequences():
    seq = np.frombuffer(b"ACGTACGT", dtype=np.uint8)
    for fn in (winnow_oracle, winnow_np, winnow_jax):
        h, p, s = fn(seq, 16, 16)
        assert h.size == 0


def test_protein_alphabet_skips_revcomp():
    # alphabetSize != 4: backward hash is a dummy max, all kmers valid
    rng = np.random.default_rng(7)
    seq = rng.choice(np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8), size=120)
    oh, op, os_ = winnow_oracle(seq, 5, 8, alphabet_size=20)
    vh, vp, vs = winnow_np(seq, 5, 8, alphabet_size=20)
    np.testing.assert_array_equal(oh, vh)
    np.testing.assert_array_equal(op, vp)
    assert (os_ == 1).all()  # forward always < dummy max
