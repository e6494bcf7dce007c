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


def test_native_winnow_matches_oracle():
    """native/winnow.cpp must be bit-exact with the deque oracle across
    k/w combinations, lowercase/N bytes, and protein mode."""
    from metamaps_tpu.io.native import winnow_native
    from metamaps_tpu.ops.winnow import winnow_fast, winnow_oracle

    if winnow_native(np.frombuffer(b"ACGTACGTACGTACGTACGT", np.uint8), 16, 4) is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(99)
    bases = np.frombuffer(b"ACGTacgtNn", dtype=np.uint8)
    for _ in range(25):
        n = int(rng.integers(20, 4000))
        seq = rng.choice(bases, size=n)
        for k, w in ((16, 16), (16, 9), (13, 5), (21, 16)):
            a = winnow_oracle(seq, k, w)
            b = winnow_native(seq, k, w)
            c = winnow_fast(seq, k, w)
            for x, y, z in zip(a, b, c):
                np.testing.assert_array_equal(x, y)
                np.testing.assert_array_equal(x, z)
    seq = rng.integers(65, 90, 2500).astype(np.uint8)
    a = winnow_oracle(seq, 16, 16, alphabet_size=20)
    b = winnow_native(seq, 16, 16, alphabet_size=20)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_build_shards_threaded_identical(tmp_path):
    """params.threads > 1 must not change shard contents or cut points."""
    from metamaps_tpu.engine.index import build_shards, reference_memory_model
    from metamaps_tpu.params import Parameters

    rng = np.random.default_rng(3)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    fa = str(tmp_path / "ref.fa")
    with open(fa, "w") as f:
        for i in range(9):
            g = rng.choice(bases, size=int(rng.integers(4000, 30000)))
            f.write(f">c{i}\n{g.tobytes().decode()}\n")

    def collect(threads, budget):
        p = Parameters(kmer_size=16, window_size=16, ref_sequences=[fa],
                       threads=threads)
        shards = []
        build_shards(p, budget, lambda s, n: shards.append(s))
        return shards

    one = collect(1, 0)
    par = collect(4, 0)
    assert len(one) == len(par) == 1
    np.testing.assert_array_equal(one[0].hash_pos_order, par[0].hash_pos_order)
    assert one[0].contig_names == par[0].contig_names

    budget = reference_memory_model(
        one[0].n_minimizers // 2, one[0].n_minimizers // 2
    )
    a = collect(1, budget)
    b = collect(4, budget)
    assert len(a) == len(b) >= 2
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.hash_pos_order, y.hash_pos_order)
        assert x.contig_names == y.contig_names
