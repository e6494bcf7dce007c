"""Statistics parity tests.

End-to-end anchor: the example fixture (MetaMaps_example_output.zip
.parameters) records windowSize 16 chosen automatically from k=16,
p-value 0.001, minReadLength 2000, pi 80, referenceSize 26762276280 —
recommended_window_size must reproduce it. Identity round-trips anchor
j2md/md2j; the .EM file's identity column anchors the j2md chain
(e.g. conserved=34, sketch=785 -> identity 84.4464).
"""
import math

import numpy as np
import pytest

from metamaps_tpu import stats


def test_j2md_edges():
    assert stats.j2md(0.0, 16) == 1.0
    assert stats.j2md(1.0, 16) == 0.0


def test_j2md_md2j_roundtrip():
    for j in [0.01, 0.05, 0.2, 0.5, 0.9]:
        d = stats.j2md(j, 16)
        j2 = stats.md2j(d, 16)
        assert abs(j - j2) < 1e-5


def test_identity_matches_fixture_mapping_line():
    # reference .EM line: conserved 34, sketch 785 -> nucIdentity 84.4464
    mash = stats.j2md(np.float32(1.0) * 34 / 785, 16)
    identity = 100 * (1 - mash)
    assert abs(identity - 84.4464) < 5e-4
    # second fixture line: conserved 20 -> 81.2377
    mash = stats.j2md(np.float32(1.0) * 20 / 785, 16)
    assert abs(100 * (1 - mash) - 81.2377) < 5e-4
    # conserved 34 also appears with identity 84.4464 for readLen 6578:
    # sketch size for that read is 785 = recommended for len 6578? no —
    # sketch = count of unique minimizers; value taken from the fixture.


def test_recommended_window_size_fixture():
    w = stats.recommended_window_size(0.001, 16, 4, 80.0, 2000, 26762276280)
    assert w == 16


def test_recommended_window_size_default_minreadlen():
    # defaults: minReadLen 1000 -> some valid window; sanity bounds
    w = stats.recommended_window_size(0.001, 16, 4, 80.0, 1000, 26762276280)
    assert 1 <= w <= 1000


def test_minimum_hits_monotone():
    s, k = 100, 16
    strict = stats.estimate_minimum_hits(s, k, 80.0)
    relaxed = stats.estimate_minimum_hits_relaxed(s, k, 80.0)
    assert 0 <= relaxed <= strict


def test_binom_quantile_complement_basic():
    # P(X > x) <= q for returned x (conservative upper quantile)
    from scipy import stats as sp

    for (s, p, q) in [(100, 0.3, 0.05), (785, 0.1, 0.05), (10, 0.5, 0.05), (50, 0.9, 0.05)]:
        x = stats.binom_quantile_complement(s, p, q)
        assert 0 <= x <= s
        assert sp.binom.sf(x, s, p) <= q + 1e-9
        if x > 0:
            # one less would not be conservative under the continuized CDF
            assert sp.binom.sf(x - 2, s, p) > q or x <= 1


def test_likelihood_observed_set_sizes():
    # probabilities in [0,1], maximized near the expected intersection
    k, n_kmers, identity, s = 16, 6563, math.exp(-(1 - 0.844464)), 785
    best = max(range(s + 1), key=lambda i: stats.likelihood_observed_set_sizes(k, n_kmers, identity, s, i))
    p_surv = identity ** k
    e_int = round(p_surv * n_kmers)
    e_union = n_kmers + (n_kmers - e_int)
    assert abs(best - s * e_int / e_union) <= 1
    tot = sum(stats.likelihood_observed_set_sizes(k, n_kmers, identity, s, i) for i in range(s + 1))
    assert abs(tot - 1.0) < 1e-6


def test_acceptance_vec_matches_scalar():
    """Vectorized acceptance statistics must be bit-identical to the scalar
    float32-narrowed path (and the bisection quantile must equal the
    continuized boost semantics)."""
    import numpy as np

    from metamaps_tpu import stats

    rng = np.random.default_rng(4)
    ss = rng.integers(1, 800, 300)
    sh = np.minimum(rng.integers(0, 800, 300), ss)
    nuc_v, ub_v, ok_v = stats.acceptance_vec(sh, ss, 16, 80.0)
    for i in range(len(ss)):
        shared, s = int(sh[i]), int(ss[i])
        mash = stats.j2md(np.float32(1.0) * shared / s, 16)
        mash_lb = stats.md_lower_bound(mash, s, 16, 0.9)
        nuc = float(np.float32(100 * (1 - np.float32(mash))))
        ub = float(np.float32(100 * (1 - np.float32(mash_lb))))
        assert nuc == float(nuc_v[i]) and ub == float(ub_v[i])
        assert (ub >= 80.0) == bool(ok_v[i])
    # s == 0 rows are never accepted
    _, _, ok0 = stats.acceptance_vec(np.array([0]), np.array([0]), 16, 80.0)
    assert not ok0[0]
