"""Sketch statistics: Jaccard <-> mash distance, CI bounds, p-values.

Host-side parity implementations of the reference's Stat namespace
(src/map/include/map_stats.hpp):

- j2md / md2j                 (map_stats.hpp:44,62)
- md_lower_bound              (map_stats.hpp:79, boost inverse binomial)
- estimate_minimum_hits[_relaxed]  (map_stats.hpp:120,142)
- estimate_pvalue             (map_stats.hpp:179)
- recommended_window_size     (map_stats.hpp:226)
- likelihood_observed_set_sizes    (mapWrap.h:332, the mapQ binomial model)

The reference computes in C++ ``float`` with double-precision intermediates;
we reproduce the float32 narrowing points exactly (they decide acceptance at
the identity cutoff boundary).

Boost's ``quantile(complement(binomial(s, p), q))`` with the default
``integer_round_outwards`` discrete-quantile policy solves the continuized
survival function I_p(x+1, s-x) = q for real x and rounds up (clamped to
[0, s]); :func:`binom_quantile_complement` mirrors that via scipy's
incomplete beta.
"""
from __future__ import annotations

import math

import numpy as np
from scipy import special as sps
from scipy import optimize as spo
from scipy import stats as spstats

_f32 = np.float32


def j2md(j: float, k: int) -> float:
    """Jaccard estimate -> mash distance (float32 result)."""
    j = _f32(j)
    if j == 0:
        return float(_f32(1.0))
    if j == 1:
        return float(_f32(0.0))
    md = (-1.0 / k) * math.log(2.0 * float(j) / (1.0 + float(j)))
    return float(_f32(md))


def md2j(d: float, k: int) -> float:
    """Mash distance -> jaccard estimate (float32 result; k*d multiplied in
    float32 first, as in the C++)."""
    kd = _f32(k) * _f32(d)
    jac = 1.0 / (2.0 * math.exp(float(kd)) - 1.0)
    return float(_f32(jac))


def binom_quantile_complement(s: int, p: float, q: float) -> int:
    """Smallest-order statistic x with continuized P(X > x) = q, rounded up.

    Mirrors boost quantile(complement(binomial(s, p), q)) under the default
    integer_round_outwards policy. Continuous extension of the binomial CDF:
    cdf(x) = I_{p}(x+1, s-x) complement, i.e. sf(x) = I_p(x+1, s-x).
    """
    if p <= 0:
        return 0
    if p >= 1:
        return s
    # sf(x) is decreasing in x; boundary checks
    sf_at_0 = float(sps.betainc(1.0, float(s), p))  # P(X >= 1) = 1-(1-p)^s
    if q >= sf_at_0:
        return 0
    eps = 1e-12

    def g(x):
        return float(sps.betainc(x + 1.0, s - x, p)) - q

    lo, hi = 0.0, float(s) - eps
    if g(hi) > 0:
        return s
    x = spo.brentq(g, lo, hi, xtol=1e-10)
    return int(min(s, math.ceil(x - 1e-9)))


def md_lower_bound(d: float, s: int, k: int, ci: float) -> float:
    """Lower bound on mash distance within the given confidence interval
    (reference map_stats.hpp:79-111, boost branch)."""
    q2 = (1.0 - float(_f32(ci))) / 2.0
    x = binom_quantile_complement(s, md2j(d, k), q2)
    jaccard = float(_f32(_f32(x) / _f32(s)))
    return j2md(jaccard, k)


def estimate_minimum_hits(s: int, k: int, perc_identity: float) -> int:
    mash_dist = _f32(1.0 - float(perc_identity) / 100.0)
    jaccard = md2j(mash_dist, k)
    return int(math.ceil(1.0 * s * jaccard))


def estimate_minimum_hits_relaxed(s: int, k: int, perc_identity: float) -> int:
    start = estimate_minimum_hits(s, k, perc_identity)
    relaxed = start
    for i in range(start, -1, -1):
        jaccard = _f32(1.0 * i / s)
        d = j2md(jaccard, k)
        d_lower = md_lower_bound(d, s, k, 0.9)
        id_upper = 100.0 * (1.0 - d_lower)
        if id_upper >= perc_identity:
            relaxed = i
        else:
            break
    return relaxed


def estimate_pvalue(
    s: int,
    k: int,
    alphabet_size: int,
    identity: float,
    length_query: int,
    length_reference: int,
) -> float:
    kmer_space = float(alphabet_size) ** k
    px = py = 1.0 / (1.0 + kmer_space / length_query)
    r = px * py / (px + py - px * py)
    x = estimate_minimum_hits_relaxed(s, k, identity)
    if x == 0:
        cdf_complement = 1.0
    else:
        cdf_complement = float(spstats.binom.sf(x - 1, s, r))
    return length_reference * cdf_complement


def recommended_window_size(
    pvalue_cutoff: float,
    k: int,
    alphabet_size: int,
    identity: float,
    length_query: int,
    length_reference: int,
) -> int:
    potential = [1, 2, 5] + list(range(10, length_query, 10))
    optimal_sketch = None
    for e in potential:
        if estimate_pvalue(e, k, alphabet_size, identity, length_query, length_reference) <= pvalue_cutoff:
            optimal_sketch = e
            break
    if optimal_sketch is None:
        raise ValueError("no sketch size satisfies the p-value cutoff")
    w = int(2.0 * length_query / optimal_sketch)
    return min(max(w, 1), length_query)


def likelihood_observed_set_sizes(
    k: int, n_kmers: int, identity: float, sketch_size: int, intersection_size: int
) -> float:
    """P(intersection | sketch, identity): binomial pdf with expected set
    sizes under the k-mer survival model (reference mapWrap.h:332-356)."""
    assert intersection_size <= sketch_size
    p_survival = identity ** k
    e_surviving = p_survival * n_kmers
    e_surviving_int = float(np.round(e_surviving))
    e_union = n_kmers + (n_kmers - e_surviving_int)
    e_intersection = e_surviving_int
    return float(spstats.binom.pmf(intersection_size, sketch_size, e_intersection / e_union))
