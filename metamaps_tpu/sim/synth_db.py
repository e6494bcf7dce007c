"""Structured synthetic database + ONT-like read generator for
realistic-scale benchmarking.

Uniform-random sequence has no repeat structure: every sketch hash is
~unique, the frequency threshold (winSketch.hpp:452-495) never fires and L1
yields ~1 candidate per read. This generator produces databases with the
structure that drives the reference's design (miniSeq+H facts:
/root/reference/README.md:20,100):

- base genomes of random background sequence;
- a shared pool of homologous segments planted across genomes at 2-6%
  divergence (conserved genes across taxa -> multi-taxon L1 candidates);
- repeat families planted at high copy number with small divergence
  (exercises the top-0.001% minimizer frequency threshold);
- near-identical duplicated genomes (~0.5% divergence x-sibling analogs,
  annotateRefSeqSequencesWithUniqueTaxonIDs-style), so reads from them
  always carry >= 2 candidate locations.

Reads are ONT-like: substitutions + insertions + deletions.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _random_seq(rng, n: int) -> np.ndarray:
    return BASES[rng.integers(0, 4, n)]


def mutate_sub(rng, seq: np.ndarray, rate: float) -> np.ndarray:
    out = seq.copy()
    m = rng.random(len(seq)) < rate
    out[m] = BASES[rng.integers(0, 4, int(m.sum()))]
    return out


def synth_structured_db(
    rng,
    total_bases: int = 1_000_000_000,
    n_base_genomes: int = 12,
    n_duplicated: int = 3,
    homolog_pool: int = 40,
    homolog_len: int = 20_000,
    homolog_divergence: Tuple[float, float] = (0.02, 0.06),
    repeat_families: int = 2,
    repeat_len: int = None,
    repeat_copies_per_genome: int = 40,
    repeat_divergence: float = 0.01,
    dup_divergence: float = 0.005,
) -> Tuple[List[np.ndarray], List[str]]:
    """Returns (genomes, contig_names). The duplicated genomes are appended
    after the base genomes; total length ~= total_bases."""
    base_len = total_bases // (n_base_genomes + n_duplicated)
    pool = [_random_seq(rng, homolog_len) for _ in range(homolog_pool)]
    if repeat_len is None:
        # size the repeat families to ~40% of the frequency-threshold
        # budget (to_ignore ~= uniques * 1e-5, winSketch.hpp:463): their
        # high-copy minimizers then land inside the culled top-0.001% —
        # the threshold FIRES (the quantity the uniform-random bench never
        # exercised) and L1 hit totals stay bounded, as on real references
        repeat_len = max(200, int(total_bases * 1.9e-6 / repeat_families * 2))
    repeats = [_random_seq(rng, repeat_len) for _ in range(repeat_families)]

    genomes: List[np.ndarray] = []
    names: List[str] = []
    for gi in range(n_base_genomes):
        g = _random_seq(rng, base_len)
        # homologous segments: each pool element planted with prob 1/2
        for seg in pool:
            if rng.random() < 0.5:
                d = rng.uniform(*homolog_divergence)
                pos = int(rng.integers(0, base_len - len(seg)))
                g[pos : pos + len(seg)] = mutate_sub(rng, seg, d)
        # repeat families at high copy number
        for fam in repeats:
            for _ in range(repeat_copies_per_genome):
                pos = int(rng.integers(0, base_len - len(fam)))
                g[pos : pos + len(fam)] = mutate_sub(
                    rng, fam, repeat_divergence
                )
        genomes.append(g)
        names.append(f"G{gi}|kraken:taxid|{1000 + gi}|chr")

    for di in range(n_duplicated):
        src = int(rng.integers(0, n_base_genomes))
        genomes.append(mutate_sub(rng, genomes[src], dup_divergence))
        names.append(f"G{n_base_genomes + di}_dup{src}"
                     f"|kraken:taxid|x{2000 + di}|chr")
    return genomes, names


def ont_read(rng, genome: np.ndarray, length: int, sub: float = 0.06,
             ins: float = 0.025, dele: float = 0.025) -> np.ndarray:
    """One ONT-like read: slice + substitutions + insertions + deletions
    (the PBSIM CLR regime simulate.pl:41-57 approximates: ~0.88 accuracy)."""
    pos = int(rng.integers(0, len(genome) - length))
    r = genome[pos : pos + length]
    keep = rng.random(length) >= dele
    r = r[keep]
    reps = 1 + (rng.random(len(r)) < ins).astype(np.int64)
    r = np.repeat(r, reps)
    m = rng.random(len(r)) < sub
    r = r.copy()
    r[m] = BASES[rng.integers(0, 4, int(m.sum()))]
    return r


def make_ont_reads(rng, genomes: List[np.ndarray], n_reads: int,
                   min_len: int = 3000, max_len: int = 8000,
                   sub: float = 0.06, ins: float = 0.025,
                   dele: float = 0.025) -> List[np.ndarray]:
    reads = []
    for _ in range(n_reads):
        g = genomes[int(rng.integers(0, len(genomes)))]
        L = int(rng.integers(min_len, max_len))
        reads.append(ont_read(rng, g, L, sub, ins, dele))
    return reads
