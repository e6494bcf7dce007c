"""Tiny read/genome simulation helpers shared by tests."""
import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
_COMP = {65: 84, 84: 65, 67: 71, 71: 67}


def random_genome(rng, n):
    return rng.choice(BASES, size=n)


def revcomp(seq):
    lut = np.arange(256, dtype=np.uint8)
    for a, b in _COMP.items():
        lut[a] = b
    return lut[seq][::-1]


def mutate(rng, seq, sub=0.05, ins=0.0, dele=0.0):
    """Simple substitution/indel error model."""
    out = []
    for b in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + ins:
            out.append(rng.choice(BASES))
        if rng.random() < sub:
            out.append(rng.choice(BASES[BASES != b]))
        else:
            out.append(b)
    return np.array(out, dtype=np.uint8)


def sample_reads(rng, genomes, n_reads, min_len=2000, max_len=6000, sub=0.05,
                 ins=0.0, dele=0.0, rc_prob=0.5):
    """Returns list of (read_seq, true_genome_idx, true_pos, true_strand)."""
    reads = []
    for _ in range(n_reads):
        gi = rng.integers(0, len(genomes))
        g = genomes[gi]
        length = int(rng.integers(min_len, min(max_len, len(g)) + 1))
        pos = int(rng.integers(0, len(g) - length + 1))
        r = g[pos:pos + length]
        strand = 1
        if rng.random() < rc_prob:
            r = revcomp(r)
            strand = -1
        r = mutate(rng, r, sub=sub, ins=ins, dele=dele)
        reads.append((r, gi, pos, strand))
    return reads
