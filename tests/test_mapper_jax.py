"""Device (batched) mapper vs serial oracle: outputs must be identical."""
import numpy as np
import pytest

from metamaps_tpu.engine.index import SketchShard
from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
from metamaps_tpu.engine import mapper_oracle
from metamaps_tpu.ops.winnow import winnow_np
from metamaps_tpu.params import Parameters

from util_sim import random_genome, sample_reads, revcomp


def build_shard(genomes, params):
    shard = SketchShard()
    parts = []
    for i, g in enumerate(genomes):
        h, p, s = winnow_np(g, params.kmer_size, params.window_size,
                            params.alphabet_size)
        parts.append((h, p, s, i))
        shard.contig_names.append(f"C{i}|kraken:taxid|{1000+i}|X{i}.1")
        shard.contig_lengths.append(len(g))
    return shard.finalize(parts)


def as_tuple(m: mapper_oracle.ReadMapping):
    return (
        m.query_len, m.ref_start, m.ref_end, m.ref_seqid,
        round(m.nuc_identity, 4), m.sketch_size, m.conserved, m.strand,
    )


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(33)
    genomes = [random_genome(rng, 50000) for _ in range(3)]
    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0)
    shard = build_shard(genomes, params)
    return rng, genomes, params, shard


def test_batch_matches_oracle_clean_and_noisy(setup):
    rng, genomes, params, shard = setup
    reads = sample_reads(rng, genomes, 20, min_len=2000, max_len=7000, sub=0.08)
    seqs = [r[0] for r in reads]
    engine = JaxMapperEngine(shard, params)
    got = engine.map_reads(seqs)
    for i, seq in enumerate(seqs):
        want = mapper_oracle.map_read(shard, params, seq)
        assert [as_tuple(m) for m in got[i]] == [as_tuple(m) for m in want], f"read {i}"


def test_batch_matches_oracle_adversarial(setup):
    rng, genomes, params, shard = setup
    # repetitive reads (duplicate hashes stress the chain events), chimeras,
    # aliens, exact copies, reverse complements
    seqs = []
    g = genomes[0]
    seqs.append(np.tile(g[1000:1400], 8))                 # tandem repeat read
    seqs.append(np.concatenate([g[5000:7000], g[30000:32000]]))  # chimera
    seqs.append(random_genome(rng, 3000))                  # alien
    seqs.append(g[10000:14096])                            # exact
    seqs.append(revcomp(g[20000:24096]))                   # exact rc
    seqs.append(np.concatenate([g[8000:10000], revcomp(g[8000:10000])]))  # palindrome-ish
    engine = JaxMapperEngine(shard, params)
    got = engine.map_reads(seqs)
    for i, seq in enumerate(seqs):
        want = mapper_oracle.map_read(shard, params, seq)
        assert [as_tuple(m) for m in got[i]] == [as_tuple(m) for m in want], f"case {i}"


def test_batch_mixed_lengths_buckets(setup):
    rng, genomes, params, shard = setup
    reads = sample_reads(rng, genomes, 12, min_len=2000, max_len=2100, sub=0.05)
    reads += sample_reads(rng, genomes, 4, min_len=6000, max_len=7500, sub=0.05)
    seqs = [r[0] for r in reads]
    engine = JaxMapperEngine(shard, params, read_len_buckets=(2048, 8192))
    got = engine.map_reads(seqs)
    for i, seq in enumerate(seqs):
        want = mapper_oracle.map_read(shard, params, seq)
        assert [as_tuple(m) for m in got[i]] == [as_tuple(m) for m in want], f"read {i}"


def test_batch_protein_alphabet_matches_oracle():
    """Engine end-to-end on amino-acid sequences (alphabet_size=20, k=5 as
    the reference's AA defaults, parseCmdArgs.hpp:323-326): no revcomp, no
    symmetric-kmer skip; batch output must equal the serial oracle."""
    rng = np.random.default_rng(77)
    aa = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", dtype=np.uint8)
    genomes = [rng.choice(aa, size=20000) for _ in range(2)]
    params = Parameters(kmer_size=5, window_size=16, min_read_length=500,
                        percentage_identity=80.0, alphabet_size=20)
    shard = build_shard(genomes, params)
    # reads: exact and mutated protein fragments + an alien
    seqs = []
    for i in range(6):
        g = genomes[i % 2]
        pos = int(rng.integers(0, len(g) - 3000))
        r = g[pos : pos + 3000].copy()
        nm = int(0.05 * len(r)) if i % 2 else 0
        if nm:
            idx = rng.integers(0, len(r), nm)
            r[idx] = aa[rng.integers(0, 20, nm)]
        seqs.append(r)
    seqs.append(rng.choice(aa, size=2000))
    engine = JaxMapperEngine(shard, params, read_len_buckets=(4096,))
    got = engine.map_reads(seqs)
    n_with_hits = 0
    for i, seq in enumerate(seqs):
        want = mapper_oracle.map_read(shard, params, seq)
        assert [as_tuple(m) for m in got[i]] == [as_tuple(m) for m in want], f"read {i}"
        n_with_hits += bool(want)
    assert n_with_hits >= 6  # the protein reads actually map


def test_device_routed_l2_matches_oracle(setup):
    """With CHUNK shrunk, later chunks take the device-routed L2 path
    (router + tier slabs enqueued before any host fetch); outputs must stay
    identical to the oracle, including escalation/overflow leftovers."""
    rng, genomes, params, shard = setup
    reads = sample_reads(rng, genomes, 30, min_len=2000, max_len=7000,
                         sub=0.08)
    seqs = [r[0] for r in reads]
    g = genomes[1]
    seqs += [np.tile(g[2000:2400], 8), revcomp(g[10000:14000])]
    engine = JaxMapperEngine(shard, params)
    engine.CHUNK = 8  # ~4 chunks: chunk 1 seeds the plan, rest ride it
    got = engine.map_reads(seqs)
    assert engine._route_plan, "routing plan was never seeded"
    for i, seq in enumerate(seqs):
        want = mapper_oracle.map_read(shard, params, seq)
        assert [as_tuple(m) for m in got[i]] == [
            as_tuple(m) for m in want
        ], f"read {i}"

    # a second call starts device-routed from the first chunk
    got2 = engine.map_reads(seqs[:10])
    for i in range(10):
        want = mapper_oracle.map_read(shard, params, seqs[i])
        assert [as_tuple(m) for m in got2[i]] == [as_tuple(m) for m in want]
