"""Property tests for the serial mapping oracle on a synthetic mini DB."""
import numpy as np
import pytest

from metamaps_tpu.engine.index import SketchShard, build_shards, reference_memory_model
from metamaps_tpu.engine.mapper_oracle import map_read, report_filter
from metamaps_tpu.params import Parameters

from util_sim import random_genome, sample_reads


@pytest.fixture(scope="module")
def mini_db():
    rng = np.random.default_rng(11)
    genomes = [random_genome(rng, 60000) for _ in range(3)]
    parts = []
    shard = SketchShard()
    from metamaps_tpu.ops.winnow import winnow_np

    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0)
    for i, g in enumerate(genomes):
        h, p, s = winnow_np(g, params.kmer_size, params.window_size)
        parts.append((h, p, s, i))
        shard.contig_names.append(f"C{i}|kraken:taxid|{1000+i}|FAKE{i}.1")
        shard.contig_lengths.append(len(g))
    shard.finalize(parts)
    return genomes, shard, params


def test_perfect_reads_map_exactly(mini_db):
    genomes, shard, params = mini_db
    rng = np.random.default_rng(5)
    reads = sample_reads(rng, genomes, 12, sub=0.0, rc_prob=0.5)
    for seq, gi, pos, strand in reads:
        ms = report_filter(map_read(shard, params, seq), report_all=False)
        assert ms, "error-free read failed to map"
        best = max(ms, key=lambda m: m.nuc_identity)
        assert best.ref_seqid == gi
        assert abs(best.ref_start - pos) < len(seq)
        assert best.nuc_identity > 99.0
        assert best.strand == strand


def test_noisy_reads_map(mini_db):
    genomes, shard, params = mini_db
    rng = np.random.default_rng(6)
    reads = sample_reads(rng, genomes, 15, sub=0.10, rc_prob=0.5)
    n_ok = 0
    for seq, gi, pos, strand in reads:
        ms = report_filter(map_read(shard, params, seq), report_all=False)
        if ms:
            best = max(ms, key=lambda m: m.nuc_identity)
            if best.ref_seqid == gi and abs(best.ref_start - pos) < len(seq):
                n_ok += 1
                # ~10% substitutions -> identity around 90; CI is generous
                assert 82.0 < best.nuc_identity < 97.0
    assert n_ok >= 13


def test_random_read_does_not_map(mini_db):
    genomes, shard, params = mini_db
    rng = np.random.default_rng(7)
    alien = random_genome(rng, 4000)
    ms = map_read(shard, params, alien)
    assert ms == []


def test_report_filter_keeps_top_band(mini_db):
    genomes, shard, params = mini_db
    rng = np.random.default_rng(8)
    # duplicate one genome region into another to create two candidates
    g0 = genomes[0]
    seq = g0[10000:14000]
    ms = map_read(shard, params, seq)
    filtered = report_filter(ms, report_all=False)
    best = max(m.nuc_identity for m in ms)
    assert all(m.nuc_identity >= best - 1.0 for m in filtered)
    assert len(report_filter(ms, report_all=True)) == len(ms)


def test_memory_model_matches_reference_arithmetic():
    # spot values computed by hand from winSketch.hpp:165-178
    assert reference_memory_model(0, 0) == 24
    h, m = 1000, 5000
    expect = int((100 * 16 + 1000 * 8 + 1000 * 24 + 5000 * 12) * 1.2) + 24 + 5000 * 16
    assert reference_memory_model(h, m) == expect


def test_build_shards_single(tmp_path, mini_db):
    genomes, _, params = mini_db
    fa = tmp_path / "db.fa"
    with open(fa, "w") as f:
        for i, g in enumerate(genomes):
            f.write(f">C{i}|kraken:taxid|{1000+i}|FAKE{i}.1\n")
            f.write(g.tobytes().decode() + "\n")
    p = Parameters(kmer_size=16, window_size=16, ref_sequences=[str(fa)])
    shards = []
    build_shards(p, 0, lambda s, n: shards.append((s, n)))
    assert len(shards) == 1
    s = shards[0][0]
    assert len(s.contig_names) == 3
    assert s.n_minimizers > 0

    # memory-bounded: force multiple shards
    one_contig_mem = reference_memory_model(s.n_minimizers // 2, s.n_minimizers // 2)
    shards2 = []
    build_shards(p, one_contig_mem, lambda s2, n: shards2.append((s2, n)))
    assert len(shards2) >= 2
    total = sum(sh.n_minimizers for sh, _ in shards2)
    assert total == s.n_minimizers
    # shard-local seqids restart at 0
    assert all(sh.seqid.min() == 0 for sh, _ in shards2 if sh.n_minimizers)
