"""The multishard bench's table padding must be output-invariant: a shard
mapped through the common-shape padded tables (jit-cache-shared swap loop,
bench._pad_tables_common) produces exactly the mappings of the same shard
uploaded directly."""
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")


@pytest.fixture(scope="module")
def shards():
    from metamaps_tpu.engine.index import SketchShard
    from metamaps_tpu.ops.winnow import winnow_fast

    rng = np.random.default_rng(31415)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    out = []
    genomes_all = []
    for si, n_contigs in enumerate((3, 2)):
        sh = SketchShard()
        parts = []
        genomes = []
        for ci in range(n_contigs):
            g = rng.choice(bases, size=30000 + 4000 * si + 1000 * ci)
            genomes.append(g)
            h, p, s = winnow_fast(g, 16, 16)
            parts.append((h, p, s, ci))
            sh.contig_names.append(f"s{si}c{ci}|kraken:taxid|{si*10+ci}|Z")
            sh.contig_lengths.append(len(g))
        sh.finalize(parts)
        out.append(sh)
        genomes_all.append(genomes)
    return out, genomes_all


def _reads_from(rng, genomes, n=6):
    reads = []
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    for i in range(n):
        g = genomes[i % len(genomes)]
        pos = 500 + 700 * i
        r = g[pos : pos + 2600].copy()
        idx = rng.integers(0, len(r), 60)
        r[idx] = bases[rng.integers(0, 4, 60)]
        reads.append(r)
    return reads


def test_padded_tables_output_invariant(shards):
    from bench import _pad_tables_common
    from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
    from metamaps_tpu.ops.batch_map import DeviceShard
    from metamaps_tpu.params import Parameters

    sketch_shards, genomes_all = shards
    tables = [DeviceShard.host_tables(s) for s in sketch_shards]
    padded = _pad_tables_common([dict(t) for t in tables], verbose=False)
    assert padded[0]["hash_sorted"].shape == padded[1]["hash_sorted"].shape
    assert padded[0]["chains16"].shape == padded[1]["chains16"].shape
    assert int(padded[0]["freq_threshold"]) == int(padded[1]["freq_threshold"])

    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)
    rng = np.random.default_rng(8)
    for si, (sh, tabs) in enumerate(zip(sketch_shards, tables)):
        reads = _reads_from(rng, genomes_all[si])
        # direct upload must keep the shard's own threshold for the
        # reference semantics; the padded loop unifies to the min — on this
        # tiny fixture no hash reaches either threshold, so outputs match
        eng_direct = JaxMapperEngine(
            sh, params, read_len_buckets=(4096,),
            device_shard=DeviceShard.from_tables(tabs),
        )
        eng_padded = JaxMapperEngine(
            sh, params, read_len_buckets=(4096,),
            device_shard=DeviceShard.from_tables(padded[si]),
        )
        r_direct = eng_direct.map_reads(reads)
        r_padded = eng_padded.map_reads(reads)
        assert len(r_direct) == len(r_padded)
        for a, b in zip(r_direct, r_padded):
            assert [m.__dict__ for m in a] == [m.__dict__ for m in b], si
        assert any(len(a) > 0 for a in r_direct), "fixture maps nothing"


def test_em_bench_realdist_tiling(shards):
    from bench import em_bench_realdist
    from metamaps_tpu.engine.mapwrap import add_mapping_qualities
    from metamaps_tpu.engine.mapper_oracle import report_filter
    from metamaps_tpu.engine.mapper_jax import JaxMapperEngine
    from metamaps_tpu.io.mappings import MappingLine
    from metamaps_tpu.params import Parameters

    sketch_shards, genomes_all = shards
    params = Parameters(kmer_size=16, window_size=16, min_read_length=2000,
                        percentage_identity=80.0, report_all=True)
    rng = np.random.default_rng(9)
    sh = sketch_shards[0]
    reads = _reads_from(rng, genomes_all[0])
    eng = JaxMapperEngine(sh, params, read_len_buckets=(4096,))
    lines = []
    for r, ms in enumerate(eng.map_reads(reads)):
        cands = [
            MappingLine(
                read_id=f"read{r}", read_len=m.query_len, strand=m.strand,
                contig_id=sh.contig_names[m.ref_seqid],
                contig_len=sh.contig_lengths[m.ref_seqid],
                ref_start=m.ref_start, ref_end=m.ref_end,
                identity=m.nuc_identity, intersection=m.conserved,
                sketch_size=m.sketch_size,
            ).format()
            for m in report_filter(ms, True)
        ]
        if cands:
            lines.extend(add_mapping_qualities(params, cands))
    out = em_bench_realdist(lines, [sh], min_lines=5000)
    assert out is not None
    assert out["em_lines_realdist"] >= 5000
    assert out["em_iter_ms_realdist"] > 0
