"""Memory-bounded index sharding end-to-end: mapDirectly with a budget that
forces multiple shards must produce the same per-read content as the
single-shard run (per-read candidate union; line order within a read follows
shard order, as in the reference's unifyFiles)."""
import os

import numpy as np
import pytest

from metamaps_tpu.cli import main as cli_main
from metamaps_tpu.engine.index import build_shards, reference_memory_model
from metamaps_tpu.io.mappings import read_meta
from metamaps_tpu.params import Parameters

from util_db import make_mini_db, write_reads_fastq
from util_sim import sample_reads


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("shard_e2e")
    db = str(root / "DB")
    rng = np.random.default_rng(4242)
    genomes, contig_names, species_ids = make_mini_db(db, rng, n_genomes=4,
                                                      genome_len=30000)
    reads = sample_reads(rng, genomes, 20, min_len=2500, max_len=4000, sub=0.06)
    fq = str(root / "reads.fastq")
    write_reads_fastq(fq, reads)
    return root, db, fq


def test_multi_shard_same_content(setup):
    root, db, fq = setup
    out1 = str(root / "single.mappings")
    assert cli_main(["mapDirectly", "--reference", os.path.join(db, "DB.fa"),
                     "--query", fq, "--output", out1, "--all",
                     "--minReadLen", "2000"]) == 0

    # pick a budget that forces >= 2 shards
    p = Parameters(kmer_size=16, window_size=16,
                   ref_sequences=[os.path.join(db, "DB.fa")])
    shards = []
    build_shards(p, 0, lambda s, n: shards.append(s))
    full = shards[0]
    budget = reference_memory_model(full.n_minimizers // 2, full.n_minimizers // 2)

    out2 = str(root / "sharded.mappings")
    from metamaps_tpu.engine.mapwrap import map_directly

    p2 = Parameters(kmer_size=16, min_read_length=2000,
                    percentage_identity=80.0, report_all=True,
                    ref_sequences=[os.path.join(db, "DB.fa")],
                    query_sequences=[fq], out_file_name=out2,
                    reference_size=os.path.getsize(os.path.join(db, "DB.fa")))
    p2.derive_window_size()  # same derivation as the CLI run above
    map_directly(p2, budget)

    assert read_meta(out1) == read_meta(out2)

    def per_read(path):
        out = {}
        for line in open(path):
            fields = line.split(" ")
            out.setdefault(fields[0], set()).add(" ".join(fields[1:]))
        return out

    assert per_read(out1) == per_read(out2)


def test_multi_query_files(setup, tmp_path):
    root, db, fq = setup
    # split reads across two query files mapped in one invocation
    lines = open(fq).read().split("\n")
    rec = ["\n".join(lines[i : i + 4]) for i in range(0, len(lines) - 1, 4)]
    fq_a = str(tmp_path / "a.fastq")
    fq_b = str(tmp_path / "b.fastq")
    open(fq_a, "w").write("\n".join(rec[:10]) + "\n")
    open(fq_b, "w").write("\n".join(rec[10:]) + "\n")
    out_a = str(tmp_path / "out_a")
    out_b = str(tmp_path / "out_b")
    assert cli_main(["mapDirectly", "--reference", os.path.join(db, "DB.fa"),
                     "--query", f"{fq_a},{fq_b}", "--output",
                     f"{out_a},{out_b}", "--all", "--minReadLen", "2000"]) == 0
    meta_a = read_meta(out_a)
    meta_b = read_meta(out_b)
    assert meta_a["TotalReads"] == 10
    assert meta_b["TotalReads"] == 10
    ref = str(root / "single.mappings")
    combined = open(out_a).read() + open(out_b).read()
    assert sorted(combined.strip().split("\n")) == sorted(
        open(ref).read().strip().split("\n")
    )
