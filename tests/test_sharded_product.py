"""Spatial sharded mapDirectly as a product path: on the virtual 8-device
mesh it must produce BYTE-IDENTICAL mapping files and sidecars to the
single-device run on the same inputs (mapWrap.h unifyFiles/
addMappingQualities contract, shards in space instead of time)."""
import os

import numpy as np
import pytest

from metamaps_tpu.cli import main as cli_main
from metamaps_tpu.engine.index import SketchShard, build_shards
from metamaps_tpu.params import Parameters
from metamaps_tpu.parallel.sharded_engine import (
    parse_mesh_spec,
    partition_contigs_blocks,
)

from util_db import make_mini_db, write_reads_fastq
from util_sim import sample_reads


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("shard_prod")
    db = str(root / "DB")
    rng = np.random.default_rng(20240817)
    genomes, contig_names, species_ids = make_mini_db(
        db, rng, n_genomes=6, genome_len=24000
    )
    reads = sample_reads(rng, genomes, 24, min_len=2200, max_len=4000,
                         sub=0.07)
    fq = str(root / "reads.fastq")
    write_reads_fastq(fq, reads)

    out1 = str(root / "single.mappings")
    assert cli_main([
        "mapDirectly", "--reference", os.path.join(db, "DB.fa"),
        "--query", fq, "--output", out1, "--all", "--minReadLen", "2000",
    ]) == 0
    return root, db, fq, out1


def _sidecars(prefix):
    out = {}
    for suffix in ("", ".meta", ".meta.unmappedReadsLengths", ".parameters"):
        text = open(prefix + suffix).read()
        if suffix == ".parameters":
            # the .parameters sidecar embeds the run's own output path
            # (mapWrap.h:196-211); normalize it for cross-run comparison
            text = "\n".join(
                l for l in text.splitlines() if prefix.split("/")[-1] not in l
            )
        out[suffix] = text
    return out


def test_parse_mesh_spec():
    assert parse_mesh_spec("shard=4,data=2") == (4, 2)
    assert parse_mesh_spec("shard=8") == (8, 1)
    assert parse_mesh_spec("data=4") == (1, 4)
    with pytest.raises(ValueError):
        parse_mesh_spec("tp=2")


def test_partition_blocks_contiguous(setup):
    root, db, fq, out1 = setup
    p = Parameters(kmer_size=16, window_size=16,
                   ref_sequences=[os.path.join(db, "DB.fa")])
    shards = []
    build_shards(p, 0, lambda s, n: shards.append(s))
    full = shards[0]
    parts = partition_contigs_blocks(full, 4)
    assert sum(pt.n_minimizers for pt in parts) == full.n_minimizers
    # contiguous: concatenated contig names equal the original order
    names = [n for pt in parts for n in pt.contig_names]
    assert names == full.contig_names
    # roughly balanced
    loads = [pt.n_minimizers for pt in parts]
    assert max(loads) < 2.2 * (sum(loads) / len(loads))


@pytest.mark.parametrize("mesh", ["shard=4,data=2", "shard=8,data=1",
                                  "shard=2,data=4"])
def test_sharded_mapdirectly_byte_identical(setup, tmp_path, mesh):
    root, db, fq, out1 = setup
    out2 = str(tmp_path / f"mesh.mappings")
    assert cli_main([
        "mapDirectly", "--reference", os.path.join(db, "DB.fa"),
        "--query", fq, "--output", out2, "--all", "--minReadLen", "2000",
        "--mesh", mesh,
    ]) == 0
    a = _sidecars(out1)
    b = _sidecars(out2)
    assert open(out1).read() == open(out2).read()
    for suffix in a:
        assert a[suffix] == b[suffix], f"sidecar {suffix} differs"
    # per-shard intermediate files consumed and removed by unify_files
    assert not [f for f in os.listdir(tmp_path) if ".shard" in f]


def test_sharded_report_filter_per_shard(setup, tmp_path):
    """Without --all the top-band filter applies per shard — the same
    semantics as the reference's per-shard reportReadMappings followed by
    unifyFiles (computeMap.hpp:546-563; shard loop mapWrap.h:417-441)."""
    root, db, fq, out1 = setup
    out2 = str(tmp_path / "filt.mappings")
    assert cli_main([
        "mapDirectly", "--reference", os.path.join(db, "DB.fa"),
        "--query", fq, "--output", out2, "--minReadLen", "2000",
        "--mesh", "shard=4,data=2",
    ]) == 0
    # every line of the filtered run exists in the --all run
    all_lines = {
        " ".join(l.split(" ")[:12]) for l in open(out1).read().splitlines()
    }
    got = open(out2).read().splitlines()
    assert got, "filtered sharded run produced no mappings"
    for l in got:
        assert " ".join(l.split(" ")[:12]) in all_lines
