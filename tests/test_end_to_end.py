"""End-to-end slice: mapDirectly + classify through the CLI on a mini DB."""
import os

import numpy as np
import pytest

from metamaps_tpu.cli import main as cli_main
from metamaps_tpu.io.mappings import parse_mapping_line, read_meta

from util_db import make_mini_db, write_reads_fastq
from util_sim import sample_reads, random_genome


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    db = str(root / "DB")
    rng = np.random.default_rng(42)
    genomes, contig_names, species_ids = make_mini_db(db, rng)

    reads = sample_reads(rng, genomes, 40, min_len=2500, max_len=6000, sub=0.06)
    # too-short reads and an unmappable read
    reads.append((random_genome(rng, 500), -1, 0, 1))
    reads.append((random_genome(rng, 300), -1, 0, 1))
    reads.append((random_genome(rng, 4000), -1, 0, 1))  # alien, long enough
    fq = str(root / "reads.fastq")
    write_reads_fastq(fq, reads)

    out = str(root / "out.mappings")
    rc = cli_main([
        "mapDirectly", "--reference", os.path.join(db, "DB.fa"),
        "--query", fq, "--output", out, "--all", "--minReadLen", "2000",
    ])
    assert rc == 0
    rc = cli_main(["classify", "--DB", db, "--mappings", out])
    assert rc == 0
    return root, db, out, reads, species_ids


def test_meta_counts(pipeline):
    root, db, out, reads, species_ids = pipeline
    meta = read_meta(out)
    assert meta["TotalReads"] == len(reads)
    assert meta["ReadsTooShort"] == 2
    assert meta["TotalReads"] == (
        meta["ReadsTooShort"] + meta["ReadsMapped"] + meta["ReadsNotMapped"]
    )
    assert meta["ReadsMapped"] >= 38  # alien may or may not map


def test_mapping_lines_wellformed(pipeline):
    root, db, out, reads, species_ids = pipeline
    with open(out) as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    assert lines
    by_read = {}
    for l in lines:
        ml = parse_mapping_line(l)
        assert ml.mapq is not None
        assert 0.0 <= ml.mapq <= 1.0
        assert 0.0 <= ml.identity <= 100.0
        by_read.setdefault(ml.read_id, []).append(ml)
    for rid, mls in by_read.items():
        s = sum(m.mapq for m in mls)
        assert abs(s - 1.0) < 1e-3, f"mapQ sum for {rid} = {s}"


def test_reads2taxon_accuracy(pipeline):
    root, db, out, reads, species_ids = pipeline
    truth = {f"read{i}": (species_ids[gi] if gi >= 0 else None)
             for i, (seq, gi, pos, strand) in enumerate(reads)}
    assigned = {}
    with open(out + ".EM.reads2Taxon") as f:
        for line in f:
            rid, tax = line.rstrip("\n").split("\t")
            assigned[rid] = tax
    n_correct = 0
    n_eval = 0
    for rid, tax in assigned.items():
        if truth.get(rid) is not None:
            n_eval += 1
            if tax == str(truth[rid]):
                n_correct += 1
    assert n_eval >= 38
    assert n_correct / n_eval >= 0.95


def test_wimp_structure(pipeline):
    root, db, out, reads, species_ids = pipeline
    rows = {}
    with open(out + ".EM.WIMP") as f:
        header = f.readline().rstrip("\n").split("\t")
        assert header == ["AnalysisLevel", "taxonID", "Name", "Absolute",
                          "EMFrequency", "PotFrequency"]
        for line in f:
            level, tid, name, absolute, emf, potf = line.rstrip("\n").split("\t")
            rows.setdefault(level, []).append((tid, name, int(absolute),
                                               float(emf), float(potf)))
    expected_levels = {"definedGenomes", "species", "genus", "family", "order",
                       "phylum", "superkingdom"}
    assert set(rows) == expected_levels
    for level, entries in rows.items():
        em_sum = sum(e[3] for e in entries if e[0] != "-3")
        pot_sum = sum(e[4] for e in entries if e[0] != "-3")
        assert abs(em_sum - 1.0) < 1e-3, level
        assert abs(pot_sum - 1.0) < 1e-3, level


def test_em_recalibrated_file(pipeline):
    root, db, out, reads, species_ids = pipeline
    with open(out + ".EM") as f:
        lines = [l.rstrip("\n") for l in f if l.strip()]
    per_read = {}
    for l in lines:
        fld = l.split(" ")
        assert len(fld) == 14
        per_read.setdefault(fld[0], 0.0)
        per_read[fld[0]] += float(fld[13])
    for rid, s in per_read.items():
        assert abs(s - 1.0) < 2e-3


def test_contig_coverage_and_evidence(pipeline):
    root, db, out, reads, species_ids = pipeline
    with open(out + ".EM.contigCoverage") as f:
        header = f.readline().rstrip("\n").split("\t")
        assert header[:3] == ["taxonID", "equalCoverageUnitLabel", "contigID"]
        n = sum(1 for _ in f)
    assert n > 100  # all windows of covered contigs
    with open(out + ".EM.evidenceUnknownSpecies") as f:
        header = f.readline().rstrip("\n").split("\t")
        assert header[0] == "taxonID"
        rows = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    assert rows
    for r in rows:
        assert r[1] != ""  # species column
        # default minreads=10000 -> identity test columns are NA
        assert r[4] == "NA"


def test_map_against_index_same_output(pipeline, tmp_path):
    root, db, out, reads, species_ids = pipeline
    idx = str(tmp_path / "idx")
    rc = cli_main(["index", "--reference", os.path.join(db, "DB.fa"),
                   "--index", idx, "--minReadLen", "2000"])
    assert rc == 0
    out2 = str(tmp_path / "out2.mappings")
    rc = cli_main(["mapAgainstIndex", "--index", idx, "--query",
                   str(root / "reads.fastq"), "--output", out2, "--all"])
    assert rc == 0
    with open(out) as f1, open(out2) as f2:
        assert f1.read() == f2.read()


def test_jax_engine_pipeline_identical(pipeline, tmp_path):
    """mapDirectly with the batched device engine must produce a
    byte-identical mappings file."""
    root, db, out, reads, species_ids = pipeline
    out2 = str(tmp_path / "out_jax.mappings")
    rc = cli_main([
        "mapDirectly", "--reference", os.path.join(db, "DB.fa"),
        "--query", str(root / "reads.fastq"), "--output", out2, "--all",
        "--minReadLen", "2000", "--mapping-engine", "jax",
    ])
    assert rc == 0
    with open(out) as f1, open(out2) as f2:
        assert f1.read() == f2.read()
    assert read_meta(out2) == read_meta(out)


def test_em_jax_backend_matches_numpy(pipeline):
    """Device EM rounds must match the host float64 EM to tolerance."""
    from metamaps_tpu.engine.em import (
        load_mapping_table,
        load_relevant_taxon_info,
        run_em,
    )

    root, db, out, reads, species_ids = pipeline
    ti = load_relevant_taxon_info(db, set())
    table = load_mapping_table(out, ti)
    f_np, it_np = run_em(table, verbose=False, backend="numpy")
    f_jx, it_jx = run_em(table, verbose=False, backend="jax")
    np.testing.assert_allclose(f_np, f_jx, rtol=5e-4, atol=1e-6)


def _synthetic_mapping_table(n_reads, n_taxa, seed=0, max_locs=5):
    """A MappingTable with random per-read location lists (no file IO) —
    exercises the EM backends at scales the fixture pipelines don't."""
    from metamaps_tpu.engine.em import MappingTable

    rng = np.random.default_rng(seed)
    locs = rng.integers(1, max_locs + 1, n_reads)
    n_lines = int(locs.sum())
    read_of_line = np.repeat(np.arange(n_reads, dtype=np.int64), locs)
    taxon_of_line = rng.integers(0, n_taxa, n_lines)
    mapq = np.zeros(n_lines)
    # per-read mapping qualities sum to 1 (the reference's posterior)
    starts = np.zeros(n_reads + 1, np.int64)
    np.cumsum(locs, out=starts[1:])
    raw = rng.random(n_lines) + 1e-3
    tot = np.add.reduceat(raw, starts[:-1])
    mapq = raw / np.repeat(tot, locs)
    return MappingTable(
        lines=[""] * n_lines,
        read_of_line=read_of_line,
        taxon_of_line=taxon_of_line,
        mapq=mapq,
        inv_locations=1.0 / rng.integers(1, 2000, n_lines).astype(np.float64),
        identity=rng.random(n_lines),
        contig_of_line=np.zeros(n_lines, np.int64),
        start=np.zeros(n_lines, np.int64),
        stop=np.zeros(n_lines, np.int64),
        read_len=np.full(n_lines, 5000, np.int64),
        read_ids=[f"r{i}" for i in range(n_reads)],
        taxon_list=[str(1000 + t) for t in range(n_taxa)],
    )


def test_em_jax_backend_large_table():
    """The device EM backend must stay monotone and agree with the host
    float64 EM on a table large enough to exercise the segmented scans
    (grouped-per-read structure, ragged location counts)."""
    from metamaps_tpu.engine.em import run_em

    table = _synthetic_mapping_table(n_reads=200_000, n_taxa=400, seed=11)
    f_np, _ = run_em(table, verbose=False, backend="numpy")
    f_jx, _ = run_em(table, verbose=False, backend="jax")
    # compositions agree to float32 tolerance; the dominant taxa ranking
    # is what classify consumes downstream
    np.testing.assert_allclose(f_np, f_jx, rtol=5e-3, atol=1e-5)
    assert np.argmax(f_np) == np.argmax(f_jx)


def test_em_jax_chunked_scan_matches_numpy():
    """The device EM's fixed-shape chunked lax.scan (compile
    size-independence on TPU) must agree with the host float64 EM across
    chunk-boundary shapes: multi-chunk, padding rows, and carries for
    reads spanning chunk boundaries."""
    import metamaps_tpu.engine.em as em

    saved = em.EM_SCAN_CHUNK_ROWS, em.EM_SCAN_BLOCK
    try:
        em.EM_SCAN_CHUNK_ROWS, em.EM_SCAN_BLOCK = 2, 64
        rng = np.random.default_rng(5)
        counts = rng.integers(1, 9, 1200)  # reads span many tiny chunks
        n_lines = int(counts.sum())
        read_of_line = np.repeat(np.arange(1200), counts)
        n_tax = 23
        raw = rng.random(n_lines) + 1e-3
        starts = np.concatenate([[0], np.cumsum(counts)])
        mapq = raw / np.repeat(np.add.reduceat(raw, starts[:-1]), counts)
        table = em.MappingTable(
            lines=[""] * n_lines,
            read_of_line=read_of_line.astype(np.int64),
            taxon_of_line=rng.integers(0, n_tax, n_lines).astype(np.int32),
            mapq=mapq, inv_locations=rng.random(n_lines) * 1e-5 + 1e-7,
            identity=np.zeros(n_lines), contig_of_line=[""] * n_lines,
            start=np.zeros(n_lines, np.int64),
            stop=np.zeros(n_lines, np.int64),
            read_len=np.zeros(n_lines, np.int64),
            read_ids=[f"r{i}" for i in range(1200)],
            taxon_list=[str(t) for t in range(n_tax)],
        )
        f = rng.random(n_tax)
        f /= f.sum()
        f_np, ll_np = em.em_iterate(table, f)
        step = em.make_em_iterate_jax(table)
        f_jx, ll_jx = step(f.astype(np.float32))
        np.testing.assert_allclose(np.asarray(f_jx, np.float64), f_np,
                                   rtol=1e-4, atol=1e-7)
        assert abs(float(ll_jx) - ll_np) <= 2e-5 * max(1.0, abs(ll_np))
    finally:
        em.EM_SCAN_CHUNK_ROWS, em.EM_SCAN_BLOCK = saved


def test_em_auto_backend_resolution():
    from metamaps_tpu.engine import em

    small = _synthetic_mapping_table(n_reads=100, n_taxa=5)
    assert em._resolve_em_backend(small, "auto") == "numpy"
    assert em._resolve_em_backend(small, "jax") == "jax"
    # above the line threshold, auto follows the device platform
    big = _synthetic_mapping_table(n_reads=100, n_taxa=5)
    big.lines = [""] * em.EM_AUTO_DEVICE_MIN_LINES
    import jax

    expect = "numpy" if jax.devices()[0].platform == "cpu" else "jax"
    assert em._resolve_em_backend(big, "auto") == expect


def test_native_mapping_parser_matches_python(pipeline):
    """The C++ columnar parser (native/mapq_parse.cpp) must produce exactly
    the columns of the Python fallback on a real mapped+qualities file, and
    must decline files without mapping qualities (12 fields)."""
    from metamaps_tpu.engine.em import _parse_columns_python
    from metamaps_tpu.io.native import parse_mappings_native

    root, db, out, reads, species_ids = pipeline
    nat = parse_mappings_native(out)
    if nat is None:
        pytest.skip("native toolchain unavailable")
    py = _parse_columns_python(out)
    assert nat["lines"] == py["lines"]
    assert nat["contigs"] == py["contigs"]
    assert nat["read_ids"] == py["read_ids"]
    for k in ("read_of_line", "contig_idx", "read_len", "start", "stop"):
        np.testing.assert_array_equal(np.asarray(nat[k]), py[k])
    for k in ("identity", "mapq"):
        np.testing.assert_array_equal(np.asarray(nat[k]), py[k])  # bit-exact

    # a 12-field file (pre-addMappingQualities) must be declined, not parsed
    raw = str(root / "twelve.mappings")
    with open(out) as f_in, open(raw, "w") as f_out:
        for line in f_in:
            f_out.write(" ".join(line.rstrip("\n").split(" ")[:12]) + "\n")
    assert parse_mappings_native(raw) is None


def test_em_sharded_backend_matches_numpy(pipeline):
    """The data-parallel float64 EM (psum'd sufficient statistics over the
    8-device mesh) must track the host numpy EM round-for-round: identical
    round count and log-likelihood trace (<= f64 summation-order noise),
    and a final composition equal to ~1e-12."""
    from metamaps_tpu.engine.em import (
        _X64,
        em_iterate,
        load_mapping_table,
        load_relevant_taxon_info,
        run_em,
    )
    from metamaps_tpu.parallel.mesh import (
        make_em_iterate_sharded,
        partition_lines_read_atomic,
    )

    root, db, out, reads, species_ids = pipeline
    ti = load_relevant_taxon_info(db, set())
    table = load_mapping_table(out, ti)

    # read-atomic partition: no read straddles a device boundary
    bounds = partition_lines_read_atomic(table.read_of_line, 8)
    assert bounds[0] == 0 and bounds[-1] == len(table.read_of_line)
    for b in bounds[1:-1]:
        if 0 < b < len(table.read_of_line):
            assert table.read_of_line[b] != table.read_of_line[b - 1]

    f_np, it_np = run_em(table, verbose=False, backend="numpy")
    f_sh, it_sh = run_em(table, verbose=False, backend="sharded")
    assert it_np == it_sh
    np.testing.assert_allclose(f_np, f_sh, rtol=1e-12, atol=1e-15)

    # round-for-round log-likelihood trace
    with _X64():
        step = make_em_iterate_sharded(table)
        f_a = np.full(len(table.taxon_list), 1.0 / len(table.taxon_list))
        f_b = f_a.copy()
        for _ in range(4):
            f_a, ll_a = em_iterate(table, f_a)
            f_b, ll_b = step(f_b)
            assert abs(ll_a - ll_b) <= 1e-9 * max(1.0, abs(ll_a))


def test_classify_sharded_backend_byte_identical(pipeline, tmp_path):
    """classify --emBackend sharded must reproduce the numpy backend's
    .EM.* outputs byte-for-byte on the 8-device mesh."""
    import shutil

    root, db, out, reads, species_ids = pipeline
    out2 = str(tmp_path / "out.mappings")
    for suffix in ("", ".meta", ".meta.unmappedReadsLengths", ".parameters"):
        shutil.copy(out + suffix, out2 + suffix)
    rc = cli_main([
        "classify", "--DB", db, "--mappings", out2,
        "--emBackend", "sharded",
    ])
    assert rc == 0
    for suffix in (
        ".EM", ".EM.WIMP", ".EM.reads2Taxon", ".EM.reads2Taxon.krona",
        ".EM.lengthAndIdentitiesPerMappingUnit", ".EM.contigCoverage",
        ".EM.evidenceUnknownSpecies",
    ):
        assert open(out + suffix).read() == open(out2 + suffix).read(), (
            f"{suffix} differs between numpy and sharded EM backends"
        )
