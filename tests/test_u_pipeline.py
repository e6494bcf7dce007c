"""classifyU end-to-end: novel-species detection on a mini DB."""
import os

import numpy as np
import pytest

from metamaps_tpu.cli import main as cli_main

from util_db import make_mini_db, write_reads_fastq
from util_sim import mutate, random_genome, sample_reads


@pytest.fixture(scope="module")
def u_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("u_e2e")
    db = str(root / "DB")
    rng = np.random.default_rng(1234)
    genomes, contig_names, species_ids = make_mini_db(db, rng, n_genomes=3,
                                                      genome_len=60000)

    # synthetic selfSimilarities.txt for ONE genus node (100, above species
    # 1000): reads hitting species 1000 get an indirect attachment option,
    # reads from the other genomes are direct-only. (The reference's
    # compute_U_mappingQualities gives indirect attachments a degenerate
    # likelihood of exactly 1 per identity — see engine/u.py — so any read
    # with an indirect option attaches indirectly; note the reference binary
    # aborts on classifyU via assert(1==0), mash_map.cpp:323.)
    with open(os.path.join(db, "selfSimilarities.txt"), "w") as f:
        for node, center in [("100", 88)]:
            for rl in (2000, 5000, 10000, 20000):
                ps = {center - 4: 0.1, center - 2: 0.2, center: 0.4,
                      center + 2: 0.2, center + 4: 0.1}
                for idty, p in ps.items():
                    f.write(f"{node}\t{rl}\t{idty}\t{p}\t\n")

    # reads: mostly from known genomes + some from a "novel" relative of
    # genome 0 (~12% diverged)
    reads = sample_reads(rng, genomes, 40, min_len=2500, max_len=6000, sub=0.04)
    novel_genome = mutate(rng, genomes[0], sub=0.12)
    novel_reads = sample_reads(rng, [novel_genome], 12, min_len=2500,
                               max_len=6000, sub=0.04)
    all_reads = reads + novel_reads
    fq = str(root / "reads.fastq")
    write_reads_fastq(fq, all_reads)
    with open(root / "truth.txt", "w") as f:
        for i, (seq, gi, pos, strand) in enumerate(reads):
            f.write(f"read{i}\t{species_ids[gi]}\n")
        for j in range(len(novel_reads)):
            f.write(f"read{len(reads)+j}\tnovel\n")

    out = str(root / "out.mappings")
    assert cli_main([
        "mapDirectly", "--reference", os.path.join(db, "DB.fa"),
        "--query", fq, "--output", out, "--all", "--minReadLen", "2000",
    ]) == 0
    assert cli_main(["classify", "--DB", db, "--mappings", out,
                     "--minreads", "3"]) == 0
    assert cli_main(["classifyU", "--DB", db, "--mappings", out,
                     "--minreads", "3"]) == 0
    return root, db, out, len(reads), len(novel_reads)


def test_mapq_u_file(u_setup):
    root, db, out, n_known, n_novel = u_setup
    with open(out + ".mapQ_U") as f:
        lines = [l.rstrip("\n").split(" ") for l in f if l.strip()]
    assert lines
    per_read = {}
    for fields in lines:
        assert len(fields) == 5
        assert fields[2] in ("0", "1")
        per_read.setdefault(fields[0], 0.0)
        per_read[fields[0]] += float(fields[3])
    for rid, s in per_read.items():
        assert abs(s - 1.0) < 2e-3, rid


def test_u_reads2taxon_complete(u_setup):
    root, db, out, n_known, n_novel = u_setup
    with open(out + ".U.reads2Taxon") as f:
        rows = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    em_rows = open(out + ".EM.reads2Taxon").read().strip().split("\n")
    assert len(rows) == len(em_rows)
    taxa = {r[1] for r in rows}
    # genomes 1/2 have no indirect attachment nodes -> stay at species
    assert any(t in ("1001", "1002") for t in taxa)


def test_u_wimp_wellformed(u_setup):
    root, db, out, n_known, n_novel = u_setup
    with open(out + ".U.WIMP") as f:
        header = f.readline().rstrip("\n").split("\t")
        assert header[0] == "AnalysisLevel" and header[-1] == "PotFrequency"
        rows = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    levels = {r[0] for r in rows}
    assert "definedGenomes" in levels and "species" in levels
    for level in levels:
        tot = sum(float(r[9]) for r in rows if r[0] == level)
        assert abs(tot - 1.0) < 2e-3, (level, tot)
    assert os.path.exists(out + ".U.WIMP.absoluteClassifiedAt")


def test_u_shifted_histograms_and_em2u(u_setup):
    root, db, out, n_known, n_novel = u_setup
    with open(out + ".U.shiftedHistogramsPerTaxonID") as f:
        header = f.readline().rstrip("\n").split("\t")
        assert header == ["taxonID", "directIndirect", "identity", "P"]
        rows = [l.rstrip("\n").split("\t") for l in f if l.strip()]
    assert rows
    assert os.path.exists(out + ".EM2U.details")
    assert os.path.exists(out + ".EM2U.summary")


def test_u_routing(u_setup):
    """Reads with an indirect option (species 1000's genus) attach there —
    the reference's degenerate indirect likelihood — while reads whose taxa
    have no attachment nodes stay at their species."""
    root, db, out, n_known, n_novel = u_setup
    assigned = {}
    with open(out + ".U.reads2Taxon") as f:
        for line in f:
            rid, tax = line.rstrip("\n").split("\t")
            assigned[rid] = tax
    truth = {}
    with open(str(root / "truth.txt")) as f:
        for line in f:
            rid, tax = line.rstrip("\n").split("\t")
            truth[rid] = tax
    n_direct_ok = 0
    n_direct = 0
    n_indirect_ok = 0
    n_with_option = 0
    for rid, true_tax in truth.items():
        got = assigned.get(rid)
        if got is None:
            continue
        if true_tax in ("1001", "1002"):
            n_direct += 1
            n_direct_ok += got == true_tax
        else:  # species 1000 or the novel relative of genome 0
            n_with_option += 1
            n_indirect_ok += got == "100"
    assert n_direct > 0 and n_direct_ok >= int(0.9 * n_direct)
    assert n_with_option > 0 and n_indirect_ok >= int(0.9 * n_with_option)


def _synthetic_identity_manager():
    from metamaps_tpu.engine.u_helper import (
        IdentityManager,
        IdentityReadLengthHistogram,
        TreeAdjustedIdentities,
    )

    ih = IdentityReadLengthHistogram()
    ih.minimum_identity = 75
    ih.maximum_identity = 100
    raw = {i: 0.5 ** abs(92 - i) for i in range(75, 101)}
    tot = sum(raw.values())
    ih.identity_histogram = {i: v / tot for i, v in raw.items()}
    ih.read_length_histogram = {5000: 1.0}

    tai = TreeAdjustedIdentities()
    for node in ("77", "78"):
        for rl in (2000, 5000, 20000):
            ps = {84: 0.1, 88: 0.25, 92: 0.4, 96: 0.25}
            tot = sum(ps.values())
            tai.D.setdefault(node, {})[rl] = {k: v / tot for k, v in ps.items()}
    return IdentityManager(ih, tai)


def test_u_mapq_vectorized_matches_scalar_and_is_fast():
    """The vectorized compute_u_mapping_qualities must reproduce the
    scalar per-line oracle (fU.h:155-362) and beat it by a wide margin —
    it is the U pipeline's hot path over every mapping line."""
    import copy
    import time

    from metamaps_tpu.engine.u import (
        ULocation,
        _compute_u_mapping_qualities_scalar,
        compute_u_mapping_qualities,
    )

    im = _synthetic_identity_manager()
    rng = np.random.default_rng(7)

    def plausible(ident, sketch):
        # intersection near the survival model's expectation — far-off
        # values underflow binom.pmf to exactly 0 and the REFERENCE
        # aborts on them too (assert p_sum > 0, fU.h:155-362)
        p_surv = ident ** 16
        p = p_surv / (2 - p_surv)
        return int(np.clip(rng.binomial(sketch, p), 1, sketch))

    reads = []
    for ri in range(40):
        rl = int(rng.integers(2500, 20000))
        locs = []
        n_direct = int(rng.integers(1, 5))
        for d in range(n_direct):
            sketch = int(rng.integers(80, 400))
            ident = float(rng.uniform(0.80, 0.98))
            locs.append(ULocation(f"r{ri}", str(1000 + d), ident, sketch,
                                  plausible(ident, sketch), rl, 0.0, 0.0,
                                  True))
        for node in ("77", "78")[: int(rng.integers(0, 3))]:
            sketch = int(rng.integers(80, 400))
            ident = float(rng.uniform(0.80, 0.98))
            locs.append(ULocation(f"r{ri}", node, ident, sketch,
                                  plausible(0.92 * ident, sketch), rl, 0.0,
                                  0.0, False))
        reads.append(locs)

    scalar = [copy.deepcopy(l) for l in reads]
    t0 = time.perf_counter()
    for locs in scalar:
        _compute_u_mapping_qualities_scalar(locs, im, 16)
    t_scalar = time.perf_counter() - t0

    vec = [copy.deepcopy(l) for l in reads]
    # warm the per-call caches out of the timing (the scalar path reuses
    # its own cache within each call already)
    compute_u_mapping_qualities(copy.deepcopy(reads[0]), im, 16)
    t0 = time.perf_counter()
    for locs in vec:
        compute_u_mapping_qualities(locs, im, 16)
    t_vec = time.perf_counter() - t0

    for ls, lv in zip(scalar, vec):
        for a, b in zip(ls, lv):
            assert abs(a.mapq - b.mapq) <= 1e-12 + 1e-9 * abs(a.mapq)

    speedup = t_scalar / max(t_vec, 1e-9)
    assert speedup > 10, f"vectorized U mapq only {speedup:.1f}x faster"
