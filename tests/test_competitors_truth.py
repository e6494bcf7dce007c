"""Competitor output converters and dataset-specific truth builders on
checked-in micro-fixtures (SimulationsKraken.pm:664-1580 converters;
util/truthForHMP.pl / truthForZymo.pl / truthForCAMI.pl)."""
import os

import numpy as np
import pytest

from metamaps_tpu.taxonomy import Taxonomy

from util_db import make_mini_db


@pytest.fixture(scope="module")
def taxdb(tmp_path_factory):
    root = tmp_path_factory.mktemp("comp_truth")
    db = str(root / "DB")
    rng = np.random.default_rng(5)
    make_mini_db(db, rng, n_genomes=3, genome_len=5000)
    return root, db, Taxonomy(os.path.join(db, "taxonomy"))


def test_kraken_to_composition(taxdb, tmp_path):
    from metamaps_tpu.tools.competitors import kraken_to_composition

    root, db, tax = taxdb
    report = tmp_path / "k.report"
    report.write_text(
        "  20.00\t2\t2\tU\t0\tunclassified\n"
        "  80.00\t8\t0\tR\t1\troot\n"
        "  50.00\t5\t5\tS\t1000\t    Species0\n"
        "  30.00\t3\t3\tS\t1001\t    Species1\n"
    )
    reads = tmp_path / "k.reads"
    lines = [f"C\tr{i}\t1000\t5000" for i in range(5)]
    lines += [f"C\tr{5+i}\t1001\t5000" for i in range(3)]
    lines += [f"U\tr{8+i}\t0\t5000" for i in range(2)]
    reads.write_text("\n".join(lines) + "\n")

    out = str(tmp_path / "comp.tsv")
    kraken_to_composition(str(report), str(reads), tax,
                          {"1000", "1001", "1002"}, out)
    rows = [l.split("\t") for l in open(out).read().splitlines()[1:]]
    species = {r[1]: (int(r[3]), float(r[4]))
               for r in rows if r[0] == "species"}
    assert species["1000"] == (5, 0.5)
    assert species["1001"] == (3, 0.3)
    assert species["Unclassified"] == (2, 0.2)
    rows2 = [l.split("\t") for l in
             open(out + ".ignoreUnclassified").read().splitlines()[1:]]
    sp2 = {r[1]: float(r[4]) for r in rows2 if r[0] == "species"}
    assert sp2["1000"] == 5 / 8


def test_bracken_to_composition(taxdb, tmp_path):
    from metamaps_tpu.tools.competitors import bracken_to_composition

    root, db, tax = taxdb
    report = tmp_path / "b.report"
    report.write_text(
        "  10.00\t1\t1\tU\t0\tunclassified\n"
        "  90.00\t9\t0\tR\t1\troot\n"
    )
    hdr = ("name\ttaxonomy_id\ttaxonomy_lvl\tkraken_assigned_reads\t"
           "added_reads\tnew_est_reads\tfraction_total_reads\n")
    bs = tmp_path / "b.species"
    bs.write_text(
        hdr + "Species0\t1000\tS\t4\t2\t6\t0.667\n"
        "Species1\t1001\tS\t2\t0\t2\t0.222\n"
    )
    bg = tmp_path / "b.genus"
    bg.write_text(hdr + "Genus0\t100\tG\t6\t2\t8\t0.889\n")

    out = str(tmp_path / "bracken.tsv")
    bracken_to_composition(str(report), {"species": str(bs), "genus": str(bg)},
                           tax, out)
    rows = [l.split("\t") for l in open(out).read().splitlines()[1:]]
    sp = {r[1]: (int(r[3]), float(r[4])) for r in rows if r[0] == "species"}
    assert sp["1000"] == (6, 0.6)
    assert sp["1001"] == (2, 0.2)
    assert sp["Unclassified"] == (2, 0.2)
    gn = {r[1]: (int(r[3]), float(r[4])) for r in rows if r[0] == "genus"}
    assert gn["100"] == (8, 0.8)
    rows2 = [l.split("\t") for l in
             open(out + ".ignoreUnclassified").read().splitlines()[1:]]
    sp2 = {r[1]: float(r[4]) for r in rows2 if r[0] == "species"}
    assert abs(sp2["1000"] - 6 / 9) < 1e-9


def test_megan_reads_to_reads2taxon(tmp_path):
    from metamaps_tpu.tools.competitors import megan_reads_to_reads2taxon

    megan = tmp_path / "m.reads"
    megan.write_text("r0\t1000\nr1\t-2\nr2\t1001\n")
    out = str(tmp_path / "m.r2t")
    megan_reads_to_reads2taxon(str(megan), out,
                               all_read_ids={"r0", "r1", "r2", "r3"})
    got = dict(l.split("\t") for l in open(out).read().splitlines())
    assert got == {"r0": "1000", "r1": "0", "r2": "1001", "r3": "0"}
    uncl = open(out + ".unclassified").read()
    assert "r1\t" in uncl and "r3\t" in uncl


def test_truth_from_cami(taxdb, tmp_path):
    from metamaps_tpu.sim.truth import truth_from_cami

    root, db, tax = taxdb
    tsv = tmp_path / "reads_mapping.tsv"
    tsv.write_text(
        "#anonymous_read_id\tgenome_id\ttax_id\tread_id\n"
        "ar0\tG1\t1000\torig0\n"
        "ar1\tG1\t1000\torig1\n"
        "ar2\tG2\t1001\torig2\n"
    )
    prefix = str(tmp_path / "cami")
    truth_from_cami(str(tsv), prefix, taxonomy=tax)
    got = dict(l.split("\t") for l in
               open(prefix + ".perRead").read().splitlines())
    assert got == {"ar0": "1000", "ar1": "1000", "ar2": "1001"}
    dist = open(prefix + ".distribution").read()
    assert "species\t1000\t" in dist
    origin = open(prefix + ".genomesOfOrigin").read()
    assert "G1\t1000" in origin


_SAM_HEADER = "@HD\tVN:1.0\n"


def test_truth_from_zymo(taxdb, tmp_path):
    from metamaps_tpu.sim.truth import truth_from_zymo

    root, db, tax = taxdb
    ref = tmp_path / "zymo.fa"
    ref.write_text(">tx1000|chrA\nACGTACGT\n>tx1001|chrB\nACGTACGT\n")
    sam = tmp_path / "zymo.sam"
    sam.write_text(
        _SAM_HEADER
        + "r0\t0\ttx1000|chrA\t1\t60\t8M\t*\t0\t0\tACGTACGT\t*\n"
        + "r0\t256\ttx1001|chrB\t1\t60\t8M\t*\t0\t0\tACGTACGT\t*\n"  # secondary
        + "r1\t0\ttx1001|chrB\t1\t30\t8M\t*\t0\t0\tACGTACGT\t*\n"
        + "r2\t4\t*\t0\t0\t*\t*\t0\t0\tACGT\t*\n"  # unmapped
    )
    prefix = str(tmp_path / "zymo")
    truth_from_zymo(str(ref), str(sam), prefix, taxonomy=tax,
                    all_read_ids={"r0", "r1", "r2"})
    got = dict(l.split("\t") for l in
               open(prefix + ".perRead").read().splitlines())
    assert got == {"r0": "1000", "r1": "1001", "r2": "0"}


def test_truth_from_hmp(taxdb, tmp_path):
    from metamaps_tpu.sim.truth import truth_from_hmp

    root, db, tax = taxdb
    gi = tmp_path / "gi2taxon.tsv"
    gi.write_text("4711\t1000\n4712\t1001\n")
    sam = tmp_path / "hmp.sam"
    sam.write_text(
        _SAM_HEADER
        + "r0\t0\tgi|4711|ref|NC_1|\t1\t60\t4M\t*\t0\t0\tACGT\t*\n"
        + "r1\t0\tgi|4712|ref|NC_2|\t1\t20\t4M\t*\t0\t0\tACGT\t*\n"
        + "r1\t0\tgi|4711|ref|NC_1|\t1\t50\t4M\t*\t0\t0\tACGT\t*\n"
    )
    prefix = str(tmp_path / "hmp")
    truth_from_hmp(str(sam), str(gi), prefix, taxonomy=tax,
                   all_read_ids={"r0", "r1", "rX"})
    got = dict(l.split("\t") for l in
               open(prefix + ".perRead").read().splitlines())
    # r1's best alignment (mapq 50) wins over the mapq-20 one
    assert got == {"r0": "1000", "r1": "1000", "rX": "0"}
