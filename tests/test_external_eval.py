"""evaluateExternal driver (util/evaluateExternalDatasets.pl parity) and
the Kraken-1/MetaPalette converter tails."""
import os

import numpy as np
import pytest

from metamaps_tpu.cli import main as cli_main
from metamaps_tpu.sim.external_eval import (
    MethodFiles,
    evaluate_external,
    parse_method_spec,
)
from metamaps_tpu.taxonomy import Taxonomy

from util_db import make_mini_db


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("exteval")
    db = str(root / "DB")
    rng = np.random.default_rng(7)
    genomes, contig_names, species_ids = make_mini_db(
        db, rng, n_genomes=3, genome_len=20000
    )
    # truth: 6 reads over the 3 species, plus one read from an unknown
    # species (taxon 999 under genus 100 is NOT in the DB -> projected to
    # its mappable ancestor)
    truth = str(root / "truth.perRead")
    with open(truth, "w") as f:
        for i in range(6):
            f.write(f"r{i}\t{species_ids[i % 3]}\n")
        f.write("r6\t999\n")
    # fake extended taxonomy entry for 999 under genus 100
    with open(os.path.join(db, "taxonomy", "nodes.dmp"), "a") as f:
        f.write("999\t|\t100\t|\tspecies\t|\n")
    with open(os.path.join(db, "taxonomy", "names.dmp"), "a") as f:
        f.write("999\t|\tNovelus\t|\t\t|\tscientific name\t|\n")

    # a perfect method and a flawed one
    good = str(root / "good.reads2Taxon")
    with open(good, "w") as f:
        for i in range(6):
            f.write(f"r{i}\t{species_ids[i % 3]}\n")
        f.write(f"r6\t{species_ids[0]}\n")
    bad = str(root / "bad.reads2Taxon")
    with open(bad, "w") as f:
        for i in range(7):
            f.write(f"r{i}\t{species_ids[0]}\n")

    # distribution file for the good method (WIMP shape)
    wimp = str(root / "good.WIMP")
    with open(wimp, "w") as f:
        f.write("AnalysisLevel\ttaxonID\tName\tAbsolute\tEMFrequency\tPotFrequency\n")
        for sid in species_ids:
            n = 2 + (1 if sid == species_ids[0] else 0)
            f.write(f"species\t{sid}\tSpecies\t{n}\t{n / 7}\t{n / 7}\n")
    fq = str(root / "reads.fastq")
    with open(fq, "w") as f:
        for i in range(7):
            f.write(f"@r{i}\n" + "ACGT" * 600 + "\n+\n" + "I" * 2400 + "\n")
    return root, db, truth, good, bad, wimp, fq


def test_parse_method_spec():
    name, mf = parse_method_spec("MetaMaps=a.r2t:b.WIMP")
    assert name == "MetaMaps" and mf.reads2taxon == "a.r2t"
    assert mf.distribution == "b.WIMP"
    name, mf = parse_method_spec("Bracken=:b.WIMP")
    assert mf.reads2taxon is None and mf.distribution == "b.WIMP"
    with pytest.raises(ValueError):
        parse_method_spec("nopaths")


def test_evaluate_external(setup):
    root, db, truth, good, bad, wimp, fq = setup
    res = evaluate_external(
        db, truth,
        {"good": MethodFiles(good, wimp), "bad": MethodFiles(bad, None)},
        fastq=fq,
        out_prefix=str(root / "eval"),
    )
    assert res["meta"]["n_truth_reads"] == 7
    # r6's truth taxon 999 is not mappable -> projected upward
    assert res["meta"]["n_truth_taxa_changed_by_projection"] == 1
    g = res["methods"]["good"]["reads"]
    # truthLeafInDB reads all correct at species level for 'good'
    cat = [c for c in g if "InDB" in c or "truth" in c.lower()]
    assert cat, f"no read category found: {list(g)}"
    lv = g[cat[0]]
    assert lv["species"]["accuracy"] == 1.0
    b = res["methods"]["bad"]["reads"][cat[0]]
    assert b["species"]["accuracy"] < 1.0
    # distribution metrics present for the good method
    assert "species" in res["methods"]["good"]["distribution"]
    # species-level truth: 2/7 each + the projected novel read's 1/7 on
    # Undefined; WIMP puts that mass on species0 -> L1 = 2/7 exactly
    assert abs(
        res["methods"]["good"]["distribution"]["species"]["L1"] - 2 / 7
    ) < 1e-9
    # tables written
    rl = (root / "eval.readLevel.tsv").read_text()
    assert "good\t" in rl and "bad\t" in rl
    dist = (root / "eval.distribution.tsv").read_text()
    assert "good\tspecies" in dist


def test_evaluate_external_cli(setup):
    root, db, truth, good, bad, wimp, fq = setup
    rc = cli_main([
        "evaluateExternal", "--DB", db, "--truth", truth,
        "--fastq", fq,
        "--method", f"good={good}:{wimp}",
        "--method", f"distonly=:{wimp}",
        "--output", str(root / "clieval"),
    ])
    assert rc == 0
    assert (root / "clieval.readLevel.tsv").exists()
    text = (root / "clieval.distribution.tsv").read_text()
    assert "distonly\t" in text


def test_paper_plot_suite_cli(setup):
    root, db, truth, good, bad, wimp, fq = setup
    rc = cli_main([
        "evaluateExternal", "--DB", db, "--truth", truth,
        "--fastq", fq,
        "--method", f"MetaMaps={good}:{wimp}",
        "--method", f"Kraken2={bad}:{wimp}",
        "--output", str(root / "ploteval"), "--plots",
    ])
    assert rc == 0
    for suffix in (".readsPanel.pdf", ".readAccuracy.pdf",
                   ".abundanceXY.pdf", ".composition.pdf",
                   ".unknownFrequency.pdf", ".readLengths.pdf"):
        fn = root / ("ploteval" + suffix)
        assert fn.exists() and fn.stat().st_size > 800, suffix


def test_metapalette_converter(setup, tmp_path):
    from metamaps_tpu.tools.competitors import metapalette_to_composition

    root, db, *_ = setup
    tax = Taxonomy(os.path.join(db, "taxonomy"))
    profile = tmp_path / "reads.fastq.profile"
    profile.write_text(
        "# comment\n"
        "@header\n"
        "1000\tspecies\tx\tx\t40.0\n"
        "1001\tspecies\tx\tx\t20.0\n"
        "100\tgenus\tx\tx\t45.0\n"
    )
    out = tmp_path / "results_metapalette.txt"
    metapalette_to_composition(str(profile), tax, str(out))
    lines = out.read_text().splitlines()
    assert lines[0].startswith("AnalysisLevel")
    rows = {
        (f[0], f[1]): float(f[4])
        for f in (l.split("\t") for l in lines[1:])
    }
    assert abs(rows[("species", "1000")] - 0.4) < 1e-9
    assert abs(rows[("species", "0")] - 0.4) < 1e-9  # Unclassified fill
    assert abs(rows[("genus", "100")] - 0.45) < 1e-9


def test_kraken1_driver_requires_binary(setup, tmp_path):
    from metamaps_tpu.tools.competitors import (
        CompetitorNotInstalled,
        build_kraken1_db,
        run_metapalette,
    )

    root, db, *_ = setup
    with pytest.raises(CompetitorNotInstalled):
        build_kraken1_db(db, str(tmp_path / "k1"))
    with pytest.raises(CompetitorNotInstalled):
        run_metapalette(str(tmp_path / "nope"), "r.fq", str(tmp_path / "mp"))
