"""Simulation + validation harness end-to-end."""
import os

import numpy as np
import pytest

from metamaps_tpu.sim.simulate import (
    apply_error_model,
    produce_reduced_db,
    run_inference,
    simulate_reads,
    write_simulation,
)
from metamaps_tpu.sim.validation import (
    EVALUATION_LEVELS,
    evaluate_experiment,
    lightning,
)
from metamaps_tpu.taxonomy import Taxonomy

from util_db import make_mini_db


@pytest.fixture(scope="module")
def sim_db(tmp_path_factory):
    root = tmp_path_factory.mktemp("sim")
    db = str(root / "DB")
    rng = np.random.default_rng(808)
    make_mini_db(db, rng, n_genomes=3, genome_len=50000)
    return root, db, rng


def test_error_model_rate(sim_db):
    root, db, rng = sim_db
    seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=20000)
    noisy = apply_error_model(rng, seq, accuracy=0.88)
    # length roughly preserved (ins ~ del compensates partially)
    assert 0.9 * len(seq) < len(noisy) < 1.1 * len(seq)


def test_simulate_and_validate(sim_db):
    root, db, rng = sim_db
    abund = {"1000": 0.6, "1001": 0.3, "1002": 0.1}
    reads = simulate_reads(db, 40, rng, abundances=abund, mean_length=4000,
                           accuracy=0.9)
    prefix = str(root / "sim1")
    write_simulation(reads, prefix)
    run_inference(db, prefix + ".fastq", str(root / "inf1"))

    result = evaluate_experiment(db, prefix + ".truth", str(root / "inf1"))
    acc = result["reads"]["ALL"]
    assert acc["absolute"]["N"] > 30
    assert acc["absolute"]["accuracy"] > 0.9
    assert acc["species"]["accuracy"] > 0.9
    d = result["distribution"]
    assert "species" in d
    assert d["species"]["L1"] < 0.2
    assert d["species"]["binary_recall"] == 1.0


def test_reduced_db_novel_reads(sim_db):
    root, db, rng = sim_db
    # remove taxon 1002; its reads become "novel" against the reduced DB
    reduced = produce_reduced_db(db, str(root / "DB_reduced"), ["1002"])
    ti = open(os.path.join(reduced, "taxonInfo.txt")).read()
    assert "1002" not in ti.split()  # taxon gone
    reads = simulate_reads(db, 25, rng, abundances={"1002": 1.0},
                           mean_length=4000, accuracy=0.92)
    prefix = str(root / "sim2")
    write_simulation(reads, prefix)
    # all reads come from the removed genome; unrelated random genomes ->
    # nothing maps, and classify would (like the reference) refuse an empty
    # mappings file. Map only and check the .meta accounting.
    from metamaps_tpu.cli import main as cli_main
    from metamaps_tpu.io.mappings import read_meta

    out = str(root / "inf2")
    rc = cli_main([
        "mapDirectly", "--reference", os.path.join(reduced, "DB.fa"),
        "--query", prefix + ".fastq", "--output", out, "--all",
        "--minReadLen", "2000",
    ])
    assert rc == 0
    meta = read_meta(out)
    mappable = meta["TotalReads"] - meta["ReadsTooShort"]
    assert meta["ReadsNotMapped"] >= 0.8 * mappable


def test_lightning_levels(sim_db):
    root, db, rng = sim_db
    taxonomy = Taxonomy(os.path.join(db, "taxonomy"))
    mappable = {"1000", "1001", "1002"}
    lt = lightning(taxonomy, "1000", mappable)
    assert lt["strain"] == "1000"
    assert lt["species"] == "1000"
    assert lt["genus"] == "100"
    assert lt["superkingdom"] == "2"
    # genus-level node: species is below -> Unclassified
    lt_g = lightning(taxonomy, "100", mappable)
    assert lt_g["strain"] == "Unclassified"
    assert lt_g["species"] == "Unclassified"
    assert lt_g["genus"] == "100"
    # unmapped read
    lt0 = lightning(taxonomy, "0", mappable)
    assert all(lt0[l] == "Unclassified" for l in EVALUATION_LEVELS)


def test_truth_helpers(sim_db):
    root, db, rng = sim_db
    from metamaps_tpu.engine.em import load_relevant_taxon_info
    from metamaps_tpu.sim.truth import (
        project_truth_into_db,
        truth_from_read_headers,
        write_truth,
    )

    acc2tax = {"NC_0001.1": "1000", "NC_0002.1": "1001"}
    truth = truth_from_read_headers(
        ["NC_0001.1_read5", "NC_0002.1/77", "unknown_read"], acc2tax
    )
    assert truth == {"NC_0001.1_read5": "1000", "NC_0002.1/77": "1001",
                     "unknown_read": "0"}

    taxonomy = Taxonomy(os.path.join(db, "taxonomy"))
    mappable = set(load_relevant_taxon_info(db, set()))
    # a genus-level truth projects to the genus (attachment ancestor of a
    # mappable species); species truth stays; unknown stays 0
    projected = project_truth_into_db(
        {"r1": "1000", "r2": "100", "r3": "0"}, taxonomy, mappable
    )
    assert projected["r1"] == "1000"
    assert projected["r2"] == "100"   # has mappable descendant 1000
    assert projected["r3"] == "0"
    out = write_truth(projected, str(root / "t_out.txt"))
    assert open(out).read().count("\n") == 3


def test_validation_plot(sim_db, tmp_path):
    root, db, rng = sim_db
    from metamaps_tpu.sim.validation import evaluate_experiment
    from metamaps_tpu.tools.plots import plot_validation_results

    res = evaluate_experiment(db, str(root / "sim1.truth"), str(root / "inf1"))
    pdf = plot_validation_results(res, str(tmp_path / "val.pdf"), title="sim1")
    assert os.path.exists(pdf)


def test_simulate_cli_roundtrip(sim_db, tmp_path):
    """The `simulate` CLI covers the simulate.pl driver actions: reads ->
    inference -> evaluate, plus reducedDB (simulate.pl:247/633/689/1966)."""
    import json
    import subprocess
    import sys as _sys

    from metamaps_tpu.cli import main as cli_main

    root, db, rng = sim_db
    out = str(tmp_path / "cli_sim")
    assert cli_main(["simulate", "--action", "reads", "--DB", db, "--out",
                     out, "--nReads", "25", "--seed", "3"]) == 0
    assert os.path.exists(out + ".fastq") and os.path.exists(out + ".truth")

    inf = str(tmp_path / "cli_inf")
    assert cli_main(["simulate", "--action", "inference", "--DB", db,
                     "--out", inf, "--reads", out + ".fastq"]) == 0
    assert os.path.exists(inf + ".EM.reads2Taxon")

    assert cli_main(["simulate", "--action", "evaluate", "--DB", db,
                     "--out", inf, "--truth", out + ".truth",
                     "--mappings", inf]) == 0

    red = str(tmp_path / "cli_red")
    assert cli_main(["simulate", "--action", "reducedDB", "--DB", db,
                     "--out", red, "--removeTaxa", "1002"]) == 0
    ti = open(os.path.join(red, "taxonInfo.txt")).read()
    assert "1002" not in ti and "1000" in ti

    # probe: reducedDB without --removeTaxa
    assert cli_main(["simulate", "--action", "reducedDB", "--DB", db,
                     "--out", red + "2"]) == 1


def test_read_tools_cli(sim_db, tmp_path):
    """extractReads / firstQuartileScore / shortenContigIDs /
    addTaxonIDToFasta through the CLI."""
    from metamaps_tpu.cli import main as cli_main

    root, db, rng = sim_db
    fq = str(tmp_path / "r.fastq")
    with open(fq, "w") as f:
        f.write("@r1\nACGT\n+\nIIII\n@r2\nGGCC\n+\n####\n@r3\nTTAA\n+\nJJJJ\n")
    ids = str(tmp_path / "ids.txt")
    with open(ids, "w") as f:
        f.write("r1\nr3\n")
    out = str(tmp_path / "sub.fastq")
    assert cli_main(["extractReads", "--reads", fq, "--ids", ids,
                     "--output", out]) == 0
    text = open(out).read()
    assert "@r1" in text and "@r3" in text and "@r2" not in text

    assert cli_main(["firstQuartileScore", "--fastq", fq]) == 0

    # taxon-subtree extraction from a reads2Taxon file
    r2t = str(tmp_path / "r.r2t")
    with open(r2t, "w") as f:
        f.write("r1\t1000\nr2\t0\nr3\t1001\n")
    out2 = str(tmp_path / "sub2.fastq")
    assert cli_main(["extractReads", "--reads", fq, "--r2t", r2t, "--DB", db,
                     "--target", "1000", "--output", out2]) == 0
    t2 = open(out2).read()
    assert "@r1" in t2 and "@r2" not in t2 and "@r3" not in t2

    # probe: neither --ids nor --r2t selection
    assert cli_main(["extractReads", "--reads", fq, "--output", out2]) == 1

    fa = str(tmp_path / "g.fa")
    with open(fa, "w") as f:
        f.write(">contigA long description\nACGTACGT\n>contigB\nGGGG\n")
    out_fa = str(tmp_path / "g.taxed.fa")
    assert cli_main(["addTaxonIDToFasta", "--input", fa, "--output", out_fa,
                     "--taxonID", "562"]) == 0
    assert "kraken:taxid|562|" in open(out_fa).read()

    short_fa = str(tmp_path / "g.short.fa")
    mapping = str(tmp_path / "g.map")
    assert cli_main(["shortenContigIDs", "--input", out_fa, "--output",
                     short_fa, "--mapping", mapping]) == 0
    assert os.path.exists(mapping)


def test_build_truth_cli(sim_db, tmp_path):
    """buildTruth derives truth from read headers via an accession table and
    optionally projects it into a DB (truthForHMP/Zymo/CAMI pattern)."""
    from metamaps_tpu.cli import main as cli_main

    root, db, rng = sim_db
    fq = str(tmp_path / "t.fastq")
    with open(fq, "w") as f:
        f.write("@NC_0001.1_read1\nACGT\n+\nIIII\n")
        f.write("@NC_0002.1_read7\nGGCC\n+\nIIII\n")
        f.write("@unknownacc_read2\nTTAA\n+\nIIII\n")
    acc = str(tmp_path / "acc.tsv")
    with open(acc, "w") as f:
        f.write("NC_0001.1\t1000\nNC_0002.1\t7777777\n")
    out = str(tmp_path / "truth.tsv")
    assert cli_main(["buildTruth", "--reads", fq, "--accessions", acc,
                     "--output", out]) == 0
    rows = dict(l.rstrip("\n").split("\t") for l in open(out))
    assert rows == {"NC_0001.1_read1": "1000", "NC_0002.1_read7": "7777777",
                    "unknownacc_read2": "0"}

    # projection into the DB: 7777777 is not in the DB taxonomy -> 0
    out2 = str(tmp_path / "truth_db.tsv")
    assert cli_main(["buildTruth", "--reads", fq, "--accessions", acc,
                     "--DB", db, "--output", out2]) == 0
    rows2 = dict(l.rstrip("\n").split("\t") for l in open(out2))
    assert rows2["NC_0001.1_read1"] == "1000"
    assert rows2["NC_0002.1_read7"] == "0"
