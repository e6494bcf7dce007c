"""DB toolchain: annotate -> buildDB -> validateDB -> selfSimilarity -> classifyU."""
import os

import numpy as np
import pytest

from metamaps_tpu.cli import main as cli_main

from util_sim import random_genome, mutate


def dmp_line(*fields):
    return "\t|\t".join(str(f) for f in fields) + "\t|\n"


@pytest.fixture(scope="module")
def toolchain(tmp_path_factory):
    root = tmp_path_factory.mktemp("dbtools")
    # source taxonomy: root -> bacteria -> genus 50 -> species 500, 501
    tax_src = root / "tax_src"
    os.makedirs(tax_src)
    with open(tax_src / "names.dmp", "w") as f:
        f.write(dmp_line(1, "all", "", "scientific name"))
        f.write(dmp_line(2, "Bacteria", "", "scientific name"))
        f.write(dmp_line(50, "GenusA", "", "scientific name"))
        f.write(dmp_line(500, "SpeciesA", "", "scientific name"))
        f.write(dmp_line(501, "SpeciesB", "", "scientific name"))
        f.write(dmp_line(99, "Unused", "", "scientific name"))
    with open(tax_src / "nodes.dmp", "w") as f:
        f.write(dmp_line(1, 1, "no rank"))
        f.write(dmp_line(2, 1, "superkingdom"))
        f.write(dmp_line(50, 2, "genus"))
        f.write(dmp_line(500, 50, "species"))
        f.write(dmp_line(501, 50, "species"))
        f.write(dmp_line(99, 2, "genus"))

    rng = np.random.default_rng(5150)
    gA = random_genome(rng, 40000)
    gB = mutate(rng, gA, sub=0.10)       # relative of A under the same genus
    gB2 = mutate(rng, gA, sub=0.10)      # second genome for species 501
    for name, g in [("gA.fa", gA), ("gB.fa", gB), ("gB2.fa", gB2)]:
        with open(root / name, "w") as f:
            f.write(">" + name[:-3] + "_contig1 some description\n")
            f.write(g.tobytes().decode() + "\n")

    # two genomes share taxon 501 -> x pseudo-nodes
    assert cli_main([
        "annotate",
        "--genomes", f"{root}/gA.fa=500,{root}/gB.fa=501,{root}/gB2.fa=501",
        "--output", str(root / "annotated.fa"),
        "--taxonomy", str(tax_src),
    ]) == 0
    db = str(root / "DB")
    assert cli_main([
        "buildDB", "--DB", db, "--FASTAs", str(root / "annotated.fa"),
        "--taxonomy", str(tax_src),
    ]) == 0
    return root, db


def test_annotate_creates_x_nodes(toolchain):
    root, db = toolchain
    headers = [l for l in open(root / "annotated.fa") if l.startswith(">")]
    assert len(headers) == 3
    assert "kraken:taxid|500|" in headers[0]
    assert "kraken:taxid|x1|" in headers[1]
    assert "kraken:taxid|x2|" in headers[2]
    nodes = open(root / "tax_src" / "nodes.dmp").read()
    assert "x1\t|\t501\t|\tpseudospecies" in nodes


def test_builddb_outputs(toolchain):
    root, db = toolchain
    assert os.path.exists(os.path.join(db, "DB.fa"))
    ti = open(os.path.join(db, "taxonInfo.txt")).read()
    assert ti.count("\n") == 3  # taxa 500, x1, x2
    ns = open(os.path.join(db, "contigNstats_windowSize_1000.txt")).read()
    assert ns.count("\n") == 3
    # trimmed taxonomy drops the unused node but keeps ancestors + x nodes
    nodes = open(os.path.join(db, "taxonomy", "nodes.dmp")).read()
    assert "\n99\t" not in nodes and not nodes.startswith("99\t")
    for tid in ("1", "2", "50", "500", "501", "x1", "x2"):
        assert f"{tid}\t|\t" in nodes


def test_validate_and_info(toolchain):
    root, db = toolchain
    assert cli_main(["validateDB", "--DB", db]) == 0
    assert cli_main(["DBinfo", "--DB", db]) == 0


def test_self_similarity_and_classifyU(toolchain):
    root, db = toolchain
    # tiny chunk grid to keep the test fast
    assert cli_main([
        "selfSimilarity", "--DB", db, "--simFrom", "2000", "--simTo", "4000",
        "--simStep", "1000",
    ]) == 0
    ss = os.path.join(db, "selfSimilarities.txt")
    rows = [l.rstrip("\n").split("\t") for l in open(ss) if l.strip()]
    assert rows
    # attachment nodes must include genus 50 and species 501 (two x children)
    nodes = {r[0] for r in rows}
    assert "50" in nodes and "501" in nodes
    # per (node, length) the probabilities sum to 1
    sums = {}
    for r in rows:
        sums.setdefault((r[0], r[1]), 0.0)
        sums[(r[0], r[1])] += float(r[3])
    for k, s in sums.items():
        assert abs(s - 1.0) < 1e-6, k
    # identities for genus-level attachment reflect ~10% divergence
    genus_idents = [int(r[2]) for r in rows if r[0] == "50"]
    assert min(genus_idents) >= 80 and max(genus_idents) <= 100
    assert os.path.exists(ss + ".expectedGenomeSizes")
