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


def test_self_similarity_from_template(toolchain, tmp_path):
    """prepareFromTemplate must reproduce a direct computation on the
    reduced DB: exact (A,B) jobs are copied, superset-B jobs are reduced by
    reusing per-chunk template results and remapping only chunks whose best
    hit was removed (estimateSelfSimilarity.pl:195-385, 842-1031)."""
    from metamaps_tpu.db import self_similarity as ss
    from metamaps_tpu.sim.simulate import produce_reduced_db

    root, db = toolchain
    if not os.path.exists(os.path.join(db, "selfSimilarities.txt")):
        assert cli_main([
            "selfSimilarity", "--DB", db, "--simFrom", "2000", "--simTo",
            "4000", "--simStep", "1000",
        ]) == 0

    reduced = produce_reduced_db(db, str(tmp_path / "DBred"), ["x2"])
    out_dir = os.path.join(reduced, "selfSimilarity")
    jobs, n_copy, n_re = ss.prepare_from_template(reduced, out_dir, db)
    # dropping x2 removes node 501 (single child); node 50 keeps two jobs:
    # a=500 vs B={x1} (template B was {x1,x2} -> reduced) and a=x1 vs
    # B={500} (exact template match -> copied)
    assert n_copy >= 1 and n_re >= 1
    assert os.path.exists(os.path.join(reduced, "selfSimilarities.txt"))

    # direct computation on the reduced DB for comparison
    direct_dir = str(tmp_path / "ss_direct")
    direct_jobs = ss.prepare(reduced, direct_dir)
    by_key = {}
    for i, j in enumerate(direct_jobs):
        ss.run_job(reduced, j, direct_dir, i, sim_from=2000, sim_to=4000,
                   sim_step=1000)
        by_key[(j.node, j.child, j.a_taxon, tuple(j.b_taxa))] = i

    import json

    for i, j in enumerate(jobs):
        di = by_key[(j.node, j.child, j.a_taxon, tuple(j.b_taxa))]
        with open(os.path.join(out_dir, "results", f"{i}.json")) as f:
            templ = json.load(f)
        with open(os.path.join(direct_dir, "results", f"{di}.json")) as f:
            direct = json.load(f)
        # identical up to the identity-0 fill the template path adds for
        # untracked chunks (doJobIFromTemplate:1006-1017 vs doJobI)
        templ_nonzero = {
            L: {k: v for k, v in h.items() if k != "0"} for L, h in templ.items()
        }
        templ_nonzero = {L: h for L, h in templ_nonzero.items() if h}
        assert templ_nonzero == direct


def test_merged_dmp_translation(toolchain, tmp_path):
    """findCurrentNodeID semantics (taxTree.pm:737-795): outdated NCBI IDs
    follow the merged.dmp chain; unknown IDs raise; non-numeric pass."""
    import shutil

    from metamaps_tpu.taxonomy import Taxonomy

    root, db = toolchain
    tax = str(tmp_path / "tax_merged")
    shutil.copytree(os.path.join(db, "taxonomy"), tax)
    with open(os.path.join(tax, "merged.dmp"), "w") as f:
        f.write("9999\t|\t8888\t|\n")   # chain: 9999 -> 8888 -> 500
        f.write("8888\t|\t500\t|\n")
        f.write("7777\t|\t12345\t|\n")  # dead end (12345 not in tree)
    t = Taxonomy(tax)
    assert t.find_current_node_id("500") == "500"    # current -> unchanged
    assert t.find_current_node_id("9999") == "500"   # chain followed
    assert t.find_current_node_id("x1") == "x1"      # non-numeric pass
    assert t.find_current_node_id("0") == "0"
    with pytest.raises(RuntimeError):
        t.find_current_node_id("7777")

    # truth projection resolves merged IDs before mappability lookup
    from metamaps_tpu.sim.truth import project_truth_into_db

    truth = project_truth_into_db({"r1": "9999"}, t, {"500"})
    assert truth["r1"] == "500"


def test_builddb_protein_dedup(toolchain, tmp_path):
    """buildDB --proteins concatenates protein FASTAs deduplicated by short
    ID (buildDB.pl:341-382)."""
    root, db = toolchain
    p1 = str(tmp_path / "p1.faa")
    p2 = str(tmp_path / "p2.faa")
    with open(p1, "w") as f:
        f.write(">WP_1.1 protA\nMKL\nAV\n>WP_2.1 protB\nMGG\n")
    with open(p2, "w") as f:
        f.write(">WP_2.1 protB dup\nMGG\n>WP_3.1 protC\nMTT\n")
    out = str(tmp_path / "DBp")
    assert cli_main([
        "buildDB", "--DB", out, "--FASTAs", str(root / "annotated.fa"),
        "--taxonomy", str(root / "tax_src"), "--proteins", f"{p1},{p2}",
    ]) == 0
    recs = open(os.path.join(out, "DB_proteins.fa")).read()
    assert recs.count(">") == 3
    assert ">WP_1.1 protA\nMKLAV\n" in recs      # sequence joined to one line
    assert ">WP_2.1 protB\nMGG\n" in recs        # first occurrence wins
    assert "dup" not in recs
    assert ">WP_3.1 protC\nMTT\n" in recs
