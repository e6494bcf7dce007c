"""downloadRefSeq fetch-loop parity against a local HTTP fixture
(downloadRefSeq.pl:1-415): taxonomy dump + extraction, assembly-summary
selection by level, per-assembly file retrieval with resume-on-partial,
and failure reporting."""
import gzip
import http.server
import os
import tarfile
import threading

import pytest

from metamaps_tpu.db.download import (
    TAXONOMY_FILES,
    FetchResult,
    fetch,
    make_plan,
    parse_assembly_summary,
    write_manifest,
)


def _write(path, data):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(path, mode) as f:
        f.write(data)


@pytest.fixture(scope="module")
def mirror(tmp_path_factory):
    """A miniature NCBI tree: 2 bacteria (one Complete Genome, one
    Chromosome) + 1 Scaffold-level assembly that must be filtered out,
    plus pub/taxonomy/taxdump.tar.gz."""
    root = tmp_path_factory.mktemp("ncbi")

    asm = [
        # (accession_dir, organism, level, seq)
        ("GCF_000000001.1_ASM1v1", "Escherichia coli", "Complete Genome",
         "ACGT" * 300),
        ("GCF_000000002.1_ASM2v1", "Bacillus subtilis", "Chromosome",
         "TTGCA" * 200),
        ("GCF_000000003.1_ASM3v1", "Draftus fragmentus", "Scaffold",
         "GGCC" * 100),
    ]
    header = (
        "#   See assembly_summary_readme\n"
        "# assembly_accession\tbioproject\torganism_name\tassembly_level\t"
        "ftp_path\n"
    )
    rows = []
    for acc_dir, org, level, seq in asm:
        acc = acc_dir.split("_ASM")[0]
        ftp_path = (
            "https://ftp.ncbi.nlm.nih.gov/genomes/all/GCF/000/000/00X/"
            + acc_dir
        )
        rows.append(f"{acc}\tPRJ1\t{org}\t{level}\t{ftp_path}")
        d = root / "genomes" / "all" / "GCF" / "000" / "000" / "00X" / acc_dir
        _write(
            str(d / f"{acc_dir}_genomic.fna.gz"),
            gzip.compress(f">{acc}_contig1\n{seq}\n".encode()),
        )
        _write(
            str(d / f"{acc_dir}_assembly_report.txt"),
            f"# Assembly name: {acc_dir}\n# Taxid: 562\n",
        )
    _write(
        str(root / "genomes" / "refseq" / "bacteria" / "assembly_summary.txt"),
        header + "\n".join(rows) + "\n",
    )

    taxdir = root / "taxsrc"
    for fn in TAXONOMY_FILES:
        _write(str(taxdir / fn), f"1\t|\t{fn}\t|\n")
    tgz = root / "pub" / "taxonomy" / "taxdump.tar.gz"
    os.makedirs(os.path.dirname(str(tgz)), exist_ok=True)
    with tarfile.open(str(tgz), "w:gz") as tf:
        for fn in TAXONOMY_FILES:
            tf.add(str(taxdir / fn), arcname=fn)

    handler = lambda *a, **k: http.server.SimpleHTTPRequestHandler(  # noqa
        *a, directory=str(root), **k
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_full_loop(mirror, tmp_path):
    plan = make_plan(str(tmp_path / "seq"), branches=["bacteria"],
                     base_url=mirror)
    res = fetch(plan, taxonomy_dir=str(tmp_path / "tax"), timeout=10)
    assert isinstance(res, FetchResult)
    # Scaffold-level assembly filtered out; the other two downloaded
    assert res.assemblies_downloaded == 2
    assert res.failures == []
    # taxonomy extracted + verified
    for fn in TAXONOMY_FILES:
        assert (tmp_path / "tax" / fn).exists()
    # layout: <target>/<branch>/<species_safe>/<asm_version>/<files>
    ecoli = (
        tmp_path / "seq" / "bacteria" / "Escherichia_coli"
        / "GCF_000000001.1_ASM1v1"
    )
    fna = ecoli / "GCF_000000001.1_ASM1v1_genomic.fna.gz"
    rpt = ecoli / "GCF_000000001.1_ASM1v1_assembly_report.txt"
    assert fna.exists() and rpt.exists()
    with gzip.open(str(fna), "rt") as f:
        assert f.readline().startswith(">GCF_000000001.1_contig1")
    assert not (tmp_path / "seq" / "bacteria" / "Draftus_fragmentus").exists()


def test_fetch_resume_skips_complete(mirror, tmp_path):
    plan = make_plan(str(tmp_path / "seq"), branches=["bacteria"],
                     base_url=mirror)
    r1 = fetch(plan, timeout=10)
    assert r1.assemblies_downloaded == 2 and r1.files_downloaded == 4
    # second run: everything already local with matching sizes
    r2 = fetch(plan, timeout=10)
    assert r2.assemblies_downloaded == 0
    assert r2.assemblies_skipped == 2
    assert r2.files_downloaded == 0
    # a truncated file is re-fetched
    fna = (
        tmp_path / "seq" / "bacteria" / "Escherichia_coli"
        / "GCF_000000001.1_ASM1v1" / "GCF_000000001.1_ASM1v1_genomic.fna.gz"
    )
    full = fna.read_bytes()
    fna.write_bytes(full[: len(full) // 2])
    r3 = fetch(plan, timeout=10)
    assert r3.files_downloaded == 1
    assert fna.read_bytes() == full


def test_fetch_reports_missing_files(mirror, tmp_path):
    plan = make_plan(str(tmp_path / "seq"), branches=["bacteria"],
                     base_url=mirror)
    res = fetch(
        plan,
        include_suffixes=("_genomic.fna.gz", "_genomic.gff.gz"),
        timeout=10,
    )
    # no gff files exist on the mirror: each selected assembly fails
    assert len(res.failures) == 2
    report = (tmp_path / "seq" / "report.txt").read_text()
    assert "_genomic.gff.gz" in report


def test_fetch_no_levels_keeps_all(mirror, tmp_path):
    plan = make_plan(str(tmp_path / "seq"), branches=["bacteria"],
                     base_url=mirror)
    res = fetch(plan, assembly_levels=None, timeout=10)
    assert res.assemblies_downloaded == 3  # Scaffold kept too


def test_fetch_max_assemblies(mirror, tmp_path):
    plan = make_plan(str(tmp_path / "seq"), branches=["bacteria"],
                     base_url=mirror)
    res = fetch(plan, max_assemblies=1, timeout=10)
    assert res.assemblies_downloaded == 1


def test_parse_assembly_summary(mirror, tmp_path):
    plan = make_plan(str(tmp_path / "s"), branches=["bacteria"],
                     base_url=mirror)
    write_manifest(plan, str(tmp_path / "m.txt"))
    text = (tmp_path / "m.txt").read_text()
    assert "taxdump.tar.gz" in text and "bacteria/assembly_summary.txt" in text


def test_cli_fetch(mirror, tmp_path):
    from metamaps_tpu.cli import main as cli_main

    rc = cli_main([
        "downloadRefSeq", "--targetDir", str(tmp_path / "seq"),
        "--branches", "bacteria", "--fetch",
        "--taxonomyDir", str(tmp_path / "tax"),
        "--baseUrl", mirror, "--skipIncompleteGenomes",
    ])
    assert rc == 0
    assert (tmp_path / "tax" / "names.dmp").exists()
    # only the Complete Genome assembly with --skipIncompleteGenomes
    assert (tmp_path / "seq" / "bacteria" / "Escherichia_coli").exists()
    assert not (tmp_path / "seq" / "bacteria" / "Bacillus_subtilis").exists()


def test_fetch_bad_summary_reports(tmp_path):
    plan = make_plan(str(tmp_path / "seq"), branches=["bacteria"],
                     base_url="http://127.0.0.1:1")  # nothing listening
    res = fetch(plan, timeout=0.5)
    assert len(res.failures) == 1
    assert "assembly_summary" in res.failures[0]
