"""Analysis utilities: gene-level, WIMP filter, converters, comparisons,
plots, misc DB helpers."""
import os

import numpy as np
import pytest

from metamaps_tpu.cli import main as cli_main

from util_db import make_mini_db, write_reads_fastq
from util_sim import sample_reads


@pytest.fixture(scope="module")
def analyzed(tmp_path_factory):
    root = tmp_path_factory.mktemp("tools")
    db = str(root / "DB")
    rng = np.random.default_rng(909)
    genomes, contig_names, species_ids = make_mini_db(db, rng, n_genomes=2,
                                                      genome_len=30000)
    # gene annotations covering the first genome
    with open(os.path.join(db, "DB_annotations.txt"), "w") as f:
        f.write("ContigId\tStart\tStop\tGeneName\tGeneLocusTag\tCDSProteinId\tCDSProduct\n")
        for i in range(0, 30000, 5000):
            f.write(f"{contig_names[0]}\t{i}\t{i+2999}\tgene{i//5000}\tLT{i//5000}\tWP_{i//5000}\tproduct {i//5000}\n")
    with open(os.path.join(db, "DB_proteins.faa.annotated"), "w") as f:
        for i in range(6):
            f.write(f"WP_{i}\teggNOG\tCOG{i % 3}\n")

    reads = sample_reads(rng, genomes, 24, min_len=2500, max_len=5000, sub=0.05)
    fq = str(root / "reads.fastq")
    write_reads_fastq(fq, reads)
    out = str(root / "out.mappings")
    assert cli_main(["mapDirectly", "--reference", os.path.join(db, "DB.fa"),
                     "--query", fq, "--output", out, "--all",
                     "--minReadLen", "2000"]) == 0
    assert cli_main(["classify", "--DB", db, "--mappings", out]) == 0
    return root, db, out


def test_gene_level_analysis(analyzed):
    root, db, out = analyzed
    assert cli_main(["geneLevelAnalysis", "--DB", db, "--mappings", out]) == 0
    gla = out + ".EM.geneLevelAnalysis"
    rows = [l.rstrip("\n").split("\t") for l in open(gla)][1:]
    assert rows, "no genes hit"
    for r in rows:
        assert int(r[4]) >= 1
        assert 0 <= float(r[5]) <= 1
    cogs = out + ".EM.proteins.eggNOG"
    assert os.path.exists(cogs)


def test_wimp_filter(analyzed):
    root, db, out = analyzed
    assert cli_main(["filterWIMP", "--DB", db, "--mappings", out,
                     "--identityThreshold", "0.8"]) == 0
    assert os.path.exists(out + ".EM.WIMP.filteredByIdentity")
    # strict threshold removes everything -> all reads unclassified
    assert cli_main(["filterWIMP", "--DB", db, "--mappings", out,
                     "--identityThreshold", "0.999"]) == 0
    rows = [l.split("\t") for l in open(out + ".EM.reads2Taxon.filteredByIdentity")]
    assert all(r[1].strip() == "0" for r in rows)


def test_converters(analyzed, tmp_path):
    root, db, out = analyzed
    assert cli_main(["convertDB", "--DB", db, "--to", "kraken",
                     "--output", str(tmp_path / "kr")]) == 0
    lib = tmp_path / "kr" / "library" / "metamaps.fna"
    heads = [l for l in open(lib) if l.startswith(">")]
    assert all("kraken:taxid|" in h for h in heads)
    assert cli_main(["convertDB", "--DB", db, "--to", "centrifuge",
                     "--output", str(tmp_path / "cf")]) == 0
    assert (tmp_path / "cf" / "seqid2taxid.map").exists()
    assert cli_main(["convertDB", "--DB", db, "--to", "mash",
                     "--output", str(tmp_path / "ms")]) == 0
    assert len(list((tmp_path / "ms").glob("*.fa"))) == 2


def test_compare_and_benchmark(analyzed, tmp_path):
    root, db, out = analyzed
    assert cli_main(["compareMappings", out, out]) == 0
    truth = tmp_path / "truth.txt"
    with open(out + ".EM.reads2Taxon") as f, open(truth, "w") as t:
        t.write(f.read())
    from metamaps_tpu.tools.compare import benchmark_inference

    r = benchmark_inference(out, str(truth))
    assert r["accuracy"] == 1.0  # truth == inference by construction


def test_plots(analyzed):
    root, db, out = analyzed
    assert cli_main(["plotIdentities", "--mappings", out]) == 0
    assert os.path.exists(out + ".EM.identitiesAndCoverage.pdf")


def test_misc_and_manifest(analyzed, tmp_path):
    root, db, out = analyzed
    from metamaps_tpu.tools.misc import add_taxon_id_to_fasta, shorten_contig_ids

    plain = tmp_path / "plain.fa"
    with open(plain, "w") as f:
        f.write(">chr1 description\nACGTACGTACGT\n")
    n = add_taxon_id_to_fasta(str(plain), str(tmp_path / "ann.fa"), "1234")
    assert n == 1
    head = open(tmp_path / "ann.fa").readline()
    assert head.startswith(">C1|kraken:taxid|1234|chr1")
    n2 = shorten_contig_ids(str(tmp_path / "ann.fa"), str(tmp_path / "short.fa"),
                            str(tmp_path / "map.txt"))
    assert n2 == 1
    assert cli_main(["downloadRefSeq", "--targetDir", str(tmp_path / "dl")]) == 0
    assert os.path.exists(str(tmp_path / "dl") + ".manifest")


def test_gff_annotations(tmp_path):
    from metamaps_tpu.db.build_db import parse_gff_annotations

    gff = tmp_path / "a.gff"
    with open(gff, "w") as f:
        f.write("##gff-version 3\n")
        f.write("ctg1\t.\tgene\t100\t400\t.\t+\t.\tID=g1;Name=dnaA;locus_tag=LT1\n")
        f.write("ctg1\t.\tCDS\t100\t400\t.\t+\t0\tID=c1;Parent=g1;protein_id=WP_1;product=replication protein\n")
    rows = parse_gff_annotations([str(gff)])
    assert rows == [("ctg1", 100, 400, "dnaA", "LT1", "WP_1", "replication protein")]


def test_native_reader_matches_python(tmp_path):
    import gzip

    from metamaps_tpu.io import fasta
    from metamaps_tpu.io import native as nv

    fa = tmp_path / "x.fa"
    with open(fa, "w") as f:
        f.write(">a desc\nACGT\nACG\n>b\nTTTT\n>empty\n>c\nG\n")
    fq = tmp_path / "y.fastq"
    with open(fq, "w") as f:
        f.write("@r1 d\nACGTA\n+\nIIIII\n@r2\nGG\n+\nII\n")
    gz = tmp_path / "z.fa.gz"
    with gzip.open(gz, "wt") as f:
        f.write(">g\n" + "ACGT" * 50 + "\n")

    for p in (str(fa), str(fq), str(gz)):
        native = nv.read_sequences_native(p)
        if native is None:
            import pytest

            pytest.skip("native reader unavailable")
        nat = [(n, s.tobytes()) for n, s in native]
        import os

        os.environ["METAMAPS_TPU_NATIVE"] = "0"
        nv._TRIED = False
        nv._LIB = None
        try:
            py = [(n, s.tobytes()) for n, s in fasta.read_sequences(p)]
        finally:
            del os.environ["METAMAPS_TPU_NATIVE"]
            nv._TRIED = False
            nv._LIB = None
        assert nat == py, p


def test_reads_util_and_competitor_converters(tmp_path):
    from metamaps_tpu.tools.reads_util import extract_reads, first_quartile_quality
    from metamaps_tpu.tools.competitors import (
        CompetitorNotInstalled,
        kraken_reads_to_reads2taxon,
        centrifuge_reads_to_reads2taxon,
        run_kraken,
    )

    fq = tmp_path / "r.fastq"
    with open(fq, "w") as f:
        f.write("@a\nACGT\n+\nII#I\n@b\nGGTT\n+\n!!II\n")
    c, phred = first_quartile_quality(str(fq))
    assert c == "!" and phred == 0

    # FASTQ input passes full records through (extractReads.pl:96-98)
    n = extract_reads(str(fq), ["b"], str(tmp_path / "sub.fastq"))
    assert n == 1
    assert open(tmp_path / "sub.fastq").read() == "@b\nGGTT\n+\n!!II\n"
    # sortedFasta mode converts to length-sorted FASTA (:104-110)
    n = extract_reads(str(fq), ["a", "b"], str(tmp_path / "sub.fa"),
                      mode="sortedFasta")
    assert n == 2
    assert open(tmp_path / "sub.fa").read() == ">a\nACGT\n>b\nGGTT\n"

    kr = tmp_path / "k.out"
    with open(kr, "w") as f:
        f.write("C\tread1\t562\t100\t...\n")
        f.write("U\tread2\t0\t0\t...\n")
    out = kraken_reads_to_reads2taxon(str(kr), str(tmp_path / "k.r2t"))
    assert open(out).read() == "read1\t562\nread2\t0\n"
    assert "read2" in open(out + ".unclassified").read()

    cf = tmp_path / "c.out"
    with open(cf, "w") as f:
        f.write("readID\tseqID\ttaxID\tscore\n")
        f.write("r1\tC5|x\t0\t10\n")
        f.write("r1\tC6|x\t99\t9\n")   # second hit ignored
        f.write("r2\tunclassified\t0\t0\n")
    out = centrifuge_reads_to_reads2taxon(
        str(cf), str(tmp_path / "c.r2t"), contig_to_taxon={"C5": "777"}
    )
    assert open(out).read() == "r1\t777\nr2\t0\n"

    import pytest as _pytest

    with _pytest.raises(CompetitorNotInstalled):
        run_kraken("db", "reads", "out", binary="definitely-not-a-binary")


def test_split_eggnog_roundtrip(tmp_path):
    """splitEggNog split -> submit -> collect (util/splitEggNog.pl): chunks
    are record-aligned, job scripts runnable, and per-chunk emapper tables
    merge into the DB_proteins.faa.annotated format."""
    import subprocess

    from metamaps_tpu.cli import main as cli_main
    from metamaps_tpu.tools.gene_level import read_protein_annotations

    fa = str(tmp_path / "prot.fa")
    with open(fa, "w") as f:
        for i in range(6):
            f.write(f">WP_{i}.1 desc\n" + "M" * 50 + "\n")
    out = str(tmp_path / "annot.txt")
    assert cli_main(["splitEggNog", "--action", "split", "--input", fa,
                     "--output", out, "--targetChars", "120"]) == 0
    chunks = sorted((tmp_path).glob("annot.txt.split.i.*"))
    assert len(chunks) > 1
    # every chunk starts with a header line (record-aligned cuts)
    for c in chunks:
        assert open(c).readline().startswith(">")

    # fake annotation command: writes an emapper-style table per chunk
    fake = str(tmp_path / "fake_emapper.py")
    with open(fake, "w") as f:
        f.write("""import sys
inp, out = sys.argv[1], sys.argv[2]
with open(out + ".emapper.annotations", "w") as o:
    o.write("# c1\\n# c2\\n# c3\\n")
    o.write("#query_name\\tGO_terms\\tKEGG_KOs\\tBiGG_reactions\\tOGs\\tCOG cat\\n")
    for line in open(inp):
        if line.startswith(">"):
            pid = line[1:].split()[0]
            o.write(f"{pid}\\tGO:1\\tK1\\t\\tOG1\\tJ\\n")
""")
    import sys as _sys
    assert cli_main(["splitEggNog", "--action", "submit", "--input", fa,
                     "--output", out, "--cmd",
                     f"{_sys.executable} {fake} {{input}} {{output}}"]) == 0
    for script in sorted((tmp_path).glob("annot.txt.split.submit.*")):
        subprocess.run(["bash", str(script)], check=True)
    assert cli_main(["splitEggNog", "--action", "collect", "--input", fa,
                     "--output", out]) == 0
    ann = read_protein_annotations(out)
    assert len(ann) == 6
    assert ann["WP_0.1"] == {"GO": ["GO:1"], "KEGG": ["K1"], "OG": ["OG1"],
                             "COG": ["J"]}

    # probe: split refuses to run twice
    import pytest
    with pytest.raises(RuntimeError):
        from metamaps_tpu.tools.eggnog import split_fasta
        split_fasta(fa, out, target_chars=120)
