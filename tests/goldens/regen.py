"""Regenerate the in-tree end-to-end golden outputs.

Deterministic full-pipeline round trip (annotate -> buildDB -> mapDirectly
-> classify) on a fixed-seed mini dataset; every byte of the committed
goldens is reproducible by re-running this script. The companion test
(tests/test_golden_roundtrip.py) re-runs the same pipeline into a temp dir
and diffs byte-exactly — the self-contained analog of the reference's
MetaMaps_example_output.zip parity fixture (fEM.h:663-806 outputs).

Run from the repo root:  python tests/goldens/regen.py
"""
import os
import shutil
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))
sys.path.insert(0, os.path.join(HERE, ".."))

GOLDEN_FILES = [
    "mapped",
    "mapped.meta",
    "mapped.meta.unmappedReadsLengths",
    "mapped.EM",
    "mapped.EM.reads2Taxon",
    "mapped.EM.reads2Taxon.krona",
    "mapped.EM.WIMP",
    "mapped.EM.lengthAndIdentitiesPerMappingUnit",
    "mapped.EM.contigCoverage",
    "mapped.EM.evidenceUnknownSpecies",
]


def run_pipeline(out_dir: str) -> str:
    """Build the mini DB + reads deterministically and run
    mapDirectly+classify with the serial oracle engine (fully
    deterministic host float64 path). Returns the output prefix."""
    import numpy as np

    from metamaps_tpu.cli import main as cli_main

    from util_db import make_mini_db, write_reads_fastq
    from util_sim import sample_reads

    rng = np.random.default_rng(20260821)
    db = os.path.join(out_dir, "DB")
    genomes, contig_names, species_ids = make_mini_db(
        db, rng, n_genomes=5, genome_len=30000
    )
    reads = sample_reads(rng, genomes, 40, min_len=2200, max_len=5000,
                         sub=0.06)
    # a handful of too-short reads exercise the unmapped/too-short
    # bookkeeping (.meta sidecar, mapWrap.h:96-139)
    short = sample_reads(rng, genomes, 4, min_len=600, max_len=900, sub=0.06)
    # long random reads from no DB genome exercise the unmapped-read
    # detection + .meta.unmappedReadsLengths sidecar (mapWrap.h:96-139)
    from util_sim import random_genome

    alien = [(random_genome(rng, 3000),), (random_genome(rng, 4200),)]
    fq = os.path.join(out_dir, "reads.fastq")
    write_reads_fastq(fq, reads + short + alien)

    prefix = os.path.join(out_dir, "mapped")
    rc = cli_main([
        "mapDirectly", "--reference", os.path.join(db, "DB.fa"),
        "--query", fq, "--output", prefix, "--all",
        "--minReadLen", "2000", "--mapping-engine", "oracle",
    ])
    assert rc == 0, "mapDirectly failed"
    rc = cli_main([
        "classify", "--DB", db, "--mappings", prefix,
        "--emBackend", "numpy",
    ])
    assert rc == 0, "classify failed"
    return prefix


def main():
    with tempfile.TemporaryDirectory() as td:
        prefix = run_pipeline(td)
        for fn in GOLDEN_FILES:
            src = os.path.join(td, fn)
            assert os.path.exists(src), f"pipeline did not produce {fn}"
            shutil.copy(src, os.path.join(HERE, fn))
            print(f"golden: {fn} ({os.path.getsize(src)} bytes)")


if __name__ == "__main__":
    main()
