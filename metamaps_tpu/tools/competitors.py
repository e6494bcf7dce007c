"""Competitor tool integration — perlLib/SimulationsKraken.pm equivalents.

Runners shell out to kraken/kraken2/centrifuge/bracken when the binaries
are installed (the reference drives them the same way), and the output
converters translate their per-read classifications into the two-column
reads2Taxon format our evaluation harness consumes
(create_compatible_reads_file_from_* — SimulationsKraken.pm:1208-1420).
"""
from __future__ import annotations

import os
import shutil
import subprocess
from typing import Dict, Optional


class CompetitorNotInstalled(RuntimeError):
    pass


def _require(binary: str) -> str:
    path = shutil.which(binary)
    if path is None:
        raise CompetitorNotInstalled(
            f"{binary} not found on PATH — install it or skip this comparison"
        )
    return path


def run_kraken(db_dir: str, reads: str, out_prefix: str, binary: str = "kraken2"):
    """Run kraken/kraken2 against a converted DB (tools.convert.to_kraken +
    kraken-build) and return the per-read output path."""
    bin_path = _require(binary)
    out = out_prefix + ".kraken.reads"
    subprocess.run(
        [bin_path, "--db", db_dir, "--output", out, reads], check=True
    )
    return out


def run_centrifuge(index_prefix: str, reads: str, out_prefix: str):
    bin_path = _require("centrifuge")
    out = out_prefix + ".centrifuge.reads"
    subprocess.run(
        [bin_path, "-x", index_prefix, "-U", reads, "-S", out, "-f"], check=True
    )
    return out


def kraken_reads_to_reads2taxon(kraken_reads: str, output_fn: str):
    """kraken per-read output (C/U, readID, taxID) -> reads2Taxon
    (SimulationsKraken.pm:1208-1244). Unclassified reads map to 0 and are
    also listed in <output>.unclassified."""
    with open(kraken_reads) as f, open(output_fn, "w") as out, open(
        output_fn + ".unclassified", "w"
    ) as out_u:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            fields = line.split("\t")
            classified, read_id, taxon = fields[0], fields[1], fields[2]
            assert classified in ("C", "U")
            if classified == "C":
                out.write(f"{read_id}\t{taxon}\n")
            else:
                out.write(f"{read_id}\t0\n")
                out_u.write(f"{read_id}\tUnclassified\n")
    return output_fn


def centrifuge_reads_to_reads2taxon(centrifuge_reads: str, output_fn: str,
                                    contig_to_taxon: Optional[Dict[str, str]] = None):
    """centrifuge per-read output -> reads2Taxon
    (SimulationsKraken.pm:1298-1420). Multiple hits per read: the first
    classification wins; seqID-based hits can be lifted through
    ``contig_to_taxon`` when taxID is 0."""
    seen = set()
    with open(centrifuge_reads) as f, open(output_fn, "w") as out, open(
        output_fn + ".unclassified", "w"
    ) as out_u:
        header = f.readline().rstrip("\n").split("\t")
        assert header[0] == "readID" and header[2] == "taxID"
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            fields = line.split("\t")
            read_id, seq_id, taxon = fields[0], fields[1], fields[2]
            if read_id in seen:
                continue
            seen.add(read_id)
            if taxon == "0" and contig_to_taxon:
                base = seq_id.split("|")[0]
                taxon = contig_to_taxon.get(base, "0")
            if seq_id == "unclassified" or taxon == "0":
                out.write(f"{read_id}\t0\n")
                out_u.write(f"{read_id}\tUnclassified\n")
            else:
                out.write(f"{read_id}\t{taxon}\n")
    return output_fn
