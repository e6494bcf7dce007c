"""Truth-set construction helpers — generic equivalents of the reference's
dataset-specific builders (util/truthForHMP.pl, truthForZymo.pl,
truthForCAMI.pl, evaluateExternalDatasets.pl).

Real mock-community truth sets map read identifiers (or their source
accessions) to taxon IDs. These helpers cover the shared mechanics: mapping
accessions to taxa via a lookup table, projecting truth taxa into a
database's taxonomy (the 'truth within the mapping DB' used by
validation.pm), and writing the two-column truth tables the evaluation
harness consumes.
"""
from __future__ import annotations

import re
from typing import Dict, Iterable, Optional, Set, Tuple

from ..taxonomy import Taxonomy


def truth_from_read_headers(
    read_ids: Iterable[str],
    accession_to_taxon: Dict[str, str],
    pattern: Optional[str] = None,
) -> Dict[str, str]:
    """Derive per-read truth by extracting the source accession from each
    read id and mapping it through the table; unmatched reads map to '0'.

    Without a pattern, the longest separator-delimited prefix ('_' or '/')
    present in the table wins (accessions themselves may contain '_'). With
    a pattern, group 1 is the accession."""
    out = {}
    rx = re.compile(pattern) if pattern else None
    for rid in read_ids:
        taxon = "0"
        if rx is not None:
            m = rx.match(rid)
            if m:
                taxon = accession_to_taxon.get(m.group(1), "0")
        else:
            cuts = [i for i, c in enumerate(rid) if c in "_/"]
            for cut in sorted(cuts, reverse=True):
                if rid[:cut] in accession_to_taxon:
                    taxon = accession_to_taxon[rid[:cut]]
                    break
        out[rid] = taxon
    return out


def read_accession_table(path: str, acc_col: int = 0, taxon_col: int = 1,
                         sep: str = "\t") -> Dict[str, str]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            fields = line.split(sep)
            out[fields[acc_col]] = fields[taxon_col]
    return out


def project_truth_into_db(
    truth_absolute: Dict[str, str],
    taxonomy: Taxonomy,
    mappable: Set[str],
) -> Dict[str, str]:
    """The 'truth within the mapping DB': each absolute truth taxon is
    replaced by itself when directly mappable, else by its closest mappable
    ancestor-of-attachment (the node where a novel genome would attach), or
    '0' when no ancestor has mappable descendants."""
    mappable_up: Dict[str, str] = {}

    def resolve(taxon: str) -> str:
        if taxon in ("0", ""):
            return "0"
        # outdated NCBI IDs follow the merged.dmp chain first
        # (validation.pm:75 via taxTree::findCurrentNodeID)
        if taxonomy.merged and not taxonomy.know_node(taxon) and taxon not in mappable:
            try:
                taxon = taxonomy.find_current_node_id(taxon)
            except RuntimeError:
                pass
        if taxon in mappable:
            return taxon
        if taxon in mappable_up:
            return mappable_up[taxon]
        result = "0"
        if taxonomy.know_node(taxon):
            for anc in taxonomy.get_upward_nodes(taxon, include_start=True):
                desc = taxonomy.descendants(anc)
                if any(d in mappable for d in desc):
                    result = anc
                    break
        mappable_up[taxon] = result
        return result

    return {rid: resolve(t) for rid, t in truth_absolute.items()}


def write_truth(truth: Dict[str, str], path: str):
    with open(path, "w") as f:
        for rid in truth:
            f.write(f"{rid}\t{truth[rid]}\n")
    return path
