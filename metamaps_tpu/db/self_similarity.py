"""Taxonomy self-similarity precomputation — estimateSelfSimilarity.pl
equivalent.

Produces ``selfSimilarities.txt``: for each potential novel-species
attachment node N, the distribution P(best mapping identity | read length)
of error-free chunks from one mappable descendant (under one child of N)
mapped against the genomes under N's *other* children — a leave-one-out
estimate of how similar a novel genome attached at N would look.

Structure mirrors the reference's resumable job model
(estimateSelfSimilarity.pl modes prepareFromScratch :82 / doJobI :391 /
collect :472): `prepare` enumerates jobs, `run_job` executes one
(simulate chunks at lengths 2000..50000 step 1000 stride 1000, <=2000
chunks/length; map with the engine itself per chunk length, since the
window size derives from the read length), `collect` aggregates the
per-job histograms. Jobs write independent result files, so the fan-out
unit is the same as the reference's SGE array task — here runnable
in-process, via multiprocessing, or one-job-per-invocation on a cluster.
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass, asdict
from typing import Dict, List, Optional, Set

import numpy as np

from ..engine.em import load_relevant_taxon_info
from ..engine.index import SketchShard
from ..engine import mapper_oracle
from ..io.fasta import read_sequences
from ..params import Parameters
from ..taxonomy import Taxonomy
from ..ops.winnow import winnow_np

# reference defaults (estimateSelfSimilarity.pl:36-43)
SIM_SIZE_FROM = 2000
SIM_SIZE_TO = 50000
SIM_SIZE_STEP = 1000
SIM_DELTA = 1000
TARGET_MAX_CHUNKS = 2000


@dataclass
class SelfSimJob:
    node: str  # attachment node
    child: str  # immediate child supplying the A genome
    a_taxon: str  # mappable descendant mapped as reads
    b_taxa: List[str]  # mappable descendants of the other children


def mappable_filtered_taxonomy(taxonomy: Taxonomy, mappable: Set[str]) -> Set[str]:
    """Nodes with at least one mappable descendant-or-self
    (taxTree::removeUnmappableParts)."""
    keep = set()
    for t in mappable:
        if taxonomy.know_node(t):
            keep.update(taxonomy.get_upward_nodes(t))
    return keep


def enumerate_attachment_nodes(taxonomy: Taxonomy, kept: Set[str]) -> List[str]:
    """Descendants (incl. self) of species/genus/family-ranked nodes having
    >1 (kept) child (taxTree.pm:863-896)."""
    out = set()
    for node_id in kept:
        rank = taxonomy.get_node(node_id).rank
        if rank in ("species", "genus", "family"):
            for cand in [node_id] + [
                d for d in taxonomy.descendants(node_id) if d in kept
            ]:
                children = [c for c in taxonomy.get_node(cand).children if c in kept]
                if len(children) > 1:
                    out.add(cand)
    return sorted(out)


def enumerate_jobs(taxonomy: Taxonomy, mappable: Set[str]) -> List[SelfSimJob]:
    """(taxTree::getSubComputationsForAttachment, taxTree.pm:898-944)"""
    kept = mappable_filtered_taxonomy(taxonomy, mappable)
    jobs: List[SelfSimJob] = []
    for node in enumerate_attachment_nodes(taxonomy, kept):
        children = sorted(c for c in taxonomy.get_node(node).children if c in kept)
        mappable_per_child = {}
        for c in children:
            cand = [c] + taxonomy.descendants(c)
            mappable_per_child[c] = sorted(t for t in cand if t in mappable)
            assert mappable_per_child[c], (node, c)
        for c in children:
            others = []
            for c2 in children:
                if c2 != c:
                    others.extend(mappable_per_child[c2])
            for a in mappable_per_child[c]:
                jobs.append(SelfSimJob(node, c, a, sorted(others)))
    return jobs


def prepare(db_dir: str, out_dir: str) -> List[SelfSimJob]:
    """Enumerate and persist jobs (mode prepareFromScratch)."""
    os.makedirs(out_dir, exist_ok=True)
    taxon_info = load_relevant_taxon_info(db_dir, set())
    taxonomy = Taxonomy(os.path.join(db_dir, "taxonomy"))
    jobs = enumerate_jobs(taxonomy, set(taxon_info))
    with open(os.path.join(out_dir, "jobs.json"), "w") as f:
        json.dump([asdict(j) for j in jobs], f, indent=1)
    return jobs


def load_jobs(out_dir: str) -> List[SelfSimJob]:
    with open(os.path.join(out_dir, "jobs.json")) as f:
        return [SelfSimJob(**d) for d in json.load(f)]


def _chunk_positions(contigs, lengths, delta, max_chunks, rng):
    """Chunk sampling per length (getChunkPositions,
    estimateSelfSimilarity.pl:769-841); sampling uses numpy RNG instead of
    Perl srand but follows the same start-rate thinning."""
    out = []  # (length, contig_idx, pos)
    for L in lengths:
        eligible = sum(
            max(0, (len(seq) - L) // delta + 1) for _, seq in contigs if len(seq) >= L
        )
        rate = 1.0 if eligible <= max_chunks else max_chunks / eligible
        for ci, (_, seq) in enumerate(contigs):
            for pos in range(0, len(seq) - L + 1, delta):
                if rate >= 1.0 or rng.random() <= rate:
                    out.append((L, ci, pos))
    return out


def run_job(
    db_dir: str,
    job: SelfSimJob,
    out_dir: str,
    job_index: int,
    sim_from: int = SIM_SIZE_FROM,
    sim_to: int = SIM_SIZE_TO,
    sim_step: int = SIM_SIZE_STEP,
    sim_delta: int = SIM_DELTA,
    max_chunks: int = TARGET_MAX_CHUNKS,
    percentage_identity: float = 80.0,
):
    """Execute one leave-one-out mapping job; writes results/<i>.json with
    {chunkLength: {identityInt: count}} over mapped chunks."""
    taxon_info = load_relevant_taxon_info(db_dir, set())
    a_contig_ids = set(taxon_info[job.a_taxon])
    b_contig_ids = set()
    for t in job.b_taxa:
        b_contig_ids.update(taxon_info[t])

    a_contigs = []
    b_contigs = []
    for name, seq in read_sequences(os.path.join(db_dir, "DB.fa")):
        if name in a_contig_ids:
            a_contigs.append((name, seq))
        elif name in b_contig_ids:
            b_contigs.append((name, seq))

    rng = np.random.default_rng(abs(hash(";".join(sorted(a_contig_ids)))) % 2**32)
    lengths = list(range(sim_from, sim_to + 1, sim_step))
    chunks = _chunk_positions(a_contigs, lengths, sim_delta, max_chunks, rng)

    histogram: Dict[int, Dict[int, int]] = {}
    shard_cache: Dict[int, SketchShard] = {}
    reference_size = sum(len(s) for _, s in b_contigs)

    by_length: Dict[int, List] = {}
    for L, ci, pos in chunks:
        by_length.setdefault(L, []).append((ci, pos))

    for L, items in by_length.items():
        params = Parameters(
            kmer_size=16,
            min_read_length=L,
            percentage_identity=percentage_identity,
            reference_size=max(reference_size, 1),
        ).derive_window_size()
        w = params.window_size
        if w not in shard_cache:
            shard = SketchShard()
            parts = []
            for i, (name, seq) in enumerate(b_contigs):
                h, p, s = winnow_np(seq, params.kmer_size, w)
                parts.append((h, p, s, i))
                shard.contig_names.append(name)
                shard.contig_lengths.append(len(seq))
            shard_cache[w] = shard.finalize(parts)
        shard = shard_cache[w]

        for ci, pos in items:
            chunk = a_contigs[ci][1][pos : pos + L]
            ms = mapper_oracle.report_filter(
                mapper_oracle.map_read(shard, params, chunk), report_all=False
            )
            if not ms:
                continue
            best = max(m.nuc_identity for m in ms)
            ii = int(best + 0.5)
            histogram.setdefault(L, {})[ii] = histogram.setdefault(L, {}).get(ii, 0) + 1

    os.makedirs(os.path.join(out_dir, "results"), exist_ok=True)
    with open(os.path.join(out_dir, "results", f"{job_index}.json"), "w") as f:
        json.dump({str(k): v for k, v in histogram.items()}, f)
    return histogram


def collect(db_dir: str, out_dir: str, output_file: Optional[str] = None):
    """Aggregate per-job histograms into selfSimilarities.txt (doCollect,
    estimateSelfSimilarity.pl:1218-1370); missing job results are tolerated
    (resumability contract). Also writes the expected-genome-sizes sidecar."""
    jobs = load_jobs(out_dir)
    taxon_info = load_relevant_taxon_info(db_dir, set())
    taxonomy = Taxonomy(os.path.join(db_dir, "taxonomy"))

    per_node: Dict[int, Dict[str, List[Dict[int, float]]]] = {}
    genome_lengths: Dict[str, Dict[str, int]] = {}
    for i, job in enumerate(jobs):
        genome_lengths.setdefault(job.node, {})[job.a_taxon] = sum(
            taxon_info[job.a_taxon].values()
        )
        fn = os.path.join(out_dir, "results", f"{i}.json")
        if not os.path.exists(fn):
            continue
        with open(fn) as f:
            hist = {int(k): {int(i2): c for i2, c in v.items()}
                    for k, v in json.load(f).items()}
        for L, h in hist.items():
            s = sum(h.values())
            if not s:
                continue
            per_node.setdefault(L, {}).setdefault(job.node, []).append(
                {k: v / s for k, v in h.items()}
            )

    if output_file is None:
        output_file = os.path.join(db_dir, "selfSimilarities.txt")
    with open(output_file, "w") as out:
        for L in sorted(per_node):
            for node in sorted(per_node[L]):
                combined: Dict[int, float] = {}
                for h in per_node[L][node]:
                    for k, v in h.items():
                        combined[k] = combined.get(k, 0.0) + v
                s = sum(combined.values())
                descendants_with_genomes = sorted(
                    d for d in taxonomy.descendants(node) if d in taxon_info
                )
                first = True
                for k in sorted(combined):
                    src = ";".join(descendants_with_genomes) if first else ""
                    rank = taxonomy.get_node(node).rank if first else ""
                    name = taxonomy.get_node(node).scientific_name if first else ""
                    out.write(
                        f"{node}\t{L}\t{k}\t{combined[k]/s:.10g}\t{src}\t{rank}\t{name}\n"
                    )
                    first = False

    with open(output_file + ".expectedGenomeSizes", "w") as out:
        out.write("targetNode\texpectedGenomeSize\tsourceNodes\tsourceGenomeSizes\n")
        for node in sorted(genome_lengths):
            sources = sorted(genome_lengths[node])
            lengths = [genome_lengths[node][s] for s in sources]
            out.write(
                f"{node}\t{np.mean(lengths):.10g}\t{';'.join(sources)}\t"
                f"{';'.join(map(str, lengths))}\n"
            )
    return output_file


def estimate_self_similarity(db_dir: str, out_dir: Optional[str] = None, **job_kwargs):
    """Run prepare + all jobs + collect in-process (small DBs / tests)."""
    if out_dir is None:
        out_dir = os.path.join(db_dir, "selfSimilarity")
    jobs = prepare(db_dir, out_dir)
    for i, job in enumerate(jobs):
        run_job(db_dir, job, out_dir, i, **job_kwargs)
    return collect(db_dir, out_dir)
