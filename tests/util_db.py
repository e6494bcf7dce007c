"""Mini database fixture builder for end-to-end tests.

Produces a MetaMaps-format DB directory: DB.fa (kraken:taxid contig names),
taxonInfo.txt, taxonomy/{names,nodes,merged}.dmp, and
contigNstats_windowSize_1000.txt.
"""
import os

import numpy as np

from util_sim import random_genome

WINDOW = 1000


def _windows_for_len(length):
    n = length // WINDOW
    if n == 0:
        return 1
    if n * WINDOW != length:
        return n + 1
    return n


def make_mini_db(path, rng, n_genomes=3, genome_len=60000):
    os.makedirs(os.path.join(path, "taxonomy"), exist_ok=True)
    genomes = [random_genome(rng, genome_len + 137 * i) for i in range(n_genomes)]

    species_ids = [1000 + i for i in range(n_genomes)]
    genus_ids = [100 + i for i in range(n_genomes)]
    contig_names = []

    with open(os.path.join(path, "DB.fa"), "w") as fa, open(
        os.path.join(path, "taxonInfo.txt"), "w"
    ) as ti, open(
        os.path.join(path, "contigNstats_windowSize_1000.txt"), "w"
    ) as ns:
        for i, g in enumerate(genomes):
            name = f"C{i}|kraken:taxid|{species_ids[i]}|ACC{i}.1"
            contig_names.append(name)
            fa.write(f">{name}\n")
            seq = g.tobytes().decode()
            for j in range(0, len(seq), 80):
                fa.write(seq[j : j + 80] + "\n")
            ti.write(f"{species_ids[i]} {name}={len(g)}\n")
            nw = _windows_for_len(len(g))
            counts = [
                int(np.sum(g[w * WINDOW : (w + 1) * WINDOW] == ord("N")))
                for w in range(nw)
            ]
            ns.write(f"{species_ids[i]}\t{name}\t" + ";".join(map(str, counts)) + "\n")

    def dmp_line(*fields):
        return "\t|\t".join(str(f) for f in fields) + "\t|\n"

    with open(os.path.join(path, "taxonomy", "names.dmp"), "w") as f:
        f.write(dmp_line(1, "all", "", "scientific name"))
        f.write(dmp_line(2, "Bacteria", "", "scientific name"))
        f.write(dmp_line(10, "TestPhylum", "", "scientific name"))
        f.write(dmp_line(20, "TestOrder", "", "scientific name"))
        f.write(dmp_line(30, "TestFamily", "", "scientific name"))
        for i in range(n_genomes):
            f.write(dmp_line(genus_ids[i], f"Genus{i}", "", "scientific name"))
            f.write(dmp_line(species_ids[i], f"Species{i}", "", "scientific name"))

    with open(os.path.join(path, "taxonomy", "nodes.dmp"), "w") as f:
        f.write(dmp_line(1, 1, "no rank"))
        f.write(dmp_line(2, 1, "superkingdom"))
        f.write(dmp_line(10, 2, "phylum"))
        f.write(dmp_line(20, 10, "order"))
        f.write(dmp_line(30, 20, "family"))
        for i in range(n_genomes):
            f.write(dmp_line(genus_ids[i], 30, "genus"))
            f.write(dmp_line(species_ids[i], genus_ids[i], "species"))

    with open(os.path.join(path, "taxonomy", "merged.dmp"), "w") as f:
        f.write("")

    return genomes, contig_names, species_ids


def write_reads_fastq(path, reads, prefix="read"):
    """reads: list of (seq, ...) tuples; writes FASTQ with dummy quality."""
    with open(path, "w") as f:
        for i, entry in enumerate(reads):
            seq = entry[0]
            f.write(f"@{prefix}{i}\n")
            f.write(seq.tobytes().decode() + "\n")
            f.write("+\n")
            f.write("I" * len(seq) + "\n")
