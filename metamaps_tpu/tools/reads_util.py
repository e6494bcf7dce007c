"""Small read-file utilities: util/extractReads.pl and
firstQuartileScore.pl equivalents."""
from __future__ import annotations

from typing import Iterable, Set

from ..io.fasta import read_sequences


def extract_reads(reads_file: str, read_ids: Iterable[str], output_fn: str):
    """Extract the named reads into a FASTA file (util/extractReads.pl)."""
    wanted: Set[str] = set(read_ids)
    n = 0
    with open(output_fn, "w") as out:
        for name, seq in read_sequences(reads_file):
            if name in wanted:
                n += 1
                out.write(f">{name}\n{seq.tobytes().decode()}\n")
    return n


def first_quartile_quality(fastq: str):
    """First-quartile base-quality score of a FASTQ file
    (firstQuartileScore.pl): the smallest quality character q such that at
    least 25% of all base qualities are <= q. Returns (char, phred)."""
    counts = {}
    total = 0
    with open(fastq) as f:
        while True:
            header = f.readline()
            if not header:
                break
            if not header.strip():
                continue
            assert header.startswith("@"), header[:30]
            f.readline()
            plus = f.readline()
            assert plus.startswith("+")
            qual = f.readline().rstrip("\n")
            for c in qual:
                counts[c] = counts.get(c, 0) + 1
                total += 1
    running = 0
    for c in sorted(counts):
        running += counts[c] / total
        if running >= 0.25:
            return c, ord(c) - 33
    raise RuntimeError("empty FASTQ")
