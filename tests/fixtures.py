"""Synthetic genome/read fixtures — hermetic, no network, no real data.

The reference had no fixtures at all (SURVEY.md §4); here tiny random
genomes + mutated reads sampled from them give ground-truth labels for
classification tests.
"""

from __future__ import annotations

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(rng: np.random.Generator, length: int) -> str:
    return BASES[rng.integers(0, 4, size=length)].tobytes().decode()


def mutate(rng: np.random.Generator, seq: str, sub=0.05, ins=0.03, dele=0.03) -> str:
    """Apply nanopore-like errors: substitutions, insertions, deletions."""
    out = []
    for ch in seq:
        r = rng.random()
        if r < dele:
            continue
        if r < dele + sub:
            out.append("ACGT"[rng.integers(0, 4)])
        else:
            out.append(ch)
        if rng.random() < ins:
            out.append("ACGT"[rng.integers(0, 4)])
    return "".join(out)


def revcomp(seq: str) -> str:
    return seq.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def sample_reads(
    rng: np.random.Generator,
    genomes: list[str],
    n_reads: int,
    read_len: int = 1000,
    error=(0.05, 0.03, 0.03),
    rc_prob: float = 0.5,
):
    """Sample labeled reads. Returns (seqs, labels: genome index)."""
    seqs, labels = [], []
    for _ in range(n_reads):
        g = int(rng.integers(0, len(genomes)))
        genome = genomes[g]
        L = min(read_len, len(genome))
        start = int(rng.integers(0, len(genome) - L + 1))
        frag = genome[start : start + L]
        if rng.random() < rc_prob:
            frag = revcomp(frag)
        seqs.append(mutate(rng, frag, *error))
        labels.append(g)
    return seqs, labels


def make_fastq(path, seqs, ids=None):
    with open(path, "w") as fh:
        for i, s in enumerate(seqs):
            rid = ids[i] if ids else f"read{i}"
            fh.write(f"@{rid}\n{s}\n+\n{'I' * len(s)}\n")


def make_fasta_gz(path, records):
    """records: list of (name, seq)."""
    import gzip

    with gzip.open(path, "wt") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 80):
                fh.write(seq[i : i + 80] + "\n")
