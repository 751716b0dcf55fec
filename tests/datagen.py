"""Deterministic synthetic Illumina dataset generator for tests/benches.

Produces a random genome and error-bearing reads with quality strings,
written as FASTQ.  Everything is seeded so test fixtures are stable.
"""

from __future__ import annotations

import gzip
import random
from typing import List, Optional, Tuple

BASES = "ACGT"
COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def revcomp(s: str) -> str:
    return "".join(COMP[c] for c in reversed(s))


def make_genome(length: int, seed: int = 7) -> str:
    rng = random.Random(seed)
    return "".join(rng.choice(BASES) for _ in range(length))


def simulate_reads(
    genome: str,
    n_reads: int,
    read_len: int = 100,
    err_rate: float = 0.01,
    n_rate: float = 0.0005,
    seed: int = 11,
) -> List[Tuple[str, str]]:
    """Uniformly sampled reads with substitution errors and rare Ns.

    Error bases get low quality most of the time (quality correlates
    with correctness, as on a real instrument, but imperfectly)."""
    rng = random.Random(seed)
    reads = []
    glen = len(genome)
    for _ in range(n_reads):
        pos = rng.randrange(0, glen - read_len)
        frag = genome[pos : pos + read_len]
        if rng.random() < 0.5:
            frag = revcomp(frag)
        seq = list(frag)
        qual = []
        for i in range(read_len):
            is_err = rng.random() < err_rate
            if is_err:
                cur = seq[i]
                seq[i] = rng.choice([b for b in BASES if b != cur])
                q = rng.choice("##$%&'()*+,-./01")  # q 2..16 mostly
                if rng.random() < 0.1:
                    q = rng.choice("?@ABCDEF")  # occasionally high-q error
            else:
                q = rng.choice("?@ABCDEFGHI")  # q 30..40
                if rng.random() < 0.05:
                    q = rng.choice("+,-./456")  # occasionally low-q correct base
            qual.append(q)
            if rng.random() < n_rate:
                seq[i] = "N"
        reads.append(("".join(seq), "".join(qual)))
    return reads


def write_fastq(path: str, reads, name_prefix: str = "r", gz: bool = False) -> None:
    op = gzip.open if gz or path.endswith(".gz") else open
    with op(path, "wt") as f:
        for i, (seq, qual) in enumerate(reads):
            if qual is None:
                f.write(">%s%d\n%s\n" % (name_prefix, i, seq))
            else:
                f.write("@%s%d\n%s\n+\n%s\n" % (name_prefix, i, seq, qual))


def standard_dataset(
    tmpdir: str,
    genome_len: int = 20000,
    n_reads: int = 8000,
    read_len: int = 100,
    err_rate: float = 0.01,
    seed: int = 7,
    gz: bool = False,
    name: str = "reads.fq",
) -> str:
    genome = make_genome(genome_len, seed=seed)
    reads = simulate_reads(
        genome, n_reads, read_len=read_len, err_rate=err_rate, seed=seed + 4
    )
    path = f"{tmpdir}/{name}"
    write_fastq(path, reads, gz=gz)
    return path
