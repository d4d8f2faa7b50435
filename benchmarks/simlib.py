"""Shared read/reference simulation for the BASELINE.md benchmark configs.

Writes FASTA/FASTQ inputs for the CLI benchmarks (benchmarks/bench_config*.py)
— simulated Illumina-style reads over random references, the same data class
the reference's paper benchmarks use (BASELINE.md's measurement protocol).
"""

from __future__ import annotations

import gzip
import os

import numpy as np

BASES = np.array(list("ACGT"))


def random_reference(rng: np.random.Generator, size: int) -> str:
    return "".join(BASES[rng.integers(0, 4, size=size)])


def mutate(rng: np.random.Generator, read: np.ndarray, snp_rate: float) -> np.ndarray:
    snps = rng.random(read.shape[0]) < snp_rate
    k = int(snps.sum())
    if k:
        read = read.copy()
        read[snps] = BASES[rng.integers(0, 4, size=k)]
    return read


def rc_text(text: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(text))


def simulate_single(
    path: str,
    ref_text: str,
    num_reads: int,
    read_length: int = 150,
    snp_rate: float = 0.01,
    rc_fraction: float = 0.5,
    seed: int = 0,
) -> None:
    rng = np.random.default_rng(seed)
    ref = np.array(list(ref_text))
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as f:
        for i in range(num_reads):
            pos = int(rng.integers(0, len(ref_text) - read_length))
            read = mutate(rng, ref[pos : pos + read_length], snp_rate)
            text = "".join(read)
            if rng.random() < rc_fraction:
                text = rc_text(text)
            f.write(f">r{i}\n{text}\n")


def simulate_paired(
    path1: str,
    path2: str,
    ref_text: str,
    num_pairs: int,
    read_length: int = 150,
    inner_mean: int = 100,
    inner_sd: int = 30,
    snp_rate: float = 0.007,
    seed: int = 0,
) -> None:
    """Illumina FR pairs: mate1 forward, mate2 the RC of the downstream
    segment; half the fragments land on the reverse strand (mates swapped)."""
    rng = np.random.default_rng(seed)
    ref = np.array(list(ref_text))
    n = len(ref_text)
    with open(path1, "w") as f1, open(path2, "w") as f2:
        for i in range(num_pairs):
            inner = max(-read_length // 2, int(rng.normal(inner_mean, inner_sd)))
            frag = 2 * read_length + inner
            pos = int(rng.integers(0, max(1, n - frag)))
            m1 = "".join(mutate(rng, ref[pos : pos + read_length], snp_rate))
            m2_fwd = "".join(
                mutate(rng, ref[pos + read_length + inner : pos + frag], snp_rate)
            )
            m2 = rc_text(m2_fwd)
            if rng.random() < 0.5:
                # reverse-strand fragment, same FR chemistry: R1 reads the
                # right end inward (the old m2), R2 the left end (the old m1)
                m1, m2 = m2, m1
            f1.write(f">p{i}/1\n{m1}\n")
            f2.write(f">p{i}/2\n{m2}\n")


def write_reference(path: str, contigs: dict[str, str]) -> None:
    with open(path, "w") as f:
        for name, text in contigs.items():
            f.write(f">{name}\n")
            for i in range(0, len(text), 80):
                f.write(text[i : i + 80] + "\n")


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path
