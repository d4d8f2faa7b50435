"""Broad randomized agreement test between the batch engine and the sequential
engine: SNPs, indels, reverse strand, ambiguous bases, unalignable reads."""

import numpy as np
import pytest

from mapper_tpu import Api, AlignmentParameters, basepairs
from mapper_tpu.align.query import Query
from mapper_tpu.align.worker import AlignerWorker
from mapper_tpu.batch.engine import BatchAligner
from mapper_tpu.sequence import Sequence


def random_text(n, rng):
    return "".join(rng.choice(list("ACGT"), size=n))


def summarize(result):
    out = []
    for choice in result.get_first_alignments():
        comp = choice.get_component(0)
        out.append(
            (
                comp.get_sequence_b().name,
                comp.get_start_index_b(),
                comp.is_reference_reversed(),
                round(choice.get_penalty(), 6),
                tuple(
                    (s.start_a, s.start_b, s.length_a, s.length_b)
                    for s in comp.sections
                ),
            )
        )
    return sorted(out)


def test_randomized_engine_agreement():
    rng = np.random.default_rng(777)
    ref_text = random_text(30000, rng)
    index = Api.new_database({"chrA": ref_text[:18000], "chrB": ref_text[18000:]})
    params = AlignmentParameters.defaults()

    reads = []
    for i in range(60):
        contig_start = 0 if rng.random() < 0.6 else 18000
        contig_len = 18000 if contig_start == 0 else 12000
        pos = int(rng.integers(0, contig_len - 200))
        length = int(rng.integers(120, 180))
        read = list(ref_text[contig_start + pos : contig_start + pos + length])
        kind = rng.random()
        if kind < 0.5:
            for _ in range(int(rng.integers(0, 3))):
                j = int(rng.integers(0, len(read)))
                read[j] = {"A": "C", "C": "G", "G": "T", "T": "A"}[read[j]]
        elif kind < 0.65:
            j = int(rng.integers(10, len(read) - 10))
            del read[j : j + int(rng.integers(1, 3))]
        elif kind < 0.75:
            j = int(rng.integers(10, len(read) - 10))
            read.insert(j, str(rng.choice(list("ACGT"))))
        elif kind < 0.85:
            j = int(rng.integers(0, len(read)))
            read[j] = "N"
        else:
            read = list(random_text(length, rng))  # unalignable
        text = "".join(read)
        if rng.random() < 0.5:
            text = basepairs.decode(basepairs.reverse_complement(basepairs.encode(text)))
        reads.append(Sequence.from_text(f"r{i}", text))

    sequential = AlignerWorker(index, params)
    engine = BatchAligner(index, params)
    batch_results = engine.process_batch([Query(r) for r in reads])
    mismatches = []
    for i, read in enumerate(reads):
        expected = summarize(sequential.align(Query(read)))
        got = summarize(batch_results[i])
        if got != expected:
            mismatches.append((i, got, expected))
    assert not mismatches, mismatches[:3]
