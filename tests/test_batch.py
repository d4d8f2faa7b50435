"""Batch engine tests: agreement with the exact sequential engine on simulated
read sets."""

import numpy as np
import pytest

from mapper_tpu import Api, AlignmentParameters, basepairs
from mapper_tpu.align.query import Query
from mapper_tpu.align.worker import AlignerWorker
from mapper_tpu.batch.candidates import ReadBatch, generate_candidates
from mapper_tpu.batch.engine import BatchAligner
from mapper_tpu.sequence import Sequence


def random_text(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def sim():
    ref_text = random_text(5000, 100)
    index = Api.new_database({"chr1": ref_text})
    rng = np.random.default_rng(101)
    reads = []
    truths = []
    for i in range(40):
        pos = int(rng.integers(0, 5000 - 150))
        read = list(ref_text[pos : pos + 150])
        num_snps = int(rng.integers(0, 3))
        for _ in range(num_snps):
            j = int(rng.integers(0, 150))
            read[j] = {"A": "C", "C": "G", "G": "T", "T": "A"}[read[j]]
        text = "".join(read)
        reverse = bool(rng.random() < 0.4)
        if reverse:
            text = basepairs.decode(basepairs.reverse_complement(basepairs.encode(text)))
        reads.append(Sequence.from_text(f"r{i}", text))
        truths.append((pos, reverse))
    return index, reads, truths


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
            )
        )
    return sorted(out)


def test_batch_candidates_find_true_positions(sim):
    index, reads, truths = sim
    batch = ReadBatch.from_sequences(reads)
    table = generate_candidates(batch, index.hashblock_database)
    found = 0
    for i, (pos, reverse) in enumerate(truths):
        rows = np.nonzero(table.read_id == i)[0]
        offsets = table.offset[rows][table.reversed_[rows] == reverse]
        if pos in offsets.tolist():
            found += 1
    assert found == len(truths)


def test_batch_engine_matches_sequential(sim):
    index, reads, truths = sim
    params = AlignmentParameters.defaults()
    sequential = AlignerWorker(index, params)
    batch_engine = BatchAligner(index, params)
    queries = [Query(read) for read in reads]
    batch_results = batch_engine.process_batch(queries)
    for i, query in enumerate(queries):
        expected = summarize(sequential.align(Query(reads[i])))
        got = summarize(batch_results[i])
        assert got == expected, f"read {i} (truth {truths[i]}): {got} != {expected}"


def test_batch_engine_finds_true_position(sim):
    index, reads, truths = sim
    params = AlignmentParameters.defaults()
    batch_engine = BatchAligner(index, params)
    results = batch_engine.process_batch([Query(read) for read in reads])
    for i, (pos, reverse) in enumerate(truths):
        rows = summarize(results[i])
        assert any(r[1] == pos and r[2] == reverse for r in rows), (i, rows, truths[i])


def test_batch_engine_paired_path():
    ref_text = random_text(1000, 7)
    index = Api.new_database({"chr": ref_text})
    params = AlignmentParameters.defaults()
    engine = BatchAligner(index, params)
    mate1 = Sequence.from_text("m1", ref_text[100:200])
    mate2_codes = basepairs.reverse_complement(basepairs.encode(ref_text[260:360]))
    mate2 = Sequence.from_text("m2", basepairs.decode(mate2_codes))
    query = Query([mate1, mate2], expected_inner_distance=60, spacing_deviation_per_unit_penalty=50)
    results = engine.process_batch([query])
    alignments = results[0].get_first_alignments()
    assert len(alignments) == 1
    assert alignments[0].get_component(0).get_start_index_b() == 100
    assert alignments[0].get_component(1).get_start_index_b() == 260
    assert engine.stats_fallback_reads == 0  # handled by the paired batch path


def test_batch_engine_paired_matches_sequential():
    ref_text = random_text(20000, 70)
    index = Api.new_database({"chr": ref_text})
    params = AlignmentParameters.defaults()
    rng = np.random.default_rng(71)
    queries = []
    for i in range(20):
        pos = int(rng.integers(0, 20000 - 400))
        frag_len = int(rng.integers(250, 400))
        frag = list(ref_text[pos : pos + frag_len])
        for _ in range(int(rng.integers(0, 3))):
            j = int(rng.integers(0, frag_len))
            frag[j] = {"A": "C", "C": "G", "G": "T", "T": "A"}[frag[j]]
        frag = "".join(frag)
        m1 = frag[:150]
        m2_codes = basepairs.reverse_complement(basepairs.encode(frag[-150:]))
        m1_seq = Sequence.from_text(f"p{i}/1", m1)
        m2_seq = Sequence.from_text(f"p{i}/2", basepairs.decode(m2_codes))
        queries.append(
            Query([m1_seq, m2_seq], expected_inner_distance=25, spacing_deviation_per_unit_penalty=50)
        )
    engine = BatchAligner(index, params)
    sequential = AlignerWorker(index, params)
    batch_results = engine.process_batch(queries)

    def summarize_pair(result):
        out = []
        for choice in result.get_first_alignments():
            out.append(
                tuple(
                    (
                        c.get_sequence_b().name,
                        c.get_start_index_b(),
                        c.is_reference_reversed(),
                    )
                    for c in choice.get_components()
                )
                + (round(choice.get_penalty(), 6),)
            )
        return sorted(out)

    for i, query in enumerate(queries):
        expected = summarize_pair(sequential.align(query))
        got = summarize_pair(batch_results[i])
        assert got == expected, f"pair {i}: {got} != {expected}"
