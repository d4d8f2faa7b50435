"""The batch engine's columnar lazy emission (LazyUngappedAlignments) must be
indistinguishable from eager materialization everywhere it flows:

- materializing the lazy result yields the same objects the eager loop built
  (content keys + penalties, pinned against the sequential worker by
  tests/test_engine_agreement.py);
- SamWriter's columnar fast path writes byte-identical rows;
- MatchDatabase's columnar intake produces identical pileups.
"""

import io

import numpy as np

from mapper_tpu import AlignmentParameters, Api
from mapper_tpu.align.query import Query
from mapper_tpu.batch.engine import BatchAligner
from mapper_tpu.sequence import Sequence


def _simulate(n_reads=300, seed=5):
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    ref_text = "".join(rng.choice(bases, size=60_000))
    reads = []
    for i in range(n_reads):
        pos = int(rng.integers(0, 60_000 - 150))
        read = np.array(list(ref_text[pos : pos + 150]))
        snps = rng.random(150) < 0.02
        read[snps] = bases[rng.integers(0, 4, size=int(snps.sum()))]
        text = "".join(read)
        if rng.random() < 0.5:
            from mapper_tpu import basepairs

            text = basepairs.decode(basepairs.reverse_complement(basepairs.encode(text)))
        reads.append(Sequence.from_text(f"r{i}", text))
    return ref_text, reads


def _run(ref_text, reads):
    index = Api.new_database({"chr1": ref_text})
    engine = BatchAligner(index, AlignmentParameters.defaults())
    return index, engine.process_batch([Query(r) for r in reads])


def test_lazy_results_present_and_materialize():
    ref_text, reads = _simulate()
    from mapper_tpu.align.blocks import LazyUngappedAlignments

    index, results = _run(ref_text, reads)
    lazy = [r for r in results if isinstance(r, LazyUngappedAlignments)]
    assert len(lazy) > len(reads) * 0.8  # clean data: the majority path
    for r in lazy:
        choices = r.get_first_alignments()  # materializes
        assert len(choices) == len(r.rows)
        for choice, (rev, ref, off, pen) in zip(choices, r.rows):
            comp = choice.get_component(0)
            assert comp.get_penalty() == pen
            assert comp.get_start_index_b() == off
            assert comp.is_reference_reversed() == bool(rev)
            assert comp.get_sequence_b() is ref


def test_sam_columnar_rows_byte_identical():
    from mapper_tpu.io.sam import SamWriter

    ref_text, reads = _simulate(seed=6)
    index, results = _run(ref_text, reads)
    seq_db = index.hashblock_database.get_sequence_database()

    fast = io.StringIO()
    SamWriter(seq_db, fast, contains_paired_end=False).add_alignments(results)

    # force materialization, then write again through the object path
    for r in results:
        if r is not None:
            r.get_alignments()
    slow = io.StringIO()
    SamWriter(seq_db, slow, contains_paired_end=False).add_alignments(results)
    assert fast.getvalue() == slow.getvalue()


def test_pileup_columnar_intake_identical():
    from mapper_tpu.pileup import MatchDatabase

    ref_text, reads = _simulate(seed=7)
    index, results = _run(ref_text, reads)

    fast_db = MatchDatabase(0.1)
    fast_db.add_alignments(results)
    fast = fast_db.group_by_position()

    for r in results:
        if r is not None:
            r.get_alignments()  # materialize -> object intake path
    slow_db = MatchDatabase(0.1)
    slow_db.add_alignments(results)
    slow = slow_db.group_by_position()

    assert list(fast.keys()) == list(slow.keys())
    for seq in fast:
        np.testing.assert_array_equal(fast[seq].middle, slow[seq].middle)
        np.testing.assert_array_equal(fast[seq].end, slow[seq].end)
