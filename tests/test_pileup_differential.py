"""The differential fast-path accumulation (pileup.py::_flush_fast) must be
float-for-float identical to the generic buffered path for every weight and
strand combination it takes over."""

import numpy as np

from mapper_tpu import basepairs
from mapper_tpu.align.blocks import (
    AlignedBlock,
    QueryAlignment,
    QueryAlignments,
    new_sequence_alignment,
)
from mapper_tpu.align.params import AlignmentParameters
from mapper_tpu.pileup import MatchDatabase
from mapper_tpu.sequence import Sequence


def _random_alignments(seed, num_choices_options=(1,)):
    rng = np.random.default_rng(seed)
    params = AlignmentParameters.defaults()
    ref_text = "".join(rng.choice(list("ACGT"), size=3000))
    contig = Sequence.from_text("c", ref_text)
    rc_contig = contig.reverse_complement()
    results = []
    for i in range(200):
        length = int(rng.integers(40, 150))
        off = int(rng.integers(0, len(ref_text) - length))
        text = list(ref_text[off : off + length])
        for _ in range(int(rng.integers(0, 4))):
            text[int(rng.integers(0, length))] = "ACGT"[int(rng.integers(0, 4))]
        folded = rng.random() < 0.5
        if folded:
            # alignment against the RC contig at mirrored coordinates
            seq_a = Sequence.from_text(f"r{i}", basepairs.decode(
                basepairs.reverse_complement(basepairs.encode("".join(text)))))
            start_b = len(ref_text) - off - length
            ref = rc_contig
        else:
            seq_a = Sequence.from_text(f"r{i}", "".join(text))
            start_b = off
            ref = contig
        block = AlignedBlock(seq_a, ref, 0, start_b, length, length)
        alignment = new_sequence_alignment([block], folded, params)
        n_choices = int(rng.choice(num_choices_options))
        choices = [QueryAlignment(alignment) for _ in range(n_choices)]
        results.append(QueryAlignments.single_component([seq_a], choices))
    return contig, results


def _pileups(results, force_generic):
    db = MatchDatabase(0.1)
    if force_generic:
        # route every clean emission through the generic buffered path
        original = db._accumulate_choice

        def generic(choice, weight):
            for seq_alignment in choice.get_components():
                db._accumulate_sequence(seq_alignment, weight, None)

        db._accumulate_choice = generic
    db.add_alignments(results)
    return db.group_by_position()


def _assert_equal(p1, p2, exact=True):
    assert set(id(s) for s in p1) == set(id(s) for s in p2)
    for seq, a in p1.items():
        b = p2[seq]
        if exact:
            np.testing.assert_array_equal(a.middle, b.middle)
            np.testing.assert_array_equal(a.end, b.end)
        else:
            # non-dyadic weights (1/3-choice) sum in a different association
            # order between the grouped scatter and the buffered path — a
            # pre-existing property of grouping, bounded by float64 epsilon
            np.testing.assert_allclose(a.middle, b.middle, rtol=0, atol=1e-9)
            np.testing.assert_allclose(a.end, b.end, rtol=0, atol=1e-9)


def test_differential_fast_path_matches_generic_weight_1():
    contig, results = _random_alignments(1, (1,))
    _assert_equal(_pileups(results, False), _pileups(results, True))


def test_differential_fast_path_matches_generic_mixed_weights():
    # 2 choices -> weight 0.5 (dyadic, differential); 3 -> 1/3 (non-dyadic,
    # stays on the direct scatter)
    contig, results = _random_alignments(2, (1, 2, 3))
    _assert_equal(_pileups(results, False), _pileups(results, True), exact=False)
