"""Golden cases transcribed from the reference's remaining component tests
(VERDICT r4 #7): HashBlockAligner_Test.java (sub-chain alignments),
Counting_HashBlockPath_Test.java (walk/vote behavior), and
HashBlockPaths_Counter_Test.java (pair distances).  Each test cites the
upstream file:line it reproduces; our equivalents run through the exact
engine's public classes (local_align covers the
HashBlock_Aligner(StraightAligner(PathAligner_Runner)) sub-chain — the
aligner chain's outer stages only bound/prune, never change the optimum)."""

import numpy as np
import pytest

from mapper_tpu import Api, basepairs
from mapper_tpu.align.candidates import (
    CountingHashBlockPath,
    PathsCounter,
)
from mapper_tpu.align.dp import AlignmentAnalysis, local_align
from mapper_tpu.align.params import AlignmentParameters
from mapper_tpu.sequence import Sequence


def _hba_params(**overrides):
    """HashBlockAligner_Test.makeParameters (java:86-99)."""
    p = AlignmentParameters(
        mutation_penalty=1.0,
        insertion_start_penalty=1.5,
        insertion_extension_penalty=0.6,
        deletion_start_penalty=1.5,
        deletion_extension_penalty=0.5,
        max_error_rate=0.1,
        ambiguity_penalty=0.1,
        unaligned_penalty=0.1,
        max_num_matches=1,
    )
    for k, v in overrides.items():
        setattr(p, k, v)
    return p


def _align(query_text, ref_text, expected_penalty, params):
    """HashBlockAligner_Test.check (java:55-66): offset-0 SequenceMatch over
    the whole reference, analysis budgets set to the expected penalty."""
    a = Sequence.from_text("a", query_text)
    b = Sequence.from_text("b", ref_text)
    analysis = AlignmentAnalysis(
        predicted_best_offset=0,
        confident_about_best_offset=False,
        max_insertion_extension_penalty=expected_penalty,
        max_deletion_extension_penalty=expected_penalty,
    )
    return local_align(a, b, 0, len(a), 0, len(b), params, analysis)


def _check(result, aligned_a, aligned_b, expected_penalty):
    assert result is not None
    assert result.get_aligned_text_a() == aligned_a
    assert result.get_aligned_text_b() == aligned_b
    assert abs(result.get_penalty() - expected_penalty) <= 0.000001


def test_query_with_long_insertion():
    # HashBlockAligner_Test.testQueryWithLongInsertion (java:10-17)
    query = "GAGTGTCAATGACTGTTCGGCAACGGACATACTCCCGAACAGTCATTGACACTCCGTCCCACTCACGGAGAAGAGATTCTGCTGCAACCGGGCATCAACT"
    ref = "AAAAAAAAACAGCGCAAAGAGCTGTTCGGCAACGGACATACTCCCGAATAGTCCTTGACACTCCGTCCCACTCACGGAGAAGAGATGCTGCTGCAACCGGGCATCAACTAAAAAAAAA"
    aligned_ref = "GAG---------CTGTTCGGCAACGGACATACTCCCGAATAGTCCTTGACACTCCGTCCCACTCACGGAGAAGAGATGCTGCTGCAACCGGGCATCAACT"
    _check(_align(query, ref, 9.9, _hba_params()), query, aligned_ref, 9.9)


def test_insertion_covering_three_hashblocks():
    # HashBlockAligner_Test.testInsertionCoveringThreeHashblocks (java:19-26)
    query = "CACGCACAATGGCATGACAGCCAACAACAAAAGTAAAAAAATCGATTTTGTTCGCATGGTAGTATTAATAGGTTTATTGATGAAGCAAAGTGTGTCTCTTAAAGAAAT"
    ref = "AAAAAAAAACACGCACAATGGCATGACAGCCAACAACAAAAGTAAAAAAATCGATTTTGTTCGCATGGTAGTATTAATAGGTTTATTGATGAAGCAAAGTAAAGAAATAAATCACTTTCCCGCCAAATTTAAAAAAAAA"
    aligned_ref = "CACGCACAATGGCATGACAGCCAACAACAAAAGTAAAAAAATCGATTTTGTTCGCATGGTAGTATTAATAGGTTTATTGATGAAGCAAAG---------TAAAGAAAT"
    _check(_align(query, ref, 6.9, _hba_params()), query, aligned_ref, 6.9)


def test_query_extending_past_end_of_reference():
    # HashBlockAligner_Test.testQueryExtendingPastEndOfReference (java:28-37)
    query = "TTTGATTCCTGTCTGATTCCCGTTCAATTCCCGCCAAGGTCCCACCGAGTTTTTTGCTTAAACCCCGTTTAATTTGCGTCAAGTTCCCGTTAAACTCCCT"
    ref = "TTTGATTCCTGTCTGATTCCCG"
    _check(
        _align(query, ref, 7.8, _hba_params(max_error_rate=0.09)), ref, ref, 7.8
    )


def test_query_aligned_to_middle_of_reference():
    # HashBlockAligner_Test.testQueryAlignedToMiddleOfReference (java:39-48)
    query = "AACGT"
    ref = "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAACGTAAAAAAAAAAAAAA"
    _check(_align(query, ref, 0.0, _hba_params(max_error_rate=0.5)), query, query, 0.0)


# --- Counting_HashBlockPath_Test.java ---------------------------------------


def _chp_params():
    """`new AlignmentParameters()` with only DeletionExtension_Penalty = 0.1
    (Counting_HashBlockPath_Test.makePath, java:65-75): every other field is
    Java's zero default."""
    return AlignmentParameters(
        mutation_penalty=0.0,
        insertion_start_penalty=0.0,
        insertion_extension_penalty=0.0,
        deletion_start_penalty=0.0,
        deletion_extension_penalty=0.1,
        max_error_rate=0.0,
        unaligned_penalty=0.0,
        ambiguity_penalty=0.0,
        max_num_matches=0,
        max_penalty_span=0.0,
    )


def _make_path(query_text, ref_text):
    index = Api.new_database({"reference": ref_text})
    query = Sequence.from_text("query", query_text)
    return CountingHashBlockPath(
        index.hashblock_database, query, _chp_params(), "query"
    )


def _good_counters(path, max_priority):
    return path.find_good_positions_having_priority_up_to(max_priority)


def test_efficiently_handles_repetition_in_query():
    # Counting_HashBlockPath_Test.checkEfficientlyHandlesRepetitionInQuery
    # (java:11-22): a homopolymer query against an unrelated reference must
    # not spray candidate offsets
    path = _make_path(
        "GGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGGG",
        "GGGGGGGGACGTTGCAAACCGGTTATGCTGCAAATTGGCC",
    )
    assert _good_counters(path, 40) == []


def test_one_hashblock_match_sufficient_near_end_of_reference():
    # checkOneHashblockMatchSufficientNearEndOfReference (java:24-37): the
    # contig-edge single-match acceptance must surface offset 12
    path = _make_path("CCCTTAAGGACCGTGTGAGAACGAC", "ACGTAAGTACGAGCCGTAAGGTCCC")
    counters = _good_counters(path, 25)
    assert any(c.match.offset == 12 for c in counters)


def test_poor_alignment_insufficient_even_near_end_of_reference():
    # checkPoorAlignmentInsufficientEvenNearEndOfReference (java:39-54)
    path = _make_path("GGACCCGG", "ACCCACCCACCCACCCACCC")
    assert _good_counters(path, 8) == []


# --- HashBlockPaths_Counter_Test.java ---------------------------------------


def _rc(text):
    return basepairs.decode(basepairs.reverse_complement(basepairs.encode(text)))


def _get_matches(ref_text, seq1_text, seq2_text):
    """HashBlockPaths_Counter_Test.getMatches (java:63-85): mate 2 is stored
    reverse-complemented, expectedInnerDistance 10, maxInnerDistance 20."""
    index = Api.new_database({"ref": ref_text})
    q1 = Sequence.from_text("seq1", seq1_text)
    q2 = Sequence.from_text("seq2", _rc(seq2_text))
    components = [
        CountingHashBlockPath(index.hashblock_database, q1, _chp_params(), "fwd-query"),
        CountingHashBlockPath(index.hashblock_database, q2, _chp_params(), "rev-query"),
    ]
    counter = PathsCounter(components, 10, 20)
    return counter.find_good_positions_having_priority(0)


def test_computes_distance_correctly():
    # checkComputesDistanceCorrectly (java:12-19)
    matches = _get_matches("GGGGGACGTGGGGGGAACTAAGGGG", "GACGTG", "AACTAAG")
    assert len(matches) == 1
    assert matches[0].get_total_distance_between_components() == 5
    assert matches[0].get_total_distance_across() == 18


def test_reverse_complement_alignment():
    # checkReverseComplementAlignment (java:21-27)
    matches = _get_matches(_rc("GGGGGACGTGGGGGGAACTAAGGGG"), "GACGTG", "AACTAAG")
    assert len(matches) == 1
    assert matches[0].get_total_distance_between_components() == 5
    assert matches[0].get_total_distance_across() == 18


def test_overlapping_distance():
    # checkOverlappingDistance (java:29-35)
    matches = _get_matches("GGGGAACCACTGGGGG", "GAACCACTG", "CCACTGGGG")
    assert len(matches) == 1
    assert matches[0].get_total_distance_between_components() == -6
    assert matches[0].get_total_distance_across() == 12


def test_multiple_matches():
    # checkMultipleMatches (java:37-46)
    ref = "GGGGGAACAGTGGGGGGAACTAAGGGGAATTGTATATAGCG"
    matches = _get_matches(ref + ref, "GAACAGTG", "AACTAAGGGGAA")
    assert len(matches) == 2
