"""End-to-end scenarios transcribed from the reference's AlignerWorker_Test.java
(the references, queries, parameters and expected outcomes are the upstream
fixtures; this file pins behavioral parity for the subtlest areas: paired-end
spacing/overlap penalty algebra and its rounding regressions)."""

import pytest

from mapper_tpu.align.params import AlignmentParameters
from mapper_tpu.align.query import Query
from mapper_tpu.api import Api
from mapper_tpu.sequence import Sequence, SequenceBuilder


def make_parameters(**kw):
    # AlignerWorker_Test.makeParameters (java:788-799)
    defaults = dict(
        mutation_penalty=1.0,
        insertion_start_penalty=1.5,
        insertion_extension_penalty=0.6,
        deletion_start_penalty=1.5,
        deletion_extension_penalty=0.5,
        max_error_rate=0.2,
        ambiguity_penalty=0.2,
        unaligned_penalty=0.2,
        max_penalty_span=0.0,
    )
    defaults.update(kw)
    return AlignmentParameters(**defaults)


def rc_text(text: str) -> str:
    return Sequence.from_text("t", text).reverse_complement().get_text()


def align(query, reference_text: str, parameters=None) -> list:
    if parameters is None:
        parameters = make_parameters()
    if isinstance(query, str):
        query = Query(Sequence.from_text("query", query))
    elif isinstance(query, Sequence):
        query = Query(query)
    index = Api.new_database({"ref": reference_text})
    return Api.align(query, index, parameters).get_first_alignments()


def verify_one(alignments):
    assert len(alignments) == 1, [a.format() for a in alignments]
    return alignments[0]


def test_indel_not_duplicated():
    # java:11-16
    reference = "TTAAACAGATCACCTCGCTGAGCGGGT"
    query = "TTAAACAGATCACCCGCTGAGCGGGT"
    verify_one(align(query, reference))


def test_partial_ambiguity():
    # java:19-31: among G/R/RR variants, aligning to the single-R copy is best
    reference = "AACAGGCGGT" + "AACARGCGGT" + "AACARRCGGT"
    query = "AACAAGCGGT"
    alignment = verify_one(align(query, reference))
    assert alignment.get_component(0).get_aligned_text_b() == "AACARGCGGT"


def test_hashblock_also_matching_near_end_of_contig():
    # java:41-49
    identical = "GGGGTCAC"
    query = identical + "AAAA"
    reference = identical + "CAAA" + "TCTCGGAGAGCTCGA" + query + "T"
    alignment = verify_one(align(query, reference))
    assert alignment.get_component(0).get_aligned_text_b() == query


def test_first_hashblock_multiple_good_matches():
    # java:52-61
    query = "AACGATCGGG"
    reference = "AACGATTTGG" + "AACGATCGCG" + "G"
    alignment = verify_one(align(query, reference))
    assert alignment.get_component(0).get_aligned_text_b() == "AACGATCGCG"


def test_paired_end_queries_orientation():
    # java:35-38, 712-742: pairing requires opposite mate orientation
    reference = (
        "AAAAAAAAAAACGGAAAGAAATAACTTAAACGAACTAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
        "AAAAAAAAAAACGGAAAGAAATAAA"
    )
    sequence1 = "CGGAAAGAAA"
    sequence2 = "CTTAAACGAACT"
    for reverse2, expected in ((True, 1), (False, 0)):
        seq2_text = rc_text(sequence2) if reverse2 else sequence2
        q1 = Sequence.from_text("q1", sequence1)
        q2 = Sequence.from_text("q2", seq2_text)
        assert len(align(q1, reference)) == 2
        assert len(align(q2, reference)) == 1
        combined = Query([q1, q2], expected_inner_distance=3, spacing_deviation_per_unit_penalty=1)
        got = align(combined, reference)
        assert len(got) == expected, (reverse2, [a.format() for a in got])


def test_overlapping_paired_fewer_mutations_overlapping_both():
    # java:64-98
    query1_prefix = "AACGAGTG"
    query1_mutated = "AAGGACAG"
    overlap = "AACGACGGTT"
    overlap_mutated = "AACGAGCGTT"
    query2_suffix = "AAAGACCC"
    candidate1 = query1_mutated + overlap + query2_suffix
    candidate2 = query1_prefix + overlap_mutated + query2_suffix
    reference = candidate1 + candidate2
    query1 = Sequence.from_text("query1", query1_prefix + overlap)
    query2 = Sequence.from_text("query2", rc_text(overlap + query2_suffix))
    query = Query([query1, query2], expected_inner_distance=0, spacing_deviation_per_unit_penalty=1000000)
    alignments = align(query, reference)
    assert len(alignments) == 1, [a.format() for a in alignments]
    aligned_b = alignments[0].get_component(0).get_aligned_text_b()
    assert aligned_b == query1_prefix + overlap_mutated


def test_overlapping_paired_better_than_surprising_offset():
    # java:101-144
    query1_text = "ACGTGAACCGGTTAAACCC"
    query1 = Sequence.from_text("query1", query1_text)
    query2 = Sequence.from_text("query2", rc_text(query1_text))
    separator = "ACAGTTGGCGAGCGC"
    reference = query1_text + separator + query1_text + "C"
    query = Query(
        [query1, query2],
        expected_inner_distance=0,
        spacing_deviation_per_unit_penalty=len(separator) // 2,
    )
    alignments = align(query, reference)
    assert len(alignments) == 2, [a.format() for a in alignments]
    starts = sorted(
        (a.get_component(0).get_start_index_b(), a.get_component(1).get_start_index_b())
        for a in alignments
    )
    assert starts == [(0, 0), (34, 34)]


def test_overlapping_paired_multiple_matches():
    # java:147-173
    prefix = "ACGTACGTCC"
    shared = "AACCGGTTGG"
    shared_mutated = "AACCTGTTGG"
    suffix = "AAACCCGGGTTT"
    query1 = Sequence.from_text("query1", prefix + shared)
    query2 = Sequence.from_text("query2", rc_text(shared + suffix))
    candidate = prefix + shared_mutated + suffix
    reference = "GGGG" + candidate + candidate + "TTTT"
    query = Query(
        [query1, query2],
        expected_inner_distance=0,
        spacing_deviation_per_unit_penalty=len(candidate),
    )
    alignments = align(query, reference)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_multiple_candidate_matches():
    # java:176-202
    shared = (
        "AACCGGTTCACTCGGGACACACACC"
        "ACGTCGTATTGTGCGCCGTTACAAA"
        "GTTTGTTTAGAGCCCCTTTTAGCGA"
    )
    shared_mutated = (
        "AACTGGTTCACTCGGGACACACACC"
        "ACGTCGTAATGTGCGCCGTTACAAA"
        "GTTTGTTTAGAGCCCCTCTTAGCGA"
    )
    query1 = Sequence.from_text("query1", shared)
    query2 = Sequence.from_text("query2", rc_text(shared))
    candidate = shared_mutated
    reference = "GGGG" + candidate + "AAAA" + candidate + "TTTT"
    query = Query(
        [query1, query2],
        expected_inner_distance=-len(candidate),
        spacing_deviation_per_unit_penalty=len(candidate) // 4,
    )
    alignments = align(query, reference)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_multiple_candidate_matches_2():
    # java:204-239 ("testMultipleCandidateMatches2")
    prefix = "G"
    prefix_mutated = "T"
    shared = (
        "GACATTGGCAAAGTCAACAAAGCGGAAATCAAGGAAGCCATGGACGGCGTATTGAAGAAGATGCAGGGC"
        "TTTGACTTTACCAAATTCAAGGAAGAACTTGGTAAGAGAGGTTTTAAAGTCCGGGAAGCCAGGGCAAGC"
        "ACCGGGAAACTC"
    )
    query1 = Sequence.from_text("query1", prefix + shared)
    query2 = Sequence.from_text("query2", rc_text(shared))
    candidate = prefix_mutated + shared
    reference = "C" + candidate + candidate + "TTTT"
    query = Query(
        [query1, query2],
        expected_inner_distance=-len(candidate),
        spacing_deviation_per_unit_penalty=len(candidate) // 4 // 6,
    )
    parameters = AlignmentParameters(
        mutation_penalty=6.0,
        insertion_start_penalty=9.0,
        insertion_extension_penalty=5.4,
        deletion_start_penalty=9.0,
        deletion_extension_penalty=4.5,
        max_error_rate=1.2,
        ambiguity_penalty=1.2,
        unaligned_penalty=1.2,
        max_penalty_span=0.0,
    )
    alignments = align(query, reference, parameters)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_rounding_error_1():
    # java:241-278 ("testPairedEndQueriesRoundingError")
    prefix = "AAACCCGGGTTTAAAACCCCGGGGTTTTAAAAACCCCCGGGGG"
    shared = (
        "GACATTGGCAAAGTCAACAAAGCGGAAATCAAGGAAGCCATGGACGGGGTATTGAAGAAGATGCAGGGC"
        "TTTGACTTTACCAAATTCAAGGAAGAACTTGGTAAGAG"
    )
    shared_mutated = (
        "GACATTGGCAAAGTCAACAAAGCGGAAATCAAGGAAGCCATGGACGGCGTATTGAAGAAGATGCAGGGC"
        "TTTGACTTTACCAAATTCAAGGAAGAACTTGGTAAGAG"
    )
    suffix = "AGGTTTTAAAGTCCGGGAAGCCAGGGCAAGCACCGGGAAACTC"
    alignments = run_rounding_case(
        prefix + shared_mutated, shared + suffix, prefix + shared + suffix
    )
    assert len(alignments) == 2, [a.format() for a in alignments]


ROUNDING_PARAMS = dict(
    mutation_penalty=6.0,
    insertion_start_penalty=9.0,
    insertion_extension_penalty=5.0,
    deletion_start_penalty=6.0,
    deletion_extension_penalty=5.0,
    max_error_rate=1.0,
    ambiguity_penalty=1.0,
    unaligned_penalty=1.0,
    max_penalty_span=0.0,
)


def run_rounding_case(query1_text, query2_reversed_text, candidate, params=None):
    query1 = Sequence.from_text("query1", query1_text)
    query2 = Sequence.from_text("query2", rc_text(query2_reversed_text))
    reference = "ACGT" + candidate + candidate + "ACGT"
    query = Query(
        [query1, query2],
        expected_inner_distance=-len(candidate),
        spacing_deviation_per_unit_penalty=len(candidate) // 4 // 6,
    )
    parameters = AlignmentParameters(**(params or ROUNDING_PARAMS))
    return align(query, reference, parameters)


def test_rounding_error_2():
    # java:281-317 ("testPairedEndQueriesRoundingError2")
    prefix = (
        "ATCCTTGATTTTCCCTTTAAGGGCGTTTATAATCCACCCTTTCGGATTGTTCTTTTCTCGTGATTTTCC"
        "GTTTAGGAGAGCCAGTTCTCCGATAAGGTCGGTTATCTTTTCTTGTGCCGTTATGAATGTCTCTTTGTT"
        "CCGGTTTAT"
    )
    shared = "CTC"
    suffix = (
        "TTCCGATGTGAAGCCGCAGGAATAACGGAGGTACTCGTACACATGGCTGTCTATCTGATATCGTGCTGT"
        "AACCTTTGCTTGCAATTCTTTCCCTTCCAGTTCTTCATCTCTGAACTGTGGGTGATAGACCGGGTAGAA"
        "CCTAAACC"
    )
    suffix_mutated = (
        "TTCCGATGTGAAGCCGCAGGAATAACGGAGGTACTCGTACACATGGCTGTCTATATGATATCGTGCTGT"
        "AACCTTTGCTTGCAATTCTTTCCCTTCCAGTTCTTCATCTCTGAACTGTGGGTGATAGACCGGGTAGAA"
        "CCTAAACC"
    )
    alignments = run_rounding_case(prefix + shared, shared + suffix_mutated, prefix + shared + suffix)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_rounding_error_3():
    # java:320-356
    prefix = "GAACTGGAAGGGAAAGAAT"
    shared = (
        "TGCAAGCAAAGGTTACAGCACGATATCAGATAGACAGCCATGTGTACGAGTACCTCCGTTATTCCTGCG"
        "GCTTCACATCGGAAGAGATAAACCGGAACAAAGAGACATTCATAACGGAACAAGAAAAGATA"
    )
    shared_mutated = (
        "TGCAAGCAAAGGTTACAGCACGATATCAGATAGACAGCCATGTGTACGAGTACCTCCGTTATTCCTGCG"
        "GCTTCACATCGGAAGAGATAAACCGGAACAAAGAGACATTCATAACGGCACAAGAAAAGATA"
    )
    suffix = "ACCGACCTTATCGGAGA"
    alignments = run_rounding_case(prefix + shared_mutated, shared + suffix, prefix + shared + suffix)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_rounding_error_4():
    # java:359-397
    prefix = "GAACAAGGCACATGACGGTCTGGAAAACAATCCGGGAAAAGACGGCAAACT"
    prefix_mutated = "GAACAAGGCACATGACGGTCTGGAAAACAATCCAGGAAAAGACGGCAAACT"
    shared = (
        "GTTTTCAGACAAACACCCCTACATTACTGAAGCGCATCCGGGAGCAAAAAAAGCCGTGGACGCACTGAC"
        "CAGGCGCATCAACGAAATGATAGCCGAAAT"
    )
    suffix = "GCCGGACAACCTGACGCTGGAGGAAAAAACCGACATCGCCCGCAACAATCT"
    suffix_mutated = "GTCGGACAACCTGACGCTGGAGGAAAAAACCGACATCGCCCGCAACAATCT"
    alignments = run_rounding_case(
        prefix_mutated + shared, shared + suffix_mutated, prefix + shared + suffix
    )
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_rounding_error_5():
    # java:400-437
    prefix = "TCTTTGTAGGGTGAAAGAGAAACCCATAAACGGGGATAGATTGAATGCTGGGAAGCATAAACAATC"
    shared = (
        "GGGGTAAGGTTAGCGAACCTTGCCTTTCATCCCCCATTATAACTTTACATAGAGGAACTTTATCTATCC"
        "CCCCCCGCCCCCAAA"
    )
    shared_mutated = (
        "GGGGTAAGGTTAGCGTACCTTGCCTTTGATCCCCCATTATAACTTTACATAGAGGAACTTTATCTATCC"
        "CCCCCCGCCCCCAAA"
    )
    suffix = "GGGGGAGCGACCAAACGGCAGCTTCACTCAATGGAGTGTTACAGTTCATCAAAACCAAGTGATAAC"
    alignments = run_rounding_case(prefix + shared, shared_mutated + suffix, prefix + shared + suffix)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_rounding_error_6():
    # java:440-481
    prefix = "CAATAGGGAGATAACAGCACAAAGGATTGAGTAGAACGAAATTCGTTTGTCCACATAACCGCCGTTTTTCAT"
    suffix = "TGTACCTTTCGGGCTGTTGCGTCCTCTATGCGCTTCGTATAGACTTCAACACGCTTTAGTTCTTGATACACC"
    shared_mutated = (
        "TCTGTACCCCTGCCGTTCAAAGTCCGCCAACACGTTTTTAGGCGATTTTCGGCACTTTCTAGGCTTTTCCCGTCTATT"
    )
    shared = (
        "TCTGTACCCCTGCCGTTCAAAGTCCGCCAACACGTTTTTTAGGCGATTTTCGGCACTTTCAAGGCTTTTCCCGTCTATT"
    )
    alignments = run_rounding_case(
        prefix + shared_mutated, shared_mutated + suffix, prefix + shared + suffix
    )
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_paired_overlapping_insertion():
    # java:522-560
    prefix = "TCTCGGCTGGCGGCAAGAGAAGAGAACACCTCGTGCAT"
    shared = (
        "AGGCTCGCCGTTCTCTAACCAGTAAACACAATATTCGACCATAACAGTTTTATCATTTATCGTTGTAAT"
        "GCCCCTCTACCTCCAAGATGTAGACCTCTACCACTTCCTCGTA"
    )
    shared_mutated = (
        "AGGCTCGCCGTTCTCTAACCAGTAAACACAATATTCGACCATAACAGTTTTATCATTTATCGTTGTAAT"
        "GCCCCCTCTACCTCCAAGATGTAGACCTCTACCACTTCCTCGTA"
    )
    suffix = "AATGTCATAGATTATCCGGTCATGGGCGGTAATGTGT"
    query1 = Sequence.from_text("query1", prefix + shared_mutated)
    query2 = Sequence.from_text("query2", rc_text(shared_mutated + suffix))
    candidate = prefix + shared + suffix
    reference = "ACGT" + candidate + "ACGT" + candidate + "ACGT"
    query = Query(
        [query1, query2],
        expected_inner_distance=-len(shared),
        spacing_deviation_per_unit_penalty=0.5,
    )
    params = make_parameters(max_error_rate=0.05, ambiguity_penalty=0.05, unaligned_penalty=0.05)
    alignments = align(query, reference, params)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_paired_indels_next_to_overlap():
    # java:563-599
    prefix = "AACCGGTT"
    prefix_mutated = "AACCGG"
    shared = (
        "GACATTGGCAAAGTCAACAAAGCGGAAATCAAGGAAGCCATGGACGGCGTATTGAAGAAGATGCAGGGC"
        "TTTGACTTTACCAAATTCAAGGAAGAACTTGGTAAGAGAGGTTTTAAAGTCCGGGAAGCCAGGGCAAGC"
        "ACCGGGAAACTC"
    )
    suffix = "AACCGGTT"
    suffix_mutated = "CCGGTT"
    query1 = Sequence.from_text("query1", prefix + shared)
    query2 = Sequence.from_text("query2", rc_text(shared + suffix))
    candidate = prefix_mutated + shared + suffix_mutated
    reference = "ACGT" + candidate + "ACGT" + candidate + "ACGT"
    query = Query(
        [query1, query2],
        expected_inner_distance=-len(candidate),
        spacing_deviation_per_unit_penalty=1,
    )
    params = make_parameters(max_error_rate=0.05, ambiguity_penalty=0.05, unaligned_penalty=0.05)
    alignments = align(query, reference, params)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_deletion_in_middle_with_multiple_alignments():
    # java:602-624
    prefix = "ACCGTAACAACCTCGCAGCGTCTTTCACCAAAGCTGACAATGGCGAGCAGGTACTAATTCGCA"
    deletion = "G"
    suffix = (
        "GAAAAACGAGATTTACGCTTTGGTAAAAGTTGGTCGTGAAGATTTGATGATAACCCCGGAGCTGCAAGC"
        "AAGGATTGACAAGGCAAG"
    )
    match = prefix + deletion + suffix
    reference = "A" + match + match + "A"
    alignments = align(prefix + suffix, reference)
    assert len(alignments) == 2, [a.format() for a in alignments]


def test_query_extending_past_end_of_reference():
    # java:627-642
    query_text = (
        "ATCCTACAGCAACTCAATTGAGTTTAGGTGTGACTCTTCGCTTCAAATAAATGAGAAACAAATTATTAA"
        "AAATATGAAAGATATGAAATATATAAAATGTC"
    )
    reference = (
        "GACCGGATATTCTGGTAATGACCCTTCAATTATAGACGTGAATGGTATCCAGCCGGGAGTAGATAGTAA"
        "TAGTGCTTATCCTACAGCAACTCAATTGAGTTTAGGTGTGAC"
    )
    alignment = verify_one(align(query_text, reference))
    assert (
        alignment.get_component(0).get_aligned_text_b()
        == "ATCCTACAGCAACTCAATTGAGTTTAGGTGTGAC"
    )


def test_custom_parameters():
    # java:645-672
    params = AlignmentParameters(
        mutation_penalty=1.0,
        insertion_start_penalty=0.8,
        insertion_extension_penalty=1.0,
        deletion_start_penalty=0.8,
        deletion_extension_penalty=1.0,
        max_error_rate=0.7,
        ambiguity_penalty=0.9,
        unaligned_penalty=0.9,
        max_penalty_span=0.0,
    )
    alignment = verify_one(align("ACGCATCCTCTTTT", "CGCGTACTCT", params))
    assert alignment.get_component(0).get_aligned_text_b() == "CGCGTACTCT"


def test_long_cheap_indel():
    # java:675-695
    reference_prefix = "A" * 77
    query_prefix = "AACACACGGTGTTCAC"
    query_prefix_mutated = "AACCCACGGTGTTCAC"
    insertion = "CACCCGCCCGCGCGCTCTCTCG"
    shared_suffix = "AATAACCGCCGGCGGTTATTAAAACCCCGGGGTTTTAAACCCGGGTTTAACCGGTTACGT"
    reference_suffix = "A" * 87
    query_text = query_prefix + insertion + shared_suffix
    reference = (
        reference_prefix + query_prefix_mutated + shared_suffix + query_prefix + reference_suffix
    )
    params = make_parameters(
        insertion_extension_penalty=0.2, deletion_extension_penalty=0.2, mutation_penalty=2.0
    )
    alignment = verify_one(align(query_text, reference, params))
    assert (
        alignment.get_component(0).get_aligned_text_b()
        == query_prefix_mutated + "-" * len(insertion) + shared_suffix
    )


def test_max_penalty_span_with_perfect_alignment():
    # java:698-710
    shared = "AACCACAC"
    query_text = shared + "AAAA"
    reference = shared + "AAAA" + shared + "AAGA"
    params = make_parameters(max_penalty_span=1.0)
    alignments = align(query_text, reference, params)
    assert len(alignments) == 2, [a.format() for a in alignments]
