"""End-to-end single-query alignment through the public Api, driven by the
upstream example data and synthetic scenarios."""

import numpy as np
import pytest

from mapper_tpu import Api, AlignmentParameters
from mapper_tpu.align.query import Query
from mapper_tpu.sequence import Sequence


def random_text(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def example_index():
    return Api.new_database(
        {
            "contig1": "AAAACCAAAGGCTCGCGTA",
            "contig2": "ACGTAC",
            "contig3": "ACGTAACCGGTTAAACCCGGGTTTAAAACCCCGGGGTTTT",
        }
    )


def align_text(index, text, **params_kw):
    params = AlignmentParameters.defaults(**params_kw)
    return Api.align(text, index, params)


def test_exact_match_aligns(example_index):
    result = align_text(example_index, "AAAACCAAAGG")
    alignments = result.get_first_alignments()
    assert len(alignments) == 1
    a = alignments[0]
    assert a.get_penalty() == 0
    comp = a.get_component(0)
    assert comp.get_sequence_b().name == "contig1"
    assert comp.get_start_index_b() == 0
    assert not comp.is_reference_reversed()


def test_one_snp_aligns(example_index):
    result = align_text(example_index, "AAAACCAAATG")
    alignments = result.get_first_alignments()
    assert len(alignments) == 1
    assert alignments[0].get_penalty() == pytest.approx(1.0)
    assert alignments[0].get_component(0).get_sequence_b().name == "contig1"


def test_whole_contig_match(example_index):
    result = align_text(example_index, "ACGTAC")
    alignments = result.get_first_alignments()
    assert len(alignments) >= 1
    names = {a.get_component(0).get_sequence_b().name for a in alignments}
    assert "contig2" in names


def test_insertion_query_aligns_via_clipped_substitution(example_index):
    # "query4-insertion": an insertion block would cost 2.1 > 1.2 budget, but a
    # cheaper representation exists because contig1's window starts at the
    # contig edge: soft-clip the leading base (0.1) + 1 SNP = 1.1 <= 1.2
    result = align_text(example_index, "AAAACCCAAAGG")
    alignments = result.get_first_alignments()
    assert len(alignments) == 1
    a = alignments[0]
    assert a.get_penalty() == pytest.approx(1.1)
    comp = a.get_component(0)
    assert comp.count_num_indels() == 0
    assert comp.get_sequence_b().name == "contig1"
    assert comp.sections[0].start_a == 1  # leading query base unaligned


def test_deletion_query_aligns(example_index):
    # "query5-deletion": 25bp, one 1-base deletion costs 2.0 <= 2.5 budget.
    # A second, cheaper representation also exists: the reverse-complement
    # query's first 8 bases match the end of contig3 exactly with the other 17
    # soft-clipped past the contig edge (17 * 0.1 = 1.7), and 2.0 is within
    # the 0.5 penalty span of it — so both are reported.
    result = align_text(example_index, "CCGGTTAAACCCGGTTTAAAACCCC")
    alignments = result.get_first_alignments()
    by_penalty = sorted(alignments, key=lambda a: a.get_penalty())
    assert len(by_penalty) == 2
    clip, deletion = by_penalty
    assert clip.get_penalty() == pytest.approx(1.7)
    assert clip.get_component(0).count_num_indels() == 0
    assert deletion.get_penalty() == pytest.approx(2.0)
    comp = deletion.get_component(0)
    assert comp.get_sequence_b().name == "contig3"
    assert comp.count_num_indels() == 1
    assert comp.get_start_index_b() == 6


def test_too_different_query_unaligned(example_index):
    result = align_text(example_index, "ACGCGCTAAACCGAGG")
    assert result.get_first_alignments() == []


def test_reverse_strand_alignment(example_index):
    # reverse complement of contig1[0:12]
    from mapper_tpu import basepairs

    text = basepairs.decode(basepairs.reverse_complement(basepairs.encode("AAAACCAAAGGC")))
    result = align_text(example_index, text)
    alignments = result.get_first_alignments()
    assert len(alignments) == 1
    comp = alignments[0].get_component(0)
    assert comp.get_sequence_b().name == "contig1"
    assert comp.is_reference_reversed()


def test_larger_reference_snp_position():
    ref = random_text(2000, 21)
    index = Api.new_database({"chr": ref})
    # read from position 700 with a SNP at read position 40
    read = list(ref[700:850])
    original = read[40]
    read[40] = {"A": "C", "C": "G", "G": "T", "T": "A"}[original]
    result = Api.align("".join(read), index, AlignmentParameters.defaults())
    alignments = result.get_first_alignments()
    assert len(alignments) == 1
    comp = alignments[0].get_component(0)
    assert comp.get_start_index_b() == 700
    assert alignments[0].get_penalty() == pytest.approx(1.0)


def test_multi_alignment_reporting_with_duplicated_reference():
    segment = random_text(120, 22)
    ref = segment + random_text(100, 23) + segment
    index = Api.new_database({"chr": ref})
    read = segment[30:90]
    result = Api.align(read, index, AlignmentParameters.defaults())
    alignments = result.get_first_alignments()
    starts = sorted(a.get_component(0).get_start_index_b() for a in alignments)
    assert starts == [30, 250]


def test_max_num_matches_rejection():
    segment = random_text(80, 24)
    ref = segment + segment + segment
    index = Api.new_database({"chr": ref})
    read = segment[10:60]
    params = AlignmentParameters.defaults(max_num_matches=2)
    result = Api.align(read, index, params)
    assert result.get_first_alignments() == []


def test_indel_alignment_position_in_long_reference():
    ref = random_text(3000, 25)
    index = Api.new_database({"chr": ref})
    # 150bp read with a 2-base deletion relative to the reference
    read = ref[1000:1075] + ref[1077:1152]
    result = Api.align(read, index, AlignmentParameters.defaults())
    alignments = result.get_first_alignments()
    assert len(alignments) == 1
    comp = alignments[0].get_component(0)
    assert comp.count_num_indels() == 1
    indel = [s for s in comp.sections if s.is_indel][0]
    assert indel.length_b == 2
    assert alignments[0].get_penalty() == pytest.approx(2.5)
