import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.align.params import AlignmentParameters


def test_encode_decode_roundtrip():
    text = "ACGTMRWSYKVHDBN"
    codes = basepairs.encode(text)
    assert basepairs.decode(codes) == text


def test_lowercase_encoding():
    assert np.array_equal(basepairs.encode("acgt"), basepairs.encode("ACGT"))


def test_complement():
    codes = basepairs.encode("ACGTN")
    assert basepairs.decode(basepairs.complement(codes)) == "TGCAN"


def test_reverse_complement():
    codes = basepairs.encode("AACGT")
    assert basepairs.decode(basepairs.reverse_complement(codes)) == "ACGTT"


def test_can_match():
    a = basepairs.encode("AANR")
    b = basepairs.encode("ACCG")
    assert list(basepairs.can_match(a, b)) == [True, False, True, True]


def test_union_is_bitwise_or():
    a, c = basepairs.A, basepairs.C
    assert basepairs.union(a, c) == (a | c)


def test_ambiguity_predicates():
    codes = basepairs.encode("ANRC")
    assert list(basepairs.is_ambiguous(codes)) == [False, True, True, False]
    assert list(basepairs.is_fully_ambiguous(codes)) == [False, True, False, False]


# Pins the penalty math fixed by the reference's BasepairsTest.java:9-51:
# partial ambiguity (2-of-4 union) costs AmbiguityPenalty/3.
def test_penalty_model_matches_reference_fixture():
    params = AlignmentParameters(mutation_penalty=100.0, ambiguity_penalty=3.0)
    A = basepairs.A
    C = basepairs.C
    N = basepairs.N
    a_or_c = basepairs.union(A, C)

    assert params.base_penalty(A, C) == 100.0
    assert params.base_penalty(A, N) == 3.0
    assert params.base_penalty(N, A) == 3.0
    assert params.base_penalty(A, a_or_c) == pytest.approx(1.0)
    assert params.base_penalty(a_or_c, A) == pytest.approx(1.0)
    assert params.base_penalty(A, A) == 0.0


def test_substitution_table_shape_and_symmetry():
    table = AlignmentParameters.defaults().substitution_table()
    assert table.shape == (16, 16)
    assert np.allclose(table, table.T)


def test_parameter_defaults_match_cli_rules():
    # Mapper.java:409-453
    p = AlignmentParameters.defaults()
    assert p.mutation_penalty == 1.0
    assert p.deletion_start_penalty == 1.5
    assert p.deletion_extension_penalty == 0.5
    assert p.insertion_start_penalty == 1.5
    # insertion extension = deletion extension + ambiguity penalty (= max error rate)
    assert p.insertion_extension_penalty == pytest.approx(0.6)
    assert p.max_error_rate == 0.1
    assert p.ambiguity_penalty == 0.1
    assert p.unaligned_penalty == 0.1
    assert p.max_penalty_span == 0.5
