"""Ancestry-inference golden tests transcribed from the reference's
AncestryDetector_Test.java (references and expected inferred-ancestor strings
are the upstream fixtures)."""

import pytest

from mapper_tpu.index.ancestry import AncestryDetector
from mapper_tpu.index.database import (
    HashBlockDatabase,
    choose_max_duplication_length,
    choose_min_duplication_length,
)
from mapper_tpu.index.duplication import DuplicationDetector
from mapper_tpu.sequence import Sequence, SequenceDatabase


def infer(reference_text: str) -> str:
    reference = Sequence.from_text("ref", reference_text)
    sequences = [reference, reference.reverse_complement()]
    seq_db = SequenceDatabase(sequences)
    hb = HashBlockDatabase(seq_db)
    min_dup = choose_min_duplication_length(seq_db)
    max_dup = choose_max_duplication_length(seq_db)
    detector = DuplicationDetector(
        hb, min_dup, max_dup, min_num_interesting_copies=3, window_size=0
    )
    ancestry = AncestryDetector(detector, sequences, dissimilarity_threshold=0.3)
    result_db = ancestry.get_hashblock_database()
    forwards = result_db.get_sequence_database().get_forward_sequences_only()
    assert len(forwards) == 1
    return forwards[0].get_text()


def test_basic():
    ref1 = "GCCCATTAAAACTGACACGGGTTAC"
    ref2 = "GCCCATTAAAACTGACACCGGTTAC"
    union = "GCCCATTAAAACTGACACSGGTTAC"
    assert infer(ref1 + ref1 + ref2) == ref1 + ref1 + union


def test_2():
    ref1 = "AACGGTGGGAACGGCGGAGCGTCGC"
    ref2 = "AACGGTGGGATCGGCGGAGCGTCGC"
    union = "AACGGTGGGAWCGGCGGAGCGTCGC"
    assert infer(ref1 + ref1 + ref2) == ref1 + ref1 + union


def test_reverse_complement():
    ref1 = "TTATTGTTAAACCGGTACACC"
    ref2 = Sequence.from_text("t", ref1).reverse_complement().get_text()
    ref3 = "TTATTGTTAAACCTGTACACC"
    union = "TTATTGTTAAACCKGTACACC"
    assert infer(ref1 + ref2 + ref3) == ref1 + ref2 + union


def test_proceed_past_ties():
    ref1 = "CAACCGGAGAATCTCGATGAGNNNNNNNN"
    ref2 = "CAACCGGAGAATCTCGATTAGNNNNNNNN"
    ref3 = "CAACCGGAGAATCTCGATGAGNNNNNNNN"
    ref4 = "CAACCGGAGAATCTCGATTATNNNNNNNN"
    union = "CAACCGGAGAATCTCGATTAKNNNNNNNN"
    assert infer(ref1 + ref2 + ref3 + ref4) == ref1 + ref2 + ref3 + union


def test_no_changes():
    ref1 = "GGACGTACGCACGAACGACCGAGCGATGTTT"
    assert infer(ref1 + ref1 + ref1) == ref1 + ref1 + ref1


def test_many_mutations():
    ref1 = "AACGACGTCTGACGAGTGACGTGGACAACCGGACGGCTC"
    ref2 = "AACGACTTCTGACAAGTGACCTGGACATCCGGACAGCTC"
    union = "AACGACKTCTGACRAGTGACSTGGACAWCCGGACRGCTC"
    assert infer(ref1 + ref1 + ref2) == ref1 + ref1 + union


def test_break_similar_section():
    ref1 = "AGCGGTGGAACGGCGGAGCGTCGTCAAACCCGGGTTCTCAGTCG"
    ref2 = "AGCGGTGGAACGGCGGAGCGTCGTCAAACCCGGGTTCTCAGTCA"
    suffix = "AGACATACAGAAAGAG"
    # mutation at the very end of the last copy, followed by dissimilar
    # sequence: the similar section likely ended, no ancestor inferred
    mutated_at_end = ref1 + ref1 + ref1 + ref2 + suffix
    assert infer(mutated_at_end) == mutated_at_end

    # the same mutation in the middle, flanked by similar sequence: common
    # ancestry likely, union inferred
    union = "AGCGGTGGAACGGCGGAGCGTCGTCAAACCCGGGTTCTCAGTCR"
    mutated_in_middle = ref1 + ref1 + ref2 + ref1 + suffix
    assert infer(mutated_in_middle) == ref1 + ref1 + union + ref1 + suffix
