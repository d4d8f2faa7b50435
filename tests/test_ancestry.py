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


def test_infer_ancestors_cli_with_duplication_probe(tmp_path):
    """Regression: under --infer-ancestors the worker's duplication-window
    proof probes the approximate detector (built over the ancestral database)
    with the ORIGINAL contig; unknown sequences must silently find nothing
    (Readable_DuplicationDetector.java:20-33), not crash."""
    import numpy as np

    from mapper_tpu.cli import main as cli_main

    rng = np.random.default_rng(17)
    core = "".join(rng.choice(list("ACGT"), size=2000))
    seg = core[300:700]
    mutated = list(seg)
    for k in range(0, len(mutated), 57):
        mutated[k] = "ACGT"[(("ACGT".index(mutated[k])) + 1) % 4]
    ref_text = core + seg + "".join(mutated) + core[1000:1400]
    (tmp_path / "ref.fasta").write_text(">dup\n" + ref_text + "\n")
    reads = []
    for i in range(30):
        pos = int(rng.integers(0, len(ref_text) - 120))
        reads.append(f">r{i}\n{ref_text[pos:pos+120]}\n")
    (tmp_path / "reads.fasta").write_text("".join(reads))
    rc = cli_main(
        [
            "--reference", str(tmp_path / "ref.fasta"),
            "--queries", str(tmp_path / "reads.fasta"),
            "--infer-ancestors",
            "--out-sam", str(tmp_path / "out.sam"),
        ]
    )
    assert rc == 0
    body = [l for l in (tmp_path / "out.sam").read_text().splitlines() if not l.startswith("@")]
    assert len(body) >= 30  # everything aligned (duplicated region may multi-map)
