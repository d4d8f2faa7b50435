"""Aligner-core tests: golden cases from the reference's PathAligner_Test plus
brute-force optimality checks."""

from functools import lru_cache

import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.align.blocks import new_sequence_alignment
from mapper_tpu.align.dp import AlignmentAnalysis, local_align, path_align, straight_alignment
from mapper_tpu.align.params import AlignmentParameters
from mapper_tpu.sequence import Sequence


def make_params(**kw):
    # the PathAligner_Test parameter set (PathAligner_Test.java:76-87)
    defaults = dict(
        mutation_penalty=1.0,
        insertion_start_penalty=2.0,
        insertion_extension_penalty=0.5,
        deletion_start_penalty=2.0,
        deletion_extension_penalty=0.5,
        max_error_rate=0.1,
        ambiguity_penalty=0.1,
        unaligned_penalty=0.1,
    )
    defaults.update(kw)
    return AlignmentParameters(**defaults)


def run_path_align(query_text, ref_text, params, max_ext):
    a = Sequence.from_text("a", query_text)
    b = Sequence.from_text("b", ref_text)
    analysis = AlignmentAnalysis(
        predicted_best_offset=0,
        confident_about_best_offset=False,
        max_insertion_extension_penalty=max_ext,
        max_deletion_extension_penalty=max_ext,
    )
    return path_align(a, b, 0, len(a), 0, len(b), params, analysis, False)


# --- golden cases pinned by the reference's PathAligner_Test ---------------


def test_query_ending_with_mismatch_and_extension():
    # PathAligner_Test.testQueryEndingWithMismatchAndExtension (java:11-15)
    params = make_params(max_error_rate=1.0)
    result = run_path_align("AACCGGTT", "AAT", params, 1.5)
    assert result is not None
    assert result.get_aligned_text_a() == "AAC"
    assert result.get_aligned_text_b() == "AAT"
    assert result.get_penalty() == pytest.approx(1.5)


def test_query_starting_with_short_extension():
    # PathAligner_Test.testQueryStartingWithShortExtension (java:18-26)
    params = make_params(max_error_rate=1.0)
    result = run_path_align(
        "AAACCGGTTACGTACGTACGT", "AACCGGTTACGTTACGTACGT", params, 2.6
    )
    assert result is not None
    assert result.get_aligned_text_a() == "AACCGGTTACG-TACGTACGT"
    assert result.get_aligned_text_b() == "AACCGGTTACGTTACGTACGT"
    assert result.get_penalty() == pytest.approx(2.6)


def test_max_penalty_higher_than_extension_penalty():
    # PathAligner_Test.testMaxPenaltyHigherThanExtensionPenalty (java:29-39)
    params = make_params(max_error_rate=1.0, ambiguity_penalty=1.0, unaligned_penalty=1.0)
    query = "AACACACGGTGTTCACCACCCGCCCGCGCGCT"
    ref = "AACCCACGGTGTTCACAATAACCGCCGGCGGT"
    result = run_path_align(query, ref, params, 10)
    assert result is not None
    assert result.get_aligned_text_a() == query
    assert result.get_aligned_text_b() == ref
    assert result.get_penalty() == pytest.approx(10)


# --- straight alignment ----------------------------------------------------


def test_straight_alignment_clamps_and_charges_unaligned():
    params = make_params()
    a = Sequence.from_text("a", "AACCGG")
    b = Sequence.from_text("b", "AACC")
    result = straight_alignment(a, b, 0, 6, 0, 4, 0, params, False)
    assert result.get_aligned_text_a() == "AACC"
    assert result.get_aligned_penalty() == 0
    # 2 unaligned query bases at 0.1
    assert result.get_penalty() == pytest.approx(0.2)


# --- brute force optimality ------------------------------------------------


def brute_force_penalty(qc, rc, params):
    """Minimal penalty over all glocal alignments: free leading/trailing ref
    overhang, affine indels, no unaligned query bases."""
    ins_open = params.insertion_start_penalty + params.insertion_extension_penalty
    ins_ext = params.insertion_extension_penalty
    del_open = params.deletion_start_penalty + params.deletion_extension_penalty
    del_ext = params.deletion_extension_penalty
    n, m = len(qc), len(rc)
    INF = float("inf")
    best = np.full((n + 1, m + 1), INF)
    ix = np.full((n + 1, m + 1), INF)
    iy = np.full((n + 1, m + 1), INF)
    best[0, :] = 0.0  # free leading ref skip
    for x in range(1, n + 1):
        for y in range(0, m + 1):
            if y > 0:
                diag = best[x - 1, y - 1] + float(
                    params.base_penalty(qc[x - 1], rc[y - 1])
                )
            else:
                diag = INF
            ix[x, y] = min(best[x - 1, y] + ins_open, ix[x - 1, y] + ins_ext)
            if y > 0:
                iy[x, y] = min(best[x, y - 1] + del_open, iy[x, y - 1] + del_ext)
            best[x, y] = min(diag, ix[x, y], iy[x, y])
    return float(np.min(best[n, :]))  # free trailing ref skip


@pytest.mark.parametrize("seed", range(8))
def test_dp_matches_brute_force_on_random_mutations(seed):
    rng = np.random.default_rng(seed)
    ref_text = "".join(rng.choice(list("ACGT"), size=60))
    # mutate a copy: a few SNPs and maybe a small indel
    q = list(ref_text[10:50])
    for _ in range(2):
        pos = rng.integers(0, len(q))
        q[pos] = rng.choice(list("ACGT"))
    if seed % 2 == 0:
        pos = int(rng.integers(5, len(q) - 5))
        q.insert(pos, str(rng.choice(list("ACGT"))))
    query_text = "".join(q)

    params = make_params(max_error_rate=1.0)
    qc = basepairs.encode(query_text)
    rc = basepairs.encode(ref_text)
    expected = brute_force_penalty(qc, rc, params)

    # align into an interior window (pad the reference) so the contig-edge
    # unaligned-tail rules don't apply and the brute force is an exact oracle
    pad = "ACGTACGTACGT"
    padded = Sequence.from_text("b", pad + ref_text + pad)
    a = Sequence.from_text("a", query_text)
    analysis = AlignmentAnalysis(
        predicted_best_offset=len(pad),
        confident_about_best_offset=False,
        max_insertion_extension_penalty=100.0,
        max_deletion_extension_penalty=100.0,
    )
    result = path_align(
        a, padded, 0, len(a), len(pad), len(pad) + len(ref_text), params, analysis, False
    )
    assert result is not None
    assert result.get_length_a() == len(query_text)
    assert result.get_aligned_penalty() == pytest.approx(expected, abs=1e-9)


def test_local_align_prefers_ungapped_on_tie():
    # one mismatch (penalty 1) vs deletion+insertion alternatives that cost more
    params = make_params(max_error_rate=1.0)
    a = Sequence.from_text("a", "ACGTACGTA")
    b = Sequence.from_text("b", "ACGAACGTA")
    analysis = AlignmentAnalysis(
        predicted_best_offset=0,
        confident_about_best_offset=True,
        max_insertion_extension_penalty=5.0,
        max_deletion_extension_penalty=5.0,
    )
    result = local_align(a, b, 0, 9, 0, 9, params, analysis)
    assert result.count_num_indels() == 0
    assert result.get_penalty() == pytest.approx(1.0)


def test_local_align_finds_insertion():
    params = AlignmentParameters.defaults()
    # query has one extra base relative to reference
    ref_text = "ACGGACTTACGTCGTTAACCACGATTG"
    query_text = ref_text[:10] + "G" + ref_text[10:]
    a = Sequence.from_text("a", query_text)
    b = Sequence.from_text("b", ref_text)
    analysis = AlignmentAnalysis(
        predicted_best_offset=0,
        confident_about_best_offset=True,
        max_insertion_extension_penalty=5.0,
        max_deletion_extension_penalty=5.0,
    )
    result = local_align(a, b, 0, len(a), 0, len(b), params, analysis)
    assert result is not None
    assert result.count_num_indels() == 1
    ins = [s for s in result.sections if s.is_indel][0]
    assert ins.length_a == 1 and ins.length_b == 0
    # penalty = insertion start + 1 * insertion extension = 1.5 + 0.6
    assert result.get_penalty() == pytest.approx(2.1)


def test_local_align_finds_deletion():
    params = AlignmentParameters.defaults()
    ref_text = "CACGTAAGACCGGTTATTAGGACCATCGATGCAGTCA"
    query_text = ref_text[:7] + ref_text[9:]  # delete 2 bases (penalty 2.5 <= 3.5 budget)
    a = Sequence.from_text("a", query_text)
    b = Sequence.from_text("b", ref_text)
    analysis = AlignmentAnalysis(
        predicted_best_offset=0,
        confident_about_best_offset=True,
        max_insertion_extension_penalty=5.0,
        max_deletion_extension_penalty=5.0,
    )
    result = local_align(a, b, 0, len(a), 0, len(b), params, analysis)
    assert result is not None
    dels = [s for s in result.sections if s.is_indel]
    assert len(dels) == 1
    assert dels[0].length_b == 2 and dels[0].length_a == 0
    assert result.get_penalty() == pytest.approx(1.5 + 2 * 0.5)


def test_justify_normalizes_indel_position():
    # deletion in a TT run must land at the canonical (leftmost) placement;
    # align into an interior window so unaligned tails are unavailable
    params = make_params(max_error_rate=1.0)
    pad = "CCGGAACCGGAA"
    core_q = "ACGTACGTAAGG"
    core_r = "ACGTTACGTAAGG"
    a = Sequence.from_text("a", core_q)
    b = Sequence.from_text("b", pad + core_r + pad)
    analysis = AlignmentAnalysis(
        predicted_best_offset=len(pad),
        confident_about_best_offset=False,
        max_insertion_extension_penalty=5.0,
        max_deletion_extension_penalty=5.0,
    )
    result = path_align(
        a, b, 0, len(a), len(pad), len(pad) + len(core_r), params, analysis, False
    )
    assert result is not None
    dels = [s for s in result.sections if s.is_indel]
    assert len(dels) == 1
    # canonical placement within the TT run of the reference (local index 3)
    assert dels[0].start_b == len(pad) + 3


def test_skip_high_ambiguity_blocks_indel_search():
    params = AlignmentParameters.defaults(max_error_rate=0.5)
    ref_text = "NNNNNNNNACGTNNNNNNNN"
    query_text = "ACGGT"
    a = Sequence.from_text("a", query_text)
    b = Sequence.from_text("b", ref_text)
    analysis = AlignmentAnalysis(
        predicted_best_offset=8,
        confident_about_best_offset=False,
        max_insertion_extension_penalty=5.0,
        max_deletion_extension_penalty=5.0,
    )
    result = local_align(a, b, 0, 5, 0, 20, params, analysis)
    # the only possible result is ungapped (indel search skipped)
    if result is not None:
        assert result.count_num_indels() == 0
