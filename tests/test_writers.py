"""Golden-output writer tests, transcribed from the reference's
SamWriter_Test.java and MutationsWriter_Test.java (the queries, references,
parameters, and expected outputs are the upstream fixtures)."""

import io

import pytest

from mapper_tpu.align.params import AlignmentParameters
from mapper_tpu.align.query import Query
from mapper_tpu.align.worker import AlignerWorker
from mapper_tpu.api import Api, ReferenceIndex
from mapper_tpu.index.database import HashBlockDatabase
from mapper_tpu.index.duplication import DuplicationDetector
from mapper_tpu.io.mutations import MutationDetectionParameters, MutationsWriter
from mapper_tpu.io.sam import SamWriter
from mapper_tpu.pileup import MatchDatabase
from mapper_tpu.sequence import Sequence, SequenceDatabase, sort_and_complement


def make_parameters():
    # SamWriter_Test.makeParameters (java:112-123)
    return AlignmentParameters(
        mutation_penalty=1.0,
        insertion_start_penalty=1.5,
        insertion_extension_penalty=0.6,
        deletion_start_penalty=1.5,
        deletion_extension_penalty=0.5,
        max_error_rate=0.2,
        ambiguity_penalty=0.2,
        unaligned_penalty=0.2,
        # the Java fixture leaves Max_PenaltySpan at the field default 0
        max_penalty_span=0.0,
    )


def make_index(ref_text: str) -> ReferenceIndex:
    ref = Sequence.from_text("ref", ref_text)
    seq_db = SequenceDatabase(sort_and_complement([ref]))
    hb = HashBlockDatabase(seq_db)
    dup = DuplicationDetector(hb, 1, 2, min_num_interesting_copies=2, window_size=1)
    return ReferenceIndex(seq_db, hb, dup)


def build_sam(query, ref_text: str) -> str:
    if isinstance(query, str):
        query = Query(Sequence.from_text("query", query))
    index = make_index(ref_text)
    worker = AlignerWorker(index, make_parameters())
    results = [worker.align(query)]
    stream = io.StringIO()
    sam = SamWriter(index.sequence_database, stream, False)
    sam.add_alignments(results)
    body = "".join(
        line + "\n"
        for line in stream.getvalue().split("\n")
        if line and not line.startswith("@")
    )
    return body


# --- SamWriter_Test scenarios ---------------------------------------------


def test_sam_simple():
    sam = build_sam("ACGTA", "ACGTAAAAACCGTAAA")
    assert sam == "query\t0\tref\t1\t255\t5M\t*\t0\t5\tACGTA\t*\tAS:f:0.0\n"


def test_sam_paired_end():
    fwd = Sequence.from_text("one", "AACCGGTTAT")
    rev = Sequence.from_text("two", "ATACGTACGT")
    query = Query(fwd, rev, 1, 100)
    sam = build_sam(query, "AACCGGTTATAAAAAAAAAAACGTACGTATAAAAAAAAAA")
    expected = (
        "one\t99\tref\t1\t255\t10M\tref\t21\t10\tAACCGGTTAT\t*\tcs:f:0.0\tAS:f:0.0\n"
        "two\t147\tref\t21\t255\t10M\tref\t1\t10\tACGTACGTAT\t*\tcs:f:0.0\tAS:f:0.0\n"
    )
    assert sam == expected


def test_sam_one_read_multiple_alignments():
    sam = build_sam("ACGTA", "ACGTAAAAACGTAAAA")
    lines = set(sam.rstrip("\n").split("\n"))
    assert lines == {
        "query\t0\tref\t1\t255\t5M\t*\t0\t5\tACGTA\t*\tAS:f:0.0",
        "query\t0\tref\t9\t255\t5M\t*\t0\t5\tACGTA\t*\tAS:f:0.0",
    }


def test_sam_paired_end_multiple_alignments():
    fwd = Sequence.from_text("one", "ACGTA")
    rev = Sequence.from_text("two", "GGGGG")
    query = Query(fwd, rev, 1, 5)
    sam = build_sam(query, "ACGTAAAACCCCCTTTTACGTAAAACCCCC")
    lines = set(sam.rstrip("\n").split("\n"))
    assert lines == {
        "one\t99\tref\t18\t255\t5M\tref\t26\t5\tACGTA\t*\tcs:f:0.0\tAS:f:0.0",
        "two\t147\tref\t26\t255\t5M\tref\t18\t5\tCCCCC\t*\tcs:f:0.0\tAS:f:0.0",
        "one\t99\tref\t1\t255\t5M\tref\t9\t5\tACGTA\t*\tcs:f:0.0\tAS:f:0.0",
        "two\t147\tref\t9\t255\t5M\tref\t1\t5\tCCCCC\t*\tcs:f:0.0\tAS:f:0.0",
    }


def test_sam_paired_end_only_one_sequence_aligned():
    fwd = Sequence.from_text("one", "AACCGGTTAT")
    rev = Sequence.from_text("two", "CCCCCCCCCC")
    query = Query(fwd, rev, 1, 100)
    sam = build_sam(query, "AACCGGTTATAAAAAAAAAAACGTACGTATAAAAAAAAAA")
    assert sam == "one\t73\tref\t1\t255\t10M\t*\t0\t10\tAACCGGTTAT\t*\tcs:f:0.0\tAS:f:0.0\n"


# --- MutationsWriter_Test scenarios ---------------------------------------


def build_mutations(
    query_text: str,
    ref_text: str,
    filter_params: MutationDetectionParameters | None = None,
    query_end_fraction: float = 0.0,
) -> str:
    if filter_params is None:
        filter_params = MutationDetectionParameters.empty_filter()
    index = make_index(ref_text)
    worker = AlignerWorker(index, make_parameters())
    query = Query(Sequence.from_text("query", query_text))
    match_db = MatchDatabase(query_end_fraction)
    match_db.add_alignments([worker.align(query)])
    pileups = match_db.group_by_position()
    stream = io.StringIO()
    MutationsWriter(stream, filter_params).write(pileups)
    return "".join(
        line + "\n"
        for line in stream.getvalue().split("\n")
        if line and not line.startswith("#") and not line.startswith("CHR")
    )


def test_mutations_none():
    assert build_mutations("ACGTA", "ACGTAAAAAAAAAAAA") == ""


def test_mutations_one_snp():
    assert build_mutations("AACGTT", "AACGTAAAAA") == "ref\t6\tA\tT\t1\t1\n"


def test_mutations_consecutive():
    out = build_mutations("ACGTTTAAACCGG", "ACGTAAAAACCGG")
    assert out == "ref\t5\tA\tT\t1\t1\nref\t6\tA\tT\t1\t1\n"


def test_mutations_insertion():
    out = build_mutations("ACGGACTTACGTCGTTAACCACGA", "ACGCTTACGTCGTTAACCACGA")
    assert out == "ref\t3\t--\tGA\t1\t1\n"


def test_mutations_deletion():
    out = build_mutations("CACGTAACCGGTTATT", "CACGTAAGACCGGTTATT")
    assert out == "ref\t7\tAG\t--\t1\t1\n"


def test_mutations_low_depth_filtered():
    filt = MutationDetectionParameters.empty_filter()
    filt.min_snp_total_depth = 2
    assert build_mutations("ACGTAACTCCGGCTC", "ACGTACGTCCGGCTC", filt) == ""
    out = build_mutations("ACGTAACTCCGGCTC", "ACGTACGTCCGGCTC")
    assert out == "ref\t6\tC\tA\t1\t1\nref\t7\tG\tC\t1\t1\n"


def test_mutations_indel_near_query_end_filtered():
    filt = MutationDetectionParameters.empty_filter()
    filt.min_indel_total_start_depth = 1
    out = build_mutations("CCTAACGTAACTCTGGCCGCAA", "AGGAACCTACGTAACTCTGGCCGCAA", filt, 0.5)
    assert out == ""
    out = build_mutations("CCTAACGTAACTCTGGCCGCAA", "AGGAACCTACGTAACTCTGGCCGCAA")
    assert out == "ref\t8\t-\tA\t1\t1\n"


# --- pileup semantics (MatchDatabase_Test) --------------------------------


def test_pileup_counts_every_position_once():
    from mapper_tpu.align.blocks import AlignedBlock, QueryAlignment, QueryAlignments, new_sequence_alignment

    a = Sequence.from_text("a", "AACCACGT")
    b = Sequence.from_text("b", "AACCACGA")
    params = AlignmentParameters()
    alignment = new_sequence_alignment([AlignedBlock(a, b, 0, 0, 8, 8)], False, params)
    db = MatchDatabase(0)
    db.add_alignments([QueryAlignments.single_choice(QueryAlignment(alignment))])
    pileup = db.group_by_position()[b]
    for i in range(8):
        assert pileup.get_count(i) == pytest.approx(1.0)


def test_pileup_overlapping_paired_end_weight():
    from mapper_tpu.align.blocks import AlignedBlock, QueryAlignment, QueryAlignments, new_sequence_alignment

    ref = Sequence.from_text("ref", "AACCACGATTAC")
    q1 = Sequence.from_text("q1", "AACCACGA")
    q2 = Sequence.from_text("q2", "CACGATTAC")
    params = AlignmentParameters()
    a1 = new_sequence_alignment([AlignedBlock(q1, ref, 0, 0, 8, 8)], False, params)
    a2 = new_sequence_alignment([AlignedBlock(q2, ref, 0, 3, 9, 9)], False, params)
    alignment = QueryAlignment([a1, a2], 0, 0, 0, 0, -5)
    db = MatchDatabase(0)
    db.add_alignments([QueryAlignments.single_choice(alignment)])
    pileup = db.group_by_position()[ref]
    for i in range(12):
        assert pileup.get_count(i) == pytest.approx(1.0), f"position {i}"


def test_vcf_vectorized_fast_path_matches_plain_loop(tmp_path):
    """The vectorized single-ref-allele fast path must reproduce the plain
    per-position loop byte-for-byte across SNPs, insertions, deletions,
    ambiguous reference bases, depth filters and both non-mutation modes."""
    import io as _io

    import numpy as np

    from mapper_tpu import basepairs
    from mapper_tpu.io.mutations import MutationDetectionParameters, format_number
    from mapper_tpu.io.vcf import VcfWriter
    from mapper_tpu.pileup import ROW_CHARS, ContigPileup
    from mapper_tpu.sequence import Sequence

    rng = np.random.default_rng(9)
    n = 600
    text = "".join(rng.choice(list("ACGT"), size=n))
    text = text[:50] + "N" + text[51:100] + "R" + text[101:]  # ambiguous refs
    seq = Sequence.from_text("ctg", text)
    pileup = ContigPileup.empty(seq)
    # random coverage incl. SNP rows, deletion row, ambiguous row, weights .5
    for _ in range(2500):
        pos = int(rng.integers(0, n))
        row = int(rng.choice([0, 1, 2, 3, 0, 1, 2, 3, 4, 5]))
        target = pileup.middle if rng.random() < 0.8 else pileup.end
        target[row, pos] += 0.5 if rng.random() < 0.3 else 1.0
    pileup.insertions[(123, "GA")] = (2.0, 0.5, "readX")
    pileup.insertions[(300, "T")] = (1.0, 0.0, "readY")

    def plain(include_non_mutations, params, show_support):
        middle_depth = pileup.middle.sum(axis=0)
        end_depth = pileup.end.sum(axis=0)
        covered = np.nonzero(middle_depth + end_depth > 0)[0]
        ins_by_pos = {}
        for (pos, t), (mw, ew, ex, *_gid) in pileup.insertions.items():
            ins_by_pos.setdefault(pos, []).append((t, mw, ew, ex))
        out = []
        for pos in covered.tolist():
            ref_char = basepairs.decode_one(int(seq.codes[pos]))
            alleles = []
            is_mutation = False
            for row in range(6):
                mw = pileup.middle[row, pos]
                ew = pileup.end[row, pos]
                if mw + ew <= 0:
                    continue
                char = ROW_CHARS[row]
                if char != ref_char:
                    is_mutation = True
                alleles.append(f"{char}={format_number(mw)}+{format_number(ew)}")
            for t, mw, ew, _ex in ins_by_pos.get(pos, []):
                is_mutation = True
                alleles.append(f"ins:{t}={format_number(mw)}+{format_number(ew)}")
            if not is_mutation and not include_non_mutations:
                continue
            if middle_depth[pos] + end_depth[pos] < params.min_snp_total_depth:
                continue
            fields = [
                "ctg", str(pos + 1), ref_char,
                format_number(middle_depth[pos]), format_number(end_depth[pos]),
                ";".join(alleles),
            ]
            if show_support:
                fields.append(".")
            out.append("\t".join(fields) + "\n")
        return "".join(out)

    for include in (True, False):
        for show_support in (True, False):
            for params in (
                MutationDetectionParameters.empty_filter(),
                MutationDetectionParameters.default_filter(),
            ):
                buf = _io.StringIO()
                writer = VcfWriter(buf, include, params, show_support)
                writer.write({seq: pileup})
                got = "".join(
                    l for l in buf.getvalue().splitlines(keepends=True)
                    if not l.startswith("#")
                )
                want = plain(include, params, show_support)
                assert got == want, (include, show_support, params.min_snp_total_depth)

def test_vcf_fractional_depths_and_python_fallback(tmp_path, monkeypatch):
    """Depths that are not half-integers (1/3 weights from 3-way alternative
    alignments) must take the sort-based suffix path, and the pure-Python row
    assembly must match the native formatter byte-for-byte."""
    import io as _io

    import numpy as np

    from mapper_tpu.io import vcf as vcf_mod
    from mapper_tpu.io.mutations import MutationDetectionParameters
    from mapper_tpu.io.vcf import VcfWriter
    from mapper_tpu.pileup import ContigPileup
    from mapper_tpu.sequence import Sequence

    rng = np.random.default_rng(11)
    n = 400
    seq = Sequence.from_text("ctg", "".join(rng.choice(list("ACGT"), size=n)))
    pileup = ContigPileup.empty(seq)
    for _ in range(1500):
        pos = int(rng.integers(0, n))
        row = int(rng.choice([0, 1, 2, 3, 0, 1, 2, 3, 5]))
        target = pileup.middle if rng.random() < 0.8 else pileup.end
        target[row, pos] += float(rng.choice([1.0, 0.5, 1.0 / 3.0]))

    def render():
        buf = _io.StringIO()
        VcfWriter(buf, True, MutationDetectionParameters.empty_filter(), True).write(
            {seq: pileup}
        )
        return buf.getvalue()

    with_native = render()
    import mapper_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "native_format_rows", lambda *a, **k: None)
    without_native = render()
    assert with_native == without_native
    assert with_native.count("\n") > 300


def test_parallel_writers_match_serial():
    """VcfWriter.write / MutationsWriter.write with num_threads > 1 must be
    byte-identical to the serial pass (the reference passes numThreads at
    Mapper.java:764,783; order stays deterministic via per-contig buffers)."""
    import io as _io

    import numpy as np

    from mapper_tpu.io.mutations import MutationDetectionParameters, MutationsWriter
    from mapper_tpu.io.vcf import VcfWriter
    from mapper_tpu.pileup import ContigPileup
    from mapper_tpu.sequence import Sequence

    rng = np.random.default_rng(21)
    pileups = {}
    for c in range(5):
        n = 300 + 40 * c
        seq = Sequence.from_text(f"ctg{c}", "".join(rng.choice(list("ACGT"), size=n)))
        pileup = ContigPileup.empty(seq)
        for _ in range(900):
            pos = int(rng.integers(0, n))
            row = int(rng.choice([0, 1, 2, 3, 0, 1, 2, 3, 4, 5]))
            target = pileup.middle if rng.random() < 0.8 else pileup.end
            target[row, pos] += 0.5 if rng.random() < 0.3 else 1.0
        pileup.insertions[(n // 2, "GA")] = (2.0, 0.5, "readX")
        if c == 1:
            pileup.deletion_start_middle[n // 3] = 3.0
            pileup.middle[4, n // 3] += 3.0
        pileups[seq] = pileup

    for params in (
        MutationDetectionParameters.empty_filter(),
        MutationDetectionParameters.default_filter(),
    ):
        serial_vcf, par_vcf = _io.StringIO(), _io.StringIO()
        w1 = VcfWriter(serial_vcf, True, params, True)
        w1.write(pileups, num_threads=1)
        w4 = VcfWriter(par_vcf, True, params, True)
        w4.write(pileups, num_threads=4)
        assert serial_vcf.getvalue() == par_vcf.getvalue()
        assert (
            w1.get_num_reference_positions_matched()
            == w4.get_num_reference_positions_matched()
        )

        serial_mut, par_mut = _io.StringIO(), _io.StringIO()
        MutationsWriter(serial_mut, params).write(pileups, num_threads=1)
        MutationsWriter(par_mut, params).write(pileups, num_threads=4)
        assert serial_mut.getvalue() == par_mut.getvalue()
