"""API stability + CLI feature tests (reference: ApiTest.java pins Api
signatures and cache-reuse behavior; CLI flags per Mapper.java)."""

import os

import numpy as np
import pytest

from mapper_tpu import Api, AlignmentParameters
from mapper_tpu.align.cache import AlignmentCache
from mapper_tpu.align.query import Query
from mapper_tpu.align.worker import AlignerWorker
from mapper_tpu.sequence import Sequence


def random_text(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


# --- Api stability (ApiTest.java) ------------------------------------------


def test_api_new_database_from_mapping():
    index = Api.new_database({"c1": "ACGTACGTACGT", "c2": "GGCCGGCC"})
    names = [s.name for s in index.sequence_database.get_forward_sequences_only()]
    assert sorted(names) == ["c1", "c2"]


def test_api_new_database_from_file(tmp_path):
    path = tmp_path / "ref.fasta"
    path.write_text(">c1\nACGTACGTACGT\n")
    index = Api.new_database(str(path))
    assert index.sequence_database.get_forward_sequences_only()[0].name == "c1"


def test_api_align_accepts_text_sequence_and_query():
    text = random_text(300, 1)
    index = Api.new_database({"chr": text})
    read = text[50:150]
    r1 = Api.align(read, index)
    r2 = Api.align(Sequence.from_text("q", read), index)
    r3 = Api.align(Query(Sequence.from_text("q", read)), index)
    for r in (r1, r2, r3):
        assert len(r.get_first_alignments()) == 1
        assert r.get_first_alignments()[0].get_component(0).get_start_index_b() == 50


def test_api_align_once():
    text = random_text(300, 2)
    result = Api.align_once({"chr": text}, text[10:110])
    assert len(result.get_first_alignments()) == 1


def test_alignment_cache_reuse():
    # ApiTest pins the "reusing cached result" behavior: a repeated identical
    # read must hit the cache and produce an equal alignment
    text = random_text(500, 3)
    index = Api.new_database({"chr": text})
    cache = AlignmentCache()
    worker = AlignerWorker(index, AlignmentParameters.defaults(), cache=cache)
    read = text[100:250]
    q1 = Query(Sequence.from_text("a", read))
    q2 = Query(Sequence.from_text("b", read))
    r1 = worker.align(q1)
    assert worker.stats.num_cache_hits == 0
    r2 = worker.align(q2)
    assert worker.stats.num_cache_hits == 1
    a1 = r1.get_first_alignments()[0]
    a2 = r2.get_first_alignments()[0]
    assert a1.get_component(0).get_start_index_b() == a2.get_component(0).get_start_index_b()
    # the cached result is rewritten onto the new query's sequences
    assert a2.get_component(0).get_sequence_a().name == "b"


# --- CLI features -----------------------------------------------------------


def run_cli(args):
    from mapper_tpu.cli import main

    return main(args)


def write_files(tmp_path, ref_text, reads):
    ref = tmp_path / "ref.fasta"
    ref.write_text(">chr\n" + ref_text + "\n")
    reads_path = tmp_path / "reads.fasta"
    reads_path.write_text("".join(f">r{i}\n{t}\n" for i, t in enumerate(reads)))
    return str(ref), str(reads_path)


def test_cli_split_queries_past_size(tmp_path):
    ref_text = random_text(2000, 4)
    long_read = ref_text[100:1000]  # 900bp
    ref, reads = write_files(tmp_path, ref_text, [long_read])
    sam = tmp_path / "out.sam"
    assert (
        run_cli(
            [
                "--split-queries-past-size",
                "300",
                "--reference",
                ref,
                "--queries",
                reads,
                "--out-sam",
                str(sam),
            ]
        )
        == 0
    )
    body = [l for l in sam.read_text().splitlines() if not l.startswith("@")]
    # 900bp read split into 3 chunks, each aligned
    assert len(body) == 3
    positions = sorted(int(l.split("\t")[3]) for l in body)
    assert positions == [101, 401, 701]


def test_cli_verify_consistent_db(tmp_path):
    ref_text = random_text(600, 5)
    ref, reads = write_files(tmp_path, ref_text, [ref_text[50:200]])
    out = tmp_path / "out.sam"
    assert (
        run_cli(
            [
                "--verify-consistent-db",
                "--reference",
                ref,
                "--queries",
                reads,
                "--out-sam",
                str(out),
            ]
        )
        == 0
    )


def test_cli_out_mutations_with_thresholds(tmp_path):
    ref_text = random_text(800, 6)
    read = list(ref_text[200:350])
    read[70] = {"A": "C", "C": "G", "G": "T", "T": "A"}[read[70]]
    ref, reads = write_files(tmp_path, ref_text, ["".join(read)] * 6)
    out = tmp_path / "mut.txt"
    assert (
        run_cli(
            [
                "--reference",
                ref,
                "--queries",
                reads,
                "--out-mutations",
                str(out),
                "--snp-threshold",
                "5",
                "0.9",
            ]
        )
        == 0
    )
    rows = [
        l
        for l in out.read_text().splitlines()
        if l and not l.startswith("#") and not l.startswith("CHR")
    ]
    assert len(rows) == 1
    chrom, pos, ref_allele, alt, depth, fraction = rows[0].split("\t")
    assert int(pos) == 271
    assert depth == "6"
    assert fraction == "1"


def test_cli_no_gapmers(tmp_path):
    ref_text = random_text(500, 7)
    ref, reads = write_files(tmp_path, ref_text, [ref_text[100:220]])
    out = tmp_path / "out.sam"
    assert (
        run_cli(["--no-gapmers", "--reference", ref, "--queries", reads, "--out-sam", str(out)])
        == 0
    )
    body = [l for l in out.read_text().splitlines() if not l.startswith("@")]
    assert len(body) == 1
    assert int(body[0].split("\t")[3]) == 101


def test_cli_cache_dir_reuse(tmp_path):
    ref_text = random_text(700, 8)
    ref, reads = write_files(tmp_path, ref_text, [ref_text[50:170]])
    cache = tmp_path / "cache"
    for _ in range(2):
        out = tmp_path / "out.sam"
        assert (
            run_cli(
                [
                    "--cache-dir",
                    str(cache),
                    "--reference",
                    ref,
                    "--queries",
                    reads,
                    "--out-sam",
                    str(out),
                ]
            )
            == 0
        )
    assert any(cache.rglob("length-*.npz"))


def test_cli_verbosity_flags(tmp_path, capsys):
    """-v / --verbose-alignment / --verbose-reference / --verbosity-auto route
    into the Logger/BufferedWriter machinery (Mapper.java:261-281,1014-1019):
    verbose runs emit per-chunk replayed traces and identical output files."""
    ref_text = random_text(3000, 7)
    reads = [ref_text[i : i + 120] for i in (100, 700, 1500)]
    ref, reads_path = write_files(tmp_path, ref_text, reads)

    def go(extra, tag):
        sam = tmp_path / f"out_{tag}.sam"
        assert (
            run_cli(
                ["--reference", ref, "--queries", reads_path, "--out-sam", str(sam)]
                + extra
            )
            == 0
        )
        return sam.read_text(), capsys.readouterr().err

    quiet_sam, quiet_err = go([], "quiet")
    assert "Output from chunk" not in quiet_err
    assert "Aligning query" not in quiet_err

    v_sam, v_err = go(["-v"], "v")
    assert v_sam == quiet_sam
    assert "Output from chunk 0:" in v_err
    assert "Batch of" in v_err  # engine chunk summary

    # the exact engine traces every query decision
    e_sam, e_err = go(["-v", "--engine", "exact"], "exact")
    assert e_sam == quiet_sam
    assert "Aligning query" in e_err
    assert "Optimistic best alignment at" in e_err

    # --verbose-alignment additionally enables the detail (scope-1) logger
    va_sam, va_err = go(["--verbose-alignment", "--engine", "exact"], "va")
    assert va_sam == quiet_sam

    # --verbose-reference logs the index build
    r_sam, r_err = go(["--verbose-reference"], "vr")
    assert r_sam == quiet_sam
    assert "Hashing reference blocks of sizes" in r_err

    # --verbosity-auto: chunk 0 verbose even without -v
    a_sam, a_err = go(["--verbosity-auto"], "auto")
    assert a_sam == quiet_sam
    assert "Output from chunk 0:" in a_err
