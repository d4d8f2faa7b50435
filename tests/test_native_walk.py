"""Differential: the native interesting-gapmer walk (candidates.cpp::
mapper_query_walk) against the Python HashBlockPath walk, block for block,
including lazy database growth triggers."""

import numpy as np
import pytest

from mapper_tpu import Api, basepairs
from mapper_tpu.align.candidates import HashBlockPath, QueryPyramid
from mapper_tpu.native import get_candidates_library
from mapper_tpu.sequence import Sequence

pytestmark = pytest.mark.skipif(
    get_candidates_library() is None, reason="native library unavailable"
)


def python_walk(db, query, monkeypatch):
    monkeypatch.setenv("MAPPER_TPU_NATIVE", "0")
    path = HashBlockPath(QueryPyramid(query), db, query)
    out = []
    while True:
        b = path.get_next_interesting_block()
        if b is None:
            return out
        out.append(
            (
                b.start,
                b.length,
                b.num_basepairs_used,
                b.fwd,
                b.rev,
                b.lookup_key(),
                b.is_primary_polarity(),
                b.gapped_block1_length,
                b.gapped_gap_length,
            )
        )


def native_walk(db, query, monkeypatch):
    monkeypatch.setenv("MAPPER_TPU_NATIVE", "1")
    path = HashBlockPath(QueryPyramid(query), db, query)
    assert path._native_seq is not None, "native walk unexpectedly unavailable"
    out = []
    while True:
        b = path.get_next_interesting_block()
        if b is None:
            return out
        out.append(
            (
                b.start,
                b.length,
                b.num_basepairs_used,
                b.fwd,
                b.rev,
                b.lookup_key(),
                b.is_primary_polarity(),
                b.gapped_block1_length,
                b.gapped_gap_length,
            )
        )


@pytest.mark.parametrize("seed", range(6))
def test_native_walk_matches_python(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    ref_text = "".join(rng.choice(list("ACGT"), size=60000))
    index = Api.new_database({"a": ref_text[:40000], "b": ref_text[40000:]})
    db = index.hashblock_database
    for t in range(25):
        n = int(rng.integers(30, 400))
        if rng.random() < 0.7:
            pos = int(rng.integers(0, 40000 - n))
            read = list(basepairs.encode(ref_text[pos : pos + n]))
            for _ in range(int(rng.integers(0, 8))):
                read[int(rng.integers(0, n))] = [1, 2, 4, 8][int(rng.integers(0, 4))]
        else:
            read = [[1, 2, 4, 8][int(rng.integers(0, 4))] for _ in range(n)]
        query = Sequence("q", np.array(read, dtype=np.uint8))
        # native first (may trigger growth), then python sees the same
        # grown database; then re-run native to confirm convergence
        got = native_walk(db, query, monkeypatch)
        exp = python_walk(db, query, monkeypatch)
        assert got == exp, (seed, t)


def test_native_walk_growth_trigger(monkeypatch):
    """A highly repetitive query forces blocks beyond the set-up size; the
    native walk must request growth and converge to the Python sequence."""
    rng = np.random.default_rng(99)
    unit = "".join(rng.choice(list("ACGT"), size=40))
    ref_text = (unit * 200) + "".join(rng.choice(list("ACGT"), size=4000))
    index = Api.new_database({"rep": ref_text})
    db = index.hashblock_database
    query = Sequence.from_text("q", unit * 10)
    before = db.max_fully_set_up_size
    got = native_walk(db, query, monkeypatch)
    exp = python_walk(db, query, monkeypatch)
    assert got == exp
    assert db.max_fully_set_up_size >= before


def test_prefetched_matches_equal_match_block(monkeypatch):
    """CountingHashBlockPath's batched lookup prefetch must return exactly
    what database.match_block returns for every walked block (including
    too-popular None and secondary-polarity strand folds)."""
    from mapper_tpu.align.candidates import CountingHashBlockPath
    from mapper_tpu.align.params import AlignmentParameters

    monkeypatch.setenv("MAPPER_TPU_NATIVE", "1")
    # pin the numpy v1 prefetch (the native fused prefetch skips building
    # the raw per-block match lists this test compares)
    monkeypatch.setenv("MAPPER_TPU_NATIVE_FOLD", "0")
    rng = np.random.default_rng(3)
    # a repetitive reference makes popular bins likely
    unit = "".join(rng.choice(list("ACGT"), size=120))
    ref_text = unit * 40 + "".join(rng.choice(list("ACGT"), size=30000))
    index = Api.new_database({"r": ref_text})
    db = index.hashblock_database
    params = AlignmentParameters.defaults()
    checked = 0
    for t in range(30):
        if rng.random() < 0.4:
            read = unit[: int(rng.integers(40, 120))]
        else:
            pos = int(rng.integers(0, 30000))
            read = ref_text[len(unit) * 40 + pos :][: int(rng.integers(60, 200))]
            if len(read) < 40:
                continue
        query = Sequence.from_text("q", read)
        cp = CountingHashBlockPath(db, query, params)
        if cp._prefetched is None:
            continue
        seq_arr = cp.path._native_seq
        for k in range(seq_arr.shape[0]):
            start, total_len, num_bp, fwd, rev, req_l, req_r, b1, gap = seq_arr[
                k
            ].tolist()
            primary = bool(req_l) if bool(req_l) != bool(req_r) else fwd >= rev
            key = fwd if primary else rev
            expected = db.match_block(num_bp, total_len, key, primary)
            got = cp._prefetched[k]
            if expected is None:
                assert got is None, (t, k)
            else:
                assert got is not None and np.array_equal(got, expected), (t, k)
            checked += 1
    assert checked > 200


def test_fold_and_filter_matches_python(monkeypatch):
    """The fully-resolved prefetch (decode + native collision batch + strand
    fold; candidates._fold_and_filter) must replay into _update_matches the
    exact row sequence the per-match Python branch produces — pinned by
    comparing full worker outputs with MAPPER_TPU_NATIVE_FOLD on/off over
    SNP+indel reads (both orientations, repeats for popular bins)."""
    from mapper_tpu.align.params import AlignmentParameters
    from mapper_tpu.align.worker import AlignerWorker

    rng = np.random.default_rng(99)
    unit = "".join(rng.choice(list("ACGT"), size=90))
    ref_text = unit * 25 + "".join(rng.choice(list("ACGT"), size=40000))
    index = Api.new_database({"r": ref_text})
    params = AlignmentParameters.defaults()

    def simulate_read(i):
        from mapper_tpu import basepairs

        pos = int(rng.integers(0, 39800))
        read = list(ref_text[len(unit) * 25 + pos :][:150])
        for _ in range(int(rng.integers(0, 7))):
            j = int(rng.integers(0, len(read)))
            read[j] = "ACGT"[int(rng.integers(0, 4))]
        if rng.random() < 0.5:
            j = int(rng.integers(10, len(read) - 10))
            if rng.random() < 0.5:
                del read[j : j + int(rng.integers(1, 4))]
            else:
                read.insert(j, "ACGT"[int(rng.integers(0, 4))])
        text = "".join(read)
        if rng.random() < 0.5:
            text = basepairs.decode(
                basepairs.reverse_complement(basepairs.encode(text))
            )
        return Sequence.from_text(f"q{i}", text)

    reads = [simulate_read(i) for i in range(60)]
    reads.append(Sequence.from_text("rep", unit * 2))  # popular bins

    def summarize(result):
        rows = []
        for alist in result.get_alignments():
            rows.append(
                tuple(
                    sorted(
                        (
                            a.get_penalty(),
                            tuple(c.content_key() for c in a.get_components()),
                        )
                        for a in alist
                    )
                )
            )
        return tuple(rows)

    from mapper_tpu.align.query import Query

    monkeypatch.setenv("MAPPER_TPU_NATIVE_FOLD", "0")
    worker_py = AlignerWorker(index, params)
    expected = [summarize(worker_py.align(Query(r))) for r in reads]
    monkeypatch.setenv("MAPPER_TPU_NATIVE_FOLD", "1")
    worker_nat = AlignerWorker(index, params)
    got = [summarize(worker_nat.align(Query(r))) for r in reads]
    assert got == expected


def test_prefetch_fold_native_equals_python(monkeypatch):
    """mapper_prefetch_fold (one native call for lookups + secondary fold +
    collision checks + strand fold) must produce exactly the arrays the
    numpy pipeline (_prefetch_matches -> _fold_and_filter) produces."""
    from mapper_tpu.align.candidates import CountingHashBlockPath
    from mapper_tpu.align.params import AlignmentParameters
    from mapper_tpu.native import native_prefetch_fold

    rng = np.random.default_rng(17)
    unit = "".join(rng.choice(list("ACGT"), size=100))
    ref_text = unit * 30 + "".join(rng.choice(list("ACGT"), size=25000))
    index = Api.new_database({"r": ref_text})
    db = index.hashblock_database
    params = AlignmentParameters.defaults()
    monkeypatch.setenv("MAPPER_TPU_NATIVE_FOLD", "0")  # force the numpy path
    checked = 0
    for t in range(25):
        if rng.random() < 0.3:
            read = unit[: int(rng.integers(40, 100))] + "".join(
                rng.choice(list("ACGT"), size=20)
            )
        else:
            pos = int(rng.integers(0, 24000))
            read = ref_text[len(unit) * 30 + pos :][: int(rng.integers(60, 200))]
            if len(read) < 40:
                continue
        query = Sequence.from_text("q", read)
        cp = CountingHashBlockPath(db, query, params)
        seq_arr = cp.path._native_seq
        if seq_arr is None or not seq_arr.shape[0] or cp._prefetched is None:
            continue
        expected = cp._fold_and_filter(seq_arr, cp._prefetched)
        got = native_prefetch_fold(seq_arr, db, query.codes)
        assert got is not None and expected is not None
        e_fi, e_fo, e_rc, e_bounds, e_pop = expected
        popular, raw_counts, bounds, fi, fo, ir = got
        np.testing.assert_array_equal(popular, e_pop, err_msg=str(t))
        np.testing.assert_array_equal(bounds, e_bounds, err_msg=str(t))
        np.testing.assert_array_equal(fi, e_fi, err_msg=str(t))
        np.testing.assert_array_equal(fo, e_fo, err_msg=str(t))
        np.testing.assert_array_equal(ir, e_rc, err_msg=str(t))
        # raw counts must equal the unfiltered match_block list lengths
        for k in range(seq_arr.shape[0]):
            raw = cp._prefetched[k]
            np.testing.assert_equal(
                raw_counts[k], 0 if raw is None else raw.shape[0]
            )
        checked += 1
    assert checked > 10
