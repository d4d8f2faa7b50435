"""The native (C++) candidate generator must be bit-identical to the numpy
path — same rows in the same order."""

import os

import numpy as np
import pytest

from mapper_tpu import Api, basepairs
from mapper_tpu.batch.candidates import (
    ReadBatch,
    _generate_candidates_native,
    generate_candidates,
)
from mapper_tpu.sequence import Sequence


def rows(table):
    return list(
        zip(
            table.read_id.tolist(),
            table.reversed_.tolist(),
            table.ref_seq_index.tolist(),
            table.offset.tolist(),
            table.votes.tolist(),
        )
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_candidates_match_numpy(seed):
    rng = np.random.default_rng(seed)
    ref_text = "".join(rng.choice(list("ACGT"), size=9000))
    index = Api.new_database({"c1": ref_text[:6000], "c2": ref_text[6000:]})
    db = index.hashblock_database
    reads = []
    for i in range(64):
        which = 0 if rng.random() < 0.5 else 6000
        limit = 6000 if which == 0 else 3000
        n = int(rng.integers(40, 220))
        pos = int(rng.integers(0, limit - n - 5))
        read = list(ref_text[which + pos : which + pos + n])
        for _ in range(int(rng.integers(0, 4))):
            j = int(rng.integers(0, len(read)))
            read[j] = {"A": "C", "C": "G", "G": "T", "T": "A"}[read[j]]
        text = "".join(read)
        if rng.random() < 0.5:
            text = basepairs.decode(
                basepairs.reverse_complement(basepairs.encode(text))
            )
        reads.append(Sequence.from_text(f"r{i}", text))
    batch = ReadBatch.from_sequences(reads)

    native_table = _generate_candidates_native(batch, db, 8, 12)
    if native_table is None:
        pytest.skip("native candidates library unavailable")

    os.environ["MAPPER_TPU_NATIVE"] = "0"
    try:
        numpy_table = generate_candidates(batch, db)
    finally:
        os.environ["MAPPER_TPU_NATIVE"] = "1"

    assert rows(native_table) == rows(numpy_table)


def test_native_candidates_short_and_empty_reads():
    index = Api.new_database({"c": "ACGTACGTACGTACGTACGTACGTACGTAC"})
    db = index.hashblock_database
    reads = [
        Sequence.from_text("tiny", "A"),
        Sequence.from_text("short", "ACGTA"),
        Sequence.from_text("exact", "ACGTACGTACGTACGTACGTACGTACGTAC"),
    ]
    batch = ReadBatch.from_sequences(reads)
    native_table = _generate_candidates_native(batch, db, 8, 12)
    if native_table is None:
        pytest.skip("native candidates library unavailable")
    os.environ["MAPPER_TPU_NATIVE"] = "0"
    try:
        numpy_table = generate_candidates(batch, db)
    finally:
        os.environ["MAPPER_TPU_NATIVE"] = "1"
    assert rows(native_table) == rows(numpy_table)


def test_native_index_build_matches_numpy():
    """The native block collector must produce byte-identical PackedIndex maps."""
    rng = np.random.default_rng(9)
    refs = {
        "c1": "".join(rng.choice(list("ACGT"), size=30000)),
        "c2": "".join(rng.choice(list("ACGT"), size=12000)),
    }

    os.environ["MAPPER_TPU_NATIVE"] = "0"
    try:
        idx_np = Api.new_database(refs)
    finally:
        os.environ["MAPPER_TPU_NATIVE"] = "1"
    idx_nat = Api.new_database(refs)

    a = idx_np.hashblock_database
    b = idx_nat.hashblock_database
    assert a.max_fully_set_up_size == b.max_fully_set_up_size
    for size in range(0, a.max_fully_set_up_size + 1):
        ma, mb = a.maps.get(size), b.maps.get(size)
        assert (ma is None) == (mb is None), size
        if ma is None:
            continue
        for field in ("counts", "offsets", "values"):
            assert np.array_equal(getattr(ma, field), getattr(mb, field)), (
                size,
                field,
            )


def test_native_format_rows_non_ascii():
    """Non-ASCII contig names / suffixes pass through the native text-row
    assembler unchanged (utf-8 byte-level assembly) instead of raising."""
    from mapper_tpu.native import native_format_rows

    positions = np.array([5, 17], dtype=np.int64)
    suffix_ids = np.array([0, 1], dtype=np.int32)
    suffixes = ["\tA\t1\n", "\tGé\t2\n"]
    text = native_format_rows("contig·µ\t", positions, suffix_ids, suffixes)
    if text is None:
        pytest.skip("native textrows library unavailable")
    assert text == "contig·µ\t5\tA\t1\ncontig·µ\t17\tGé\t2\n"


def test_native_collect_emit_windowed_identical():
    """The OMP-windowed fused collect+emit produces the identical row multiset
    to a single-window walk and to collect_blocks + the _emit math, on
    structures chosen to stress window boundaries (tandem repeats,
    homopolymers, long-period repeats)."""
    from mapper_tpu import basepairs
    from mapper_tpu.native import native_collect_blocks, native_collect_emit

    def rows_multiset(counts, keys, pos):
        sizes = np.repeat(np.arange(counts.shape[0]), counts)
        order = np.lexsort((pos, keys, sizes))
        return (
            sizes[order].astype(np.int64),
            keys[order].astype(np.int64),
            pos[order],
        )

    rng = np.random.default_rng(42)
    bases = np.array(list("ACGT"))

    def random_text(n):
        return "".join(rng.choice(bases, size=n))

    structures = {
        "random": random_text(120_000),
        "tandem": "ACGTACGTGG" * 5000 + random_text(20_000),
        "homopolymer": random_text(20_000) + "A" * 6000 + random_text(20_000),
        "period1k": random_text(1000) * 40 + random_text(10_000),
    }
    for name, text in structures.items():
        codes = basepairs.encode(text)
        n = len(codes)
        single = native_collect_emit(codes, 9, 0, 42, 10_000, 900_000, window=10**9)
        if single is None:
            pytest.skip("native candidates library unavailable")
        multi = native_collect_emit(
            codes, 9, 0, 42, 10_000, 900_000, window=16384, pad=4096
        )
        tiny = native_collect_emit(
            codes, 9, 0, 42, 10_000, 900_000, window=8192, pad=512
        )
        a = rows_multiset(*single)
        for label, other in (("multi", multi), ("tiny", tiny)):
            b = rows_multiset(*other)
            for x, y in zip(a, b):
                assert np.array_equal(x, y), (name, label)
        collected = native_collect_blocks(codes, 9, 0, 42)
        num_bp, fwd, rev, primary, secondary, start, length = collected
        sizes_ref = np.concatenate([num_bp[primary], num_bp[secondary]]).astype(np.int64)
        keys_ref = np.concatenate([fwd[primary], rev[secondary]]).astype(np.int64)
        pos_ref = np.concatenate(
            [
                10_000 + start[primary],
                900_000 + n - (start[secondary] + length[secondary]),
            ]
        )
        order = np.lexsort((pos_ref, keys_ref, sizes_ref))
        ref = (sizes_ref[order], keys_ref[order], pos_ref[order])
        for x, y in zip(a, ref):
            assert np.array_equal(x, y), (name, "vs collect_blocks")
