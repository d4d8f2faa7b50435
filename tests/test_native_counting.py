"""Differential: the native counting layer (native/counting.cpp via
NativeCountingPath) vs the Python CountingHashBlockPath oracle — both the
state-machine queries step-for-step and the full sequential worker output."""

import os

import numpy as np
import pytest

from mapper_tpu import Api, AlignmentParameters
from mapper_tpu.align.candidates import (
    CountingHashBlockPath,
    NativeCountingPath,
    PathsCounter,
)
from mapper_tpu.align.query import Query
from mapper_tpu.align.worker import AlignerWorker
from mapper_tpu.sequence import Sequence


def _simulate(num_reads, seed=7, ref_size=120_000, read_len=150):
    rng = np.random.default_rng(seed)
    bases = np.array(list("ACGT"))
    ref_text = "".join(rng.choice(bases, size=ref_size))
    reads = []
    from mapper_tpu import basepairs

    for i in range(num_reads):
        pos = int(rng.integers(0, ref_size - read_len - 20))
        read = list(ref_text[pos : pos + read_len + 10])
        for j in range(len(read)):
            if rng.random() < 0.03:
                read[j] = str(bases[int(rng.integers(0, 4))])
        for _ in range(int(rng.integers(0, 4))):
            j = int(rng.integers(10, len(read) - 10))
            if rng.random() < 0.5:
                del read[j : j + int(rng.integers(1, 4))]
            else:
                for _k in range(int(rng.integers(1, 4))):
                    read.insert(j, str(bases[int(rng.integers(0, 4))]))
        text = "".join(read[:read_len])
        if rng.random() < 0.5:
            text = basepairs.decode(basepairs.reverse_complement(basepairs.encode(text)))
        reads.append(Sequence.from_text(f"r{i}", text))
    return ref_text, reads


def _counter_key(c):
    m = c.match
    return (
        m.reversed,
        m.sequence_b.name,
        m.offset,
        c.priority,
        c.get_num_distinct_mismatches(),
    )


def test_native_counting_state_machine_matches_python():
    ref_text, reads = _simulate(60)
    index = Api.new_database({"chr1": ref_text})
    db = index.hashblock_database
    params = AlignmentParameters.defaults()

    checked = 0
    for seq in reads:
        nat = NativeCountingPath(db, seq, params)
        if nat._h is None:
            continue  # environment without the native library
        py = CountingHashBlockPath(db, seq, params)
        checked += 1

        # optimistic loop shape: get_best_matches / step until unique or done
        while True:
            bn = nat.get_best_matches()
            bp = py.get_best_matches()
            assert [_counter_key(c) for c in bn] == [_counter_key(c) for c in bp]
            sn = nat.step()
            sp = py.step()
            assert sn == sp
            if len(bp) == 1 or not sp:
                break

        # priority sweep, interleaved with all-positions and best queries
        for priority in range(0, 6):
            gn = nat.find_good_positions_having_priority_up_to(priority)
            gp = py.find_good_positions_having_priority_up_to(priority)
            assert [_counter_key(c) for c in gn] == [_counter_key(c) for c in gp]
            assert nat.get_num_blocks() == py.get_num_blocks()
            assert nat.is_done() == py.is_done()
        an = nat.get_all_positions()
        ap = py.get_all_positions()
        assert [_counter_key(c) for c in an] == [_counter_key(c) for c in ap]

        # exhaust both
        gn = nat.find_good_positions_having_priority_up_to(2**31 - 1)
        gp = py.find_good_positions_having_priority_up_to(2**31 - 1)
        assert [_counter_key(c) for c in gn] == [_counter_key(c) for c in gp]
        assert nat.is_done() and py.is_done()
    assert checked >= 50  # the machinery must actually have been exercised


def _alignment_keys(result):
    out = []
    for comp in result.get_alignments():
        out.append([(a.content_key(), a.get_penalty()) for a in comp])
    return out


def test_worker_output_identical_with_native_counting():
    ref_text, reads = _simulate(120, seed=11)
    index = Api.new_database({"chr1": ref_text})
    params = AlignmentParameters.defaults()

    worker_nat = AlignerWorker(index, params)
    os.environ["MAPPER_TPU_NATIVE_COUNTING"] = "0"
    try:
        worker_py = AlignerWorker(index, params)
        results_py = [worker_py.align(Query(r)) for r in reads]
    finally:
        os.environ.pop("MAPPER_TPU_NATIVE_COUNTING", None)
    results_nat = [worker_nat.align(Query(r)) for r in reads]
    for rn, rp in zip(results_nat, results_py):
        assert _alignment_keys(rn) == _alignment_keys(rp)
