"""Differential tests for the native exact paired-combo driver
(dp.cpp::mapper_pair_driver_batch vs the Python oracle
engine._align_paired_pair_exact_inner).

The native driver must make the SAME decision as the Python driver for every
deferred pair: same worker-fallback set (None results), same choice sets
(content keys, penalties, spacing, inner distances) — the Python driver is
the oracle and remains the fallback for overlap-regime pairs and native DP
bails.  Reference semantics under test: QueryMatch_Aligner.java:35-92,
207-239, 530-546 plus the batch engine's offset-invariance gate.
"""

import os

import numpy as np
import pytest

from mapper_tpu import AlignmentParameters, Api
from mapper_tpu.align.query import Query
from mapper_tpu.batch.engine import BatchAligner


def _hard_pairs(n_pairs: int, seed: int, reference_size: int = 120_000):
    import benchmarks.bench_hard_pe as hpe

    old = (hpe.NUM_PAIRS, hpe.REFERENCE_SIZE)
    hpe.NUM_PAIRS = n_pairs
    hpe.REFERENCE_SIZE = reference_size
    try:
        return hpe.simulate(seed=seed)
    finally:
        hpe.NUM_PAIRS, hpe.REFERENCE_SIZE = old


def _summarize(result):
    if result is None:
        return None
    rows = [getattr(result, "via_exact", False)]
    for alist in result.get_alignments():
        rows.append(
            tuple(
                sorted(
                    (
                        a.get_penalty(),
                        a.spacing_penalty,
                        a.inner_distance,
                        tuple(c.content_key() for c in a.get_components()),
                        tuple(
                            (c.get_penalty(), c.get_aligned_penalty())
                            for c in a.get_components()
                        ),
                    )
                    for a in alist
                )
            )
        )
    return tuple(rows)


def _run_paired(queries, index, params, native: bool):
    old = os.environ.get("MAPPER_TPU_NATIVE_PAIR")
    os.environ["MAPPER_TPU_NATIVE_PAIR"] = "1" if native else "0"
    try:
        engine = BatchAligner(index, params)
        return engine._align_paired_batch(list(queries))
    finally:
        if old is None:
            os.environ.pop("MAPPER_TPU_NATIVE_PAIR", None)
        else:
            os.environ["MAPPER_TPU_NATIVE_PAIR"] = old


def test_native_pair_driver_differential_hard():
    """Hard indel-rich pairs: every deferred pair's native decision equals the
    Python driver's, including which pairs fall back to the worker (None)."""
    from mapper_tpu.native import get_library

    if get_library() is None:
        pytest.skip("native library unavailable")

    ref_text, pairs = _hard_pairs(220, seed=77)
    index = Api.new_database({"chr1": ref_text})
    params = AlignmentParameters.defaults()
    queries = [
        Query([a, b], expected_inner_distance=100, spacing_deviation_per_unit_penalty=50)
        for a, b in pairs
    ]
    py = _run_paired(queries, index, params, native=False)
    nat = _run_paired(queries, index, params, native=True)
    mismatches = [
        (i, _summarize(nat[i]), _summarize(py[i]))
        for i in range(len(queries))
        if _summarize(nat[i]) != _summarize(py[i])
    ]
    assert not mismatches, (len(mismatches), mismatches[:2])


def test_native_pair_driver_differential_clean_and_snp():
    """Clean and SNP-only pairs (few deferrals, exercises the vectorized path
    boundary) plus short inner distances that flirt with the overlap regime
    (those pairs must bail to the Python driver and still agree)."""
    from mapper_tpu.native import get_library

    if get_library() is None:
        pytest.skip("native library unavailable")

    from mapper_tpu import basepairs
    from mapper_tpu.sequence import Sequence

    rng = np.random.default_rng(4242)
    bases = np.array(list("ACGT"))
    ref_text = "".join(rng.choice(bases, size=80_000))

    def rc(t):
        return basepairs.decode(basepairs.reverse_complement(basepairs.encode(t)))

    queries = []
    for i in range(160):
        # inner distance mixes normal spacing with overlap-adjacent values
        inner = int(rng.normal(30, 60)) if i % 3 == 0 else int(rng.normal(100, 30))
        frag = 300 + inner
        if frag < 160:
            frag = 160
            inner = frag - 300
        pos = int(rng.integers(0, 80_000 - frag - 20))
        m1 = list(ref_text[pos : pos + 150])
        m2 = list(ref_text[pos + frag - 150 : pos + frag])
        for read in (m1, m2):
            for _ in range(int(rng.integers(0, 6))):
                j = int(rng.integers(0, len(read)))
                read[j] = str(bases[int(rng.integers(0, 4))])
            if rng.random() < 0.3:  # occasional indel event
                j = int(rng.integers(10, len(read) - 10))
                if rng.random() < 0.5:
                    del read[j : j + int(rng.integers(1, 3))]
                else:
                    read.insert(j, str(bases[int(rng.integers(0, 4))]))
        queries.append(
            Query(
                [
                    Sequence.from_text(f"p{i}/1", "".join(m1[:150])),
                    Sequence.from_text(f"p{i}/2", rc("".join(m2[:150]))),
                ],
                expected_inner_distance=100,
                spacing_deviation_per_unit_penalty=50,
            )
        )

    index = Api.new_database({"chr1": ref_text})
    params = AlignmentParameters.defaults()
    py = _run_paired(queries, index, params, native=False)
    nat = _run_paired(queries, index, params, native=True)
    mismatches = [
        (i, _summarize(nat[i]), _summarize(py[i]))
        for i in range(len(queries))
        if _summarize(nat[i]) != _summarize(py[i])
    ]
    assert not mismatches, (len(mismatches), mismatches[:2])
