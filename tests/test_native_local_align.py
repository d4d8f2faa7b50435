"""Differential tests: the native full local_align (dp.cpp::
mapper_local_align_one/_batch) against the Python oracle (dp.py::local_align
with MAPPER_TPU_NATIVE=0).  Block-for-block equality plus EXACT float equality
of total/aligned penalties (the native path replicates numpy's pairwise
summation and the Python operation order bit-for-bit)."""

import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.align.dp import AlignmentAnalysis, local_align
from mapper_tpu.align.params import AlignmentParameters
from mapper_tpu.native import get_library, native_local_align_batch
from mapper_tpu.sequence import Sequence

pytestmark = pytest.mark.skipif(
    get_library() is None, reason="native library unavailable"
)


def summarize(alignment):
    if alignment is None:
        return None
    return (
        alignment.is_reference_reversed(),
        alignment.get_penalty(),
        alignment.get_aligned_penalty(),
        tuple(
            (s.start_a, s.start_b, s.length_a, s.length_b)
            for s in alignment.sections
        ),
    )


def run_both(query, ref, r_start, r_end, params, analysis, monkeypatch):
    monkeypatch.setenv("MAPPER_TPU_NATIVE", "1")
    native = local_align(query, ref, 0, len(query), r_start, r_end, params, analysis)
    monkeypatch.setenv("MAPPER_TPU_NATIVE", "0")
    oracle = local_align(query, ref, 0, len(query), r_start, r_end, params, analysis)
    return native, oracle


def make_problem(rng, ref_len=600, q_len=None, snps=0, indels=0, n_amb=0):
    ref_codes = basepairs.encode(
        "".join(rng.choice(list("ACGT"), size=ref_len))
    )
    q_len = q_len or int(rng.integers(40, 200))
    pos = int(rng.integers(0, ref_len - q_len))
    read = list(ref_codes[pos : pos + q_len])
    for _ in range(snps):
        j = int(rng.integers(0, len(read)))
        read[j] = [1, 2, 4, 8][int(rng.integers(0, 4))]
    for _ in range(indels):
        j = int(rng.integers(5, len(read) - 5))
        if rng.random() < 0.5:
            del read[j : j + int(rng.integers(1, 4))]
        else:
            for _k in range(int(rng.integers(1, 4))):
                read.insert(j, [1, 2, 4, 8][int(rng.integers(0, 4))])
    for _ in range(n_amb):
        j = int(rng.integers(0, len(read)))
        read[j] = int(rng.integers(1, 16))  # any IUPAC code
    query = Sequence("q", np.array(read[: q_len + 8], dtype=np.uint8))
    ref = Sequence("r", ref_codes)
    return query, ref, pos


@pytest.mark.parametrize("seed", range(30))
def test_native_local_align_random(seed, monkeypatch):
    rng = np.random.default_rng(seed)
    params = AlignmentParameters.defaults(
        max_error_rate=float(rng.choice([0.05, 0.1, 0.2, 0.3]))
    )
    query, ref, pos = make_problem(
        rng,
        snps=int(rng.integers(0, 8)),
        indels=int(rng.integers(0, 3)),
        n_amb=int(rng.integers(0, 3)),
    )
    n = len(query)
    max_interesting = n * params.max_error_rate
    max_indel = int(
        max(
            0.0,
            (max_interesting - params.deletion_start_penalty)
            / params.deletion_extension_penalty,
        )
    )
    jitter = int(rng.integers(-3, 4))
    offset = pos + jitter
    r_start = max(0, offset - max_indel)
    r_end = min(offset + n + max_indel, len(ref))
    analysis = AlignmentAnalysis(
        predicted_best_offset=offset,
        confident_about_best_offset=bool(rng.random() < 0.8),
        max_insertion_extension_penalty=max_interesting - params.insertion_start_penalty,
        max_deletion_extension_penalty=max_interesting - params.deletion_start_penalty,
    )
    native, oracle = run_both(query, ref, r_start, r_end, params, analysis, monkeypatch)
    assert summarize(native) == summarize(oracle), seed


@pytest.mark.parametrize("edge", ["start", "end", "both"])
def test_native_local_align_contig_edges(edge, monkeypatch):
    rng = np.random.default_rng(hash(edge) % 2**32)
    params = AlignmentParameters.defaults()
    for trial in range(20):
        ref_codes = basepairs.encode("".join(rng.choice(list("ACGT"), size=300)))
        ref = Sequence("r", ref_codes)
        q_len = int(rng.integers(40, 120))
        if edge in ("start", "both"):
            pos = 0
            hang = int(rng.integers(0, 15))
            read = np.concatenate(
                [
                    basepairs.encode("".join(rng.choice(list("ACGT"), size=hang))),
                    ref_codes[: q_len - hang],
                ]
            )
            offset = -hang
        else:
            pos = 300 - q_len
            hang = int(rng.integers(0, 15))
            read = np.concatenate(
                [
                    ref_codes[pos + hang :],
                    basepairs.encode("".join(rng.choice(list("ACGT"), size=hang))),
                ]
            )
            offset = pos + hang
        query = Sequence("q", np.array(read, dtype=np.uint8))
        n = len(query)
        max_interesting = n * params.max_error_rate
        max_indel = int(
            max(
                0.0,
                (max_interesting - params.deletion_start_penalty)
                / params.deletion_extension_penalty,
            )
        )
        r_start = max(0, offset - max_indel)
        r_end = min(offset + n + max_indel, len(ref))
        if edge == "both":
            r_start, r_end = 0, len(ref)
        if r_end <= r_start:
            continue
        analysis = AlignmentAnalysis(
            predicted_best_offset=offset,
            confident_about_best_offset=True,
            max_insertion_extension_penalty=max_interesting
            - params.insertion_start_penalty,
            max_deletion_extension_penalty=max_interesting
            - params.deletion_start_penalty,
        )
        native, oracle = run_both(
            query, ref, r_start, r_end, params, analysis, monkeypatch
        )
        assert summarize(native) == summarize(oracle), (edge, trial)


def test_native_local_align_window_shorter_than_query(monkeypatch):
    """m < n regime (reference window shorter than the query, e.g. a tiny
    contig): the DP's column-0 start nodes carry the alignment — regression
    for the banded-init B(0,0) node."""
    rng = np.random.default_rng(909)
    for trial in range(40):
        ref_len = int(rng.integers(12, 40))
        ref = Sequence(
            "r",
            basepairs.encode("".join(rng.choice(list("ACGT"), size=ref_len))),
        )
        extra = int(rng.integers(1, 8))
        read = list(ref.codes)
        j = int(rng.integers(1, ref_len - 1))
        for _k in range(extra):
            read.insert(j, [1, 2, 4, 8][int(rng.integers(0, 4))])
        if rng.random() < 0.5:
            jj = int(rng.integers(0, len(read)))
            read[jj] = [1, 2, 4, 8][int(rng.integers(0, 4))]
        query = Sequence("q", np.array(read, dtype=np.uint8))
        params = AlignmentParameters.defaults(max_error_rate=0.3)
        n = len(query)
        max_interesting = n * params.max_error_rate
        analysis = AlignmentAnalysis(
            predicted_best_offset=0,
            confident_about_best_offset=True,
            max_insertion_extension_penalty=max_interesting
            - params.insertion_start_penalty,
            max_deletion_extension_penalty=max_interesting
            - params.deletion_start_penalty,
        )
        native, oracle = run_both(
            query, ref, 0, ref_len, params, analysis, monkeypatch
        )
        assert summarize(native) == summarize(oracle), trial


def test_native_local_align_high_ambiguity_window(monkeypatch):
    """SkipHighAmbiguity: >= 1/4 ambiguous reference bases disables the
    gapped search; the native path must take the same branch."""
    rng = np.random.default_rng(424)
    params = AlignmentParameters.defaults()
    ref_list = list("".join(rng.choice(list("ACGT"), size=200)))
    for j in rng.choice(200, size=80, replace=False):
        ref_list[j] = "N"
    ref = Sequence.from_text("r", "".join(ref_list))
    query = Sequence.from_text("q", "".join(rng.choice(list("ACGT"), size=80)))
    n = len(query)
    max_interesting = n * params.max_error_rate
    analysis = AlignmentAnalysis(
        predicted_best_offset=50,
        confident_about_best_offset=True,
        max_insertion_extension_penalty=max_interesting - params.insertion_start_penalty,
        max_deletion_extension_penalty=max_interesting - params.deletion_start_penalty,
    )
    native, oracle = run_both(query, ref, 20, 180, params, analysis, monkeypatch)
    assert summarize(native) == summarize(oracle)


def test_native_local_align_batch_matches_serial(monkeypatch):
    """The OpenMP batch entry must agree with the Python oracle problem by
    problem (exercises the flat-buffer packing and per-problem rates)."""
    rng = np.random.default_rng(77)
    params = AlignmentParameters.defaults()
    problems = []
    qbuf_parts, wbuf_parts = [], []
    q_off, q_len, w_off, w_len = [], [], [], []
    r_starts, preds, at_s, at_e, conf, rates = [], [], [], [], [], []
    qo = wo = 0
    for i in range(60):
        query, ref, pos = make_problem(
            rng, snps=int(rng.integers(0, 6)), indels=int(rng.integers(0, 3))
        )
        n = len(query)
        rate = float(rng.choice([0.08, 0.1, 0.15]))
        p_i = params.clone(max_error_rate=rate)
        max_interesting = n * rate
        max_indel = int(
            max(
                0.0,
                (max_interesting - params.deletion_start_penalty)
                / params.deletion_extension_penalty,
            )
        )
        offset = pos + int(rng.integers(-2, 3))
        r_start = max(0, offset - max_indel)
        r_end = min(offset + n + max_indel, len(ref))
        analysis = AlignmentAnalysis(
            predicted_best_offset=offset,
            confident_about_best_offset=True,
            max_insertion_extension_penalty=max_interesting
            - params.insertion_start_penalty,
            max_deletion_extension_penalty=max_interesting
            - params.deletion_start_penalty,
        )
        problems.append((query, ref, r_start, r_end, p_i, analysis))
        qbuf_parts.append(query.codes)
        wbuf_parts.append(ref.codes[r_start:r_end])
        q_off.append(qo)
        q_len.append(n)
        w_off.append(wo)
        w_len.append(r_end - r_start)
        r_starts.append(r_start)
        preds.append(offset - r_start)
        at_s.append(r_start == 0)
        at_e.append(r_end == len(ref))
        conf.append(True)
        rates.append(rate)
        qo += n
        wo += r_end - r_start

    out = native_local_align_batch(
        np.concatenate(qbuf_parts),
        np.array(q_off, dtype=np.int64),
        np.array(q_len, dtype=np.int32),
        np.concatenate(wbuf_parts),
        np.array(w_off, dtype=np.int64),
        np.array(w_len, dtype=np.int32),
        np.array(r_starts, dtype=np.int64),
        np.array(preds, dtype=np.int32),
        np.array(at_s, dtype=np.uint8),
        np.array(at_e, dtype=np.uint8),
        np.array(conf, dtype=np.uint8),
        np.array(rates, dtype=np.float64),
        params,
    )
    assert out is not None
    status, nblocks, blocks, total, aligned = out
    monkeypatch.setenv("MAPPER_TPU_NATIVE", "0")
    for i, (query, ref, r_start, r_end, p_i, analysis) in enumerate(problems):
        oracle = local_align(query, ref, 0, len(query), r_start, r_end, p_i, analysis)
        if status[i] == -1:
            assert oracle is None, i
            continue
        assert status[i] in (0, 1), i
        assert oracle is not None, i
        got_blocks = tuple(
            (sa, r_start + sb, la, lb)
            for sa, sb, la, lb in blocks[i, : nblocks[i]].tolist()
        )
        exp_blocks = tuple(
            (s.start_a, s.start_b, s.length_a, s.length_b) for s in oracle.sections
        )
        assert got_blocks == exp_blocks, i
        assert float(total[i]) == oracle.get_penalty(), i
        assert float(aligned[i]) == oracle.get_aligned_penalty(), i


@pytest.mark.parametrize(
    "pkw",
    [
        {},
        {"mutation_penalty": 0.0},
        {"ambiguity_penalty": 0.0},
        {"mutation_penalty": 6.0, "indel_start_penalty": 9.0,
         "indel_extension_penalty": 5.0},
    ],
)
def test_simd_wave_batch_matches_scalar(monkeypatch, pkw):
    """The grouped four-lane wave fill (dp.cpp::dp_fill_x4, MAPPER_TPU_SIMD_WAVE)
    must produce byte-identical outputs to the per-problem scalar path for
    every problem of a mixed batch (varying predicted offsets, rates, edge
    flags, ambiguity — the grouping must never change results)."""
    import numpy as np

    from mapper_tpu import AlignmentParameters
    from mapper_tpu.native import native_local_align_batch, get_library

    if get_library() is None:
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(23)
    codes4 = np.array([1, 2, 4, 8], dtype=np.uint8)
    qparts, wparts = [], []
    q_off, q_len, w_off, w_len = [], [], [], []
    r_starts, preds, at_s, at_e, conf, rates = [], [], [], [], [], []
    qo = wo = 0
    k = 240
    for i in range(k):
        n = int(rng.choice([100, 150, 150, 150]))
        pad = int(rng.integers(5, 40))
        ref = codes4[rng.integers(0, 4, size=n + 2 * pad)]
        q = ref[pad : pad + n].copy()
        for _ in range(int(rng.integers(0, 8))):
            q[rng.integers(0, n)] = codes4[rng.integers(0, 4)]
        if rng.random() < 0.6:
            j = int(rng.integers(10, n - 10))
            d = int(rng.integers(1, 4))
            if rng.random() < 0.5:
                q = np.concatenate([q[:j], q[j + d:]])
            else:
                q = np.concatenate([q[:j], codes4[rng.integers(0, 4, size=d)], q[j:]])
        if rng.random() < 0.1:
            q[int(rng.integers(0, len(q)))] = 15  # ambiguity
        qparts.append(q)
        wparts.append(ref)
        q_off.append(qo); q_len.append(len(q))
        w_off.append(wo); w_len.append(len(ref))
        qo += len(q); wo += len(ref)
        r_starts.append(int(rng.integers(0, 1000)))
        preds.append(pad + int(rng.integers(-3, 4)))
        at_s.append(bool(rng.random() < 0.1))
        at_e.append(bool(rng.random() < 0.1))
        conf.append(bool(rng.random() < 0.7))
        rates.append(float(rng.choice([0.1, 0.1, 0.1, 0.2])))

    args = (
        np.concatenate(qparts), np.array(q_off, np.int64), np.array(q_len, np.int32),
        np.concatenate(wparts), np.array(w_off, np.int64), np.array(w_len, np.int32),
        np.array(r_starts, np.int64), np.array(preds, np.int32),
        np.array(at_s, np.uint8), np.array(at_e, np.uint8),
        np.array(conf, np.uint8), np.array(rates, np.float64),
        AlignmentParameters.defaults(**pkw),
    )
    monkeypatch.setenv("MAPPER_TPU_SIMD_WAVE", "0")
    scalar = native_local_align_batch(*args)
    monkeypatch.setenv("MAPPER_TPU_SIMD_WAVE", "1")
    simd = native_local_align_batch(*args)
    defined = scalar[0] >= 0  # out_total/aligned stay uninitialized on -1/-2
    for a, b, name in zip(scalar, simd, ("status", "nblocks", "blocks", "total", "aligned")):
        if name == "blocks":
            for i in range(k):
                nb = int(scalar[1][i])
                np.testing.assert_array_equal(a[i, :nb], b[i, :nb], err_msg=f"row {i}")
        elif name in ("total", "aligned"):
            np.testing.assert_array_equal(a[defined], b[defined], err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)
