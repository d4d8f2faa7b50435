"""Native DP differential tests: the C++ library must produce block-for-block
identical tracebacks to the numpy oracle."""

import os

import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.align.dp import _forward_dp, _traceback
from mapper_tpu.align.params import AlignmentParameters
from mapper_tpu.native import get_library, native_dp_align


pytestmark = pytest.mark.skipif(
    get_library() is None, reason="native library unavailable (no g++?)"
)


def numpy_dp(q, w, params, may_extend, max_ins_ext, max_interesting):
    best, insx, insy = _forward_dp(q, w, params, may_extend, max_ins_ext)
    n = q.shape[0]
    goal_y = int(np.argmin(best[n, :]))
    if best[n, goal_y] > max_interesting + 1e-6:
        return None
    raw = _traceback(best, insx, insy, goal_y, params, may_extend)
    return raw if raw else None


def make_case(rng, n, shift, snps, indel):
    bases = np.array([1, 2, 4, 8], dtype=np.uint8)
    ref = bases[rng.integers(0, 4, size=n + 2 * shift)]
    q = list(ref[shift : shift + n])
    for _ in range(snps):
        q[int(rng.integers(0, len(q)))] = int(bases[rng.integers(0, 4)])
    if indel:
        pos = int(rng.integers(5, len(q) - 5))
        if rng.random() < 0.5:
            q.insert(pos, int(bases[rng.integers(0, 4)]))
        else:
            del q[pos]
    return np.array(q, dtype=np.uint8), ref


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("may_extend", [False, True])
def test_native_matches_numpy(seed, may_extend):
    rng = np.random.default_rng(seed)
    params = AlignmentParameters.defaults(max_error_rate=0.2)
    q, w = make_case(rng, 60, 10, snps=int(rng.integers(0, 3)), indel=seed % 2 == 0)
    max_interesting = len(q) * params.max_error_rate
    max_ins_ext = max_interesting - params.insertion_start_penalty
    expected = numpy_dp(q, w, params, may_extend, max_ins_ext, max_interesting)
    native = native_dp_align(q, w, params, may_extend, max_ins_ext, max_interesting)
    assert native is not None
    blocks, _ = native
    got = [tuple(int(v) for v in row) for row in blocks[::-1]] if blocks.shape[0] else None
    assert got == expected, f"seed {seed} may_extend {may_extend}"


def test_native_used_by_default_in_path_align(monkeypatch):
    # the sequential engine must produce identical alignments with and without
    # the native library
    from mapper_tpu import Api, AlignmentParameters

    rng = np.random.default_rng(55)
    ref_text = "".join(np.random.default_rng(54).choice(list("ACGT"), size=800))
    read = list(ref_text[100:250])
    read[30] = {"A": "C", "C": "G", "G": "T", "T": "A"}[read[30]]
    del read[90]
    text = "".join(read)
    index = Api.new_database({"chr": ref_text})
    params = AlignmentParameters.defaults()

    monkeypatch.setenv("MAPPER_TPU_NATIVE", "1")
    with_native = Api.align(text, index, params)
    monkeypatch.setenv("MAPPER_TPU_NATIVE", "0")
    without_native = Api.align(text, index, params)

    def summarize(result):
        return sorted(
            (
                c.get_component(0).get_start_index_b(),
                round(c.get_penalty(), 9),
                tuple(
                    (s.start_a, s.start_b, s.length_a, s.length_b)
                    for s in c.get_component(0).sections
                ),
            )
            for c in result.get_first_alignments()
        )

    assert summarize(with_native) == summarize(without_native)
    assert len(with_native.get_first_alignments()) == 1
