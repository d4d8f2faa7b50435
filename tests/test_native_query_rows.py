"""Differential: the native pyramid row builder (candidates.cpp::
mapper_query_rows) against the vectorized Python row kernels
(index/hashblock.py), field for field at every level."""

import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.align.candidates import _convert_block_row, _convert_fields_row
from mapper_tpu.index import hashblock as hb
from mapper_tpu.native import get_candidates_library, native_query_rows

pytestmark = pytest.mark.skipif(
    get_candidates_library() is None, reason="native library unavailable"
)


def block_key(b):
    return (
        b.start,
        b.length,
        b.fwd,
        b.rev,
        b.req_l,
        b.req_r,
        b.next_l,
        b.next_r,
        b.gap_dir,
        b.extra_gapmer,
    )


@pytest.mark.parametrize("seed", range(8))
def test_native_query_rows_matches_vector_kernels(seed):
    rng = np.random.default_rng(seed)
    for t in range(40):
        n = int(rng.integers(2, 400))
        if t % 7 == 0:
            codes = basepairs.encode("A" * n)  # homopolymer: worst-case depth
        else:
            codes = basepairs.encode("".join(rng.choice(list("ACGT"), size=n)))
        nat = native_query_rows(codes)
        assert nat is not None
        counts, fields = nat
        off = 0
        vrow = hb.base_row(codes)
        level = 0
        while True:
            exp = _convert_block_row(vrow)
            assert int(counts[level]) == len(exp), (seed, t, level)
            got = _convert_fields_row(fields[off : off + len(exp)])
            assert [block_key(a) for a in got] == [block_key(b) for b in exp]
            off += len(exp)
            if len(exp) < 2:
                break
            vrow = hb.merge_row(vrow)
            level += 1


def test_native_query_rows_ambiguous_returns_none():
    codes = basepairs.encode("ACGTNACGT")
    assert native_query_rows(codes) is None
