"""Tests for the hashblock pyramid: the vectorized path must agree with the
faithful scalar object model, and both must satisfy the content-defined
properties the reference pins in HashBlock_Test.java / HashBlockDatabase_Test."""

import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.index import hashblock, scalar


def random_acgt(n, seed):
    rng = np.random.default_rng(seed)
    return basepairs.encode("".join(rng.choice(list("ACGT"), size=n)))


def collect_scalar_rows(codes, max_level=None):
    rows = scalar.scalar_pyramid(codes, max_level=max_level)
    out = []
    for row in rows:
        blocks = []
        for slot in row:
            assert isinstance(slot, scalar.ScalarHashBlock)
            blocks.append(slot)
        out.append(blocks)
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n", [10, 64, 300])
def test_vectorized_matches_scalar(seed, n):
    codes = random_acgt(n, seed)
    vec_rows = hashblock.build_pyramid(codes)
    sc_rows = collect_scalar_rows(codes)
    assert len(vec_rows) == len(sc_rows)
    for vec, blocks in zip(vec_rows, sc_rows):
        assert len(vec) == len(blocks)
        for i, b in enumerate(blocks):
            assert vec.start[i] == b.start
            assert vec.length[i] == b.length
            assert vec.fwd[i] == b.fwd
            assert vec.rev[i] == b.rev
            assert vec.req_l[i] == b.req_l
            assert vec.req_r[i] == b.req_r
            assert vec.next_l[i] == b.next_l
            assert vec.next_r[i] == b.next_r
            assert vec.gap_dir[i] == b.gap_dir
            assert vec.extra_gapmer[i] == b.extra_gapmer


@pytest.mark.parametrize("seed", [3, 4])
def test_gapmers_match_scalar(seed):
    codes = random_acgt(200, seed)
    prefixes = hashblock.GapmerPrefixes(codes)
    for row in hashblock.build_pyramid(codes):
        if len(row) == 0:
            continue
        gapmers = hashblock.expand_gapmers(row, prefixes)
        # scalar gapmers, aligned by block index
        sc_map = {}
        sc_rows = collect_scalar_rows(codes, max_level=row.level)
        sc_row = sc_rows[row.level]
        for i, block in enumerate(sc_row):
            g = block.with_gap_and_extension(codes)
            if g is not None:
                sc_map[i] = g
        assert set(gapmers.block_index.tolist()) == set(sc_map.keys())
        for k in range(len(gapmers)):
            i = int(gapmers.block_index[k])
            g = sc_map[i]
            assert gapmers.start[k] == g.start
            assert gapmers.length[k] == g.length
            assert gapmers.num_basepairs_used[k] == g.num_basepairs_used
            assert gapmers.fwd[k] == g.fwd, f"level {row.level} block {i}"
            assert gapmers.rev[k] == g.rev
            assert gapmers.primary[k] == g.is_primary_polarity()
            assert gapmers.secondary[k] == g.is_secondary_polarity()


def test_block_count_decays():
    codes = random_acgt(4096, 7)
    rows = hashblock.build_pyramid(codes)
    # block count should decay roughly geometrically (HashBlock_Stream.java:13-15)
    assert len(rows[1]) < len(rows[0])
    assert len(rows[4]) < len(rows[0]) // 2
    total = sum(len(r) for r in rows)
    assert total < 5 * len(codes)


def test_identical_substrings_produce_identical_blocks():
    # content-defined property: the same substring at different positions yields
    # the same block pattern (up to translation) away from the edges
    rng = np.random.default_rng(11)
    core = "".join(rng.choice(list("ACGT"), size=80))
    pad1 = "".join(rng.choice(list("ACGT"), size=37))
    pad2 = "".join(rng.choice(list("ACGT"), size=53))
    s1 = basepairs.encode(pad1 + core + pad1)
    s2 = basepairs.encode(pad2 + core + pad2)
    rows1 = hashblock.build_pyramid(s1)
    rows2 = hashblock.build_pyramid(s2)
    # compare blocks fully inside the core, excluding a boundary margin
    margin = 16
    for level in range(1, 4):
        r1, r2 = rows1[level], rows2[level]
        lo1, hi1 = len(pad1) + margin, len(pad1) + 80 - margin
        lo2, hi2 = len(pad2) + margin, len(pad2) + 80 - margin
        sel1 = (r1.start >= lo1) & (r1.start + r1.length <= hi1)
        sel2 = (r2.start >= lo2) & (r2.start + r2.length <= hi2)
        blocks1 = sorted(
            zip((r1.start[sel1] - len(pad1)).tolist(), r1.length[sel1].tolist(), r1.fwd[sel1].tolist())
        )
        blocks2 = sorted(
            zip((r2.start[sel2] - len(pad2)).tolist(), r2.length[sel2].tolist(), r2.fwd[sel2].tolist())
        )
        assert blocks1 == blocks2


def test_reverse_complement_symmetry():
    # a block of S spanning [s, e) with hashes (f, r) corresponds to a block of
    # RC(S) spanning [n-e, n-s) with hashes (r, f) (HashBlock_Test property)
    codes = random_acgt(150, 13)
    rc = basepairs.reverse_complement(codes)
    n = codes.shape[0]
    rows_f = hashblock.build_pyramid(codes)
    rows_r = hashblock.build_pyramid(rc)
    for level in range(min(len(rows_f), len(rows_r))):
        fwd_blocks = {
            (int(s), int(s) + int(l)): (int(f), int(r))
            for s, l, f, r in zip(
                rows_f[level].start, rows_f[level].length, rows_f[level].fwd, rows_f[level].rev
            )
        }
        rev_blocks = {
            (n - (int(s) + int(l)), n - int(s)): (int(r), int(f))
            for s, l, f, r in zip(
                rows_r[level].start, rows_r[level].length, rows_r[level].fwd, rows_r[level].rev
            )
        }
        assert fwd_blocks == rev_blocks


def test_ambiguity_expands_into_conditional_blocks():
    codes = basepairs.encode("ACGRT")
    row = scalar.scalar_base_row(codes)
    assert isinstance(row[3], scalar.MultiBlock)
    options = row[3].possibilities
    # R = A or G (MultiHashBlock_Test-style expansion check)
    assert len(options) == 2
    values = sorted(v for opt in options for v in opt.condition.values)
    assert values == sorted([basepairs.A, basepairs.G])


def test_ambiguous_pyramid_produces_conditional_merges():
    codes = basepairs.encode("ACGTNACGT")
    rows = scalar.scalar_pyramid(codes, max_level=3)
    saw_conditional = False
    for row in rows[1:]:
        for slot in row:
            if isinstance(slot, scalar.MultiBlock):
                for opt in slot.possibilities:
                    if opt.block is not None and opt.condition.complexity() > 0:
                        saw_conditional = True
    assert saw_conditional
