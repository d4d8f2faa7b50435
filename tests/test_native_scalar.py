"""Differential tests: native scalar conditional pyramid vs the Python oracle.

The C++ `mapper_scalar_entries` (native/candidates.cpp) must reproduce
`HashBlockDatabase._scalar_entries` (the faithful object model of
HashBlock_ParentRow.java / MultiHashBlock.java / SequenceCondition.java)
entry-for-entry, in the same (row, slot, possibility) order, so index builds
over IUPAC-ambiguous sequences stay bit-identical whichever path runs.
"""

import numpy as np
import pytest

from mapper_tpu import basepairs, native
from mapper_tpu.sequence import Sequence, SequenceDatabase
from mapper_tpu.index.database import HashBlockDatabase

pytestmark = pytest.mark.skipif(
    native.get_candidates_library() is None, reason="native library unavailable"
)

_BASES = "ACGT"
_AMBIG = "NRYSWKMBDHV"


def _random_text(rng, n, amb_rate, runs_of_n=0):
    chars = [_BASES[i] for i in rng.integers(0, 4, size=n)]
    for i in np.nonzero(rng.random(n) < amb_rate)[0]:
        chars[i] = _AMBIG[rng.integers(0, len(_AMBIG))]
    for _ in range(runs_of_n):
        start = int(rng.integers(0, max(1, n - 10)))
        for j in range(start, min(n, start + int(rng.integers(2, 9)))):
            chars[j] = "N"
    return "".join(chars)


def _db_for(text):
    seq = Sequence.from_text("chr", text)
    sdb = SequenceDatabase([seq], add_reverse_complements=True)
    return HashBlockDatabase(sdb, hint_max_interesting_size=4)


def _assert_match(db, codes, lo, hi, keep=None):
    expected = db._scalar_entries(codes, lo, hi, keep=keep)
    got = native.native_scalar_entries(
        codes, db.min_interesting_size, lo, hi, db.enable_gapmers, keep=keep
    )
    assert got is not None
    exp = np.array(expected, dtype=np.int64).reshape(-1, 8)
    assert got[0].shape[0] == exp.shape[0], (
        f"count mismatch: native {got[0].shape[0]} vs oracle {exp.shape[0]}"
    )
    for col, (name, arr) in enumerate(
        zip(
            ("num_bp", "fwd", "rev", "primary", "secondary", "start", "length", "amb"),
            got,
        )
    ):
        np.testing.assert_array_equal(
            np.asarray(arr, dtype=np.int64), exp[:, col], err_msg=name
        )


@pytest.mark.parametrize("seed", range(8))
def test_random_sparse_ambiguity(seed):
    rng = np.random.default_rng(seed)
    text = _random_text(rng, 400, amb_rate=0.02)
    db = _db_for(text)
    codes = basepairs.encode(text)
    _assert_match(db, codes, 0, db.max_fully_set_up_size)


@pytest.mark.parametrize("seed", range(4))
def test_random_dense_ambiguity(seed):
    rng = np.random.default_rng(100 + seed)
    text = _random_text(rng, 200, amb_rate=0.15, runs_of_n=2)
    db = _db_for(text)
    codes = basepairs.encode(text)
    _assert_match(db, codes, 0, db.max_fully_set_up_size)


def test_ambiguity_at_edges():
    rng = np.random.default_rng(7)
    body = _random_text(rng, 150, amb_rate=0.0)
    for text in ("NN" + body, body + "RN", "N" + body + "N"):
        db = _db_for(text)
        _assert_match(db, basepairs.encode(text), 0, db.max_fully_set_up_size)


def test_no_gapmers():
    rng = np.random.default_rng(11)
    text = _random_text(rng, 300, amb_rate=0.03)
    seq = Sequence.from_text("chr", text)
    sdb = SequenceDatabase([seq], add_reverse_complements=True)
    db = HashBlockDatabase(sdb, hint_max_interesting_size=4, enable_gapmers=False)
    _assert_match(db, basepairs.encode(text), 0, db.max_fully_set_up_size)


def test_keep_window_and_lo():
    rng = np.random.default_rng(13)
    text = _random_text(rng, 500, amb_rate=0.02)
    db = _db_for(text)
    codes = basepairs.encode(text)
    hi = db.max_fully_set_up_size
    _assert_match(db, codes, lo=8, hi=hi, keep=(100, 350))
    _assert_match(db, codes, lo=0, hi=max(4, hi // 2), keep=(0, 120))


def test_clean_sequence_matches_oracle():
    # no ambiguity at all: the conditional path degenerates to plain merges
    rng = np.random.default_rng(17)
    text = _random_text(rng, 256, amb_rate=0.0)
    db = _db_for(text)
    _assert_match(db, basepairs.encode(text), 0, db.max_fully_set_up_size)


def test_hybrid_build_native_vs_python_identical():
    """Hybrid-path build (native clean-segment range collector + native
    scalar windows) vs the all-Python build on a sequence big enough to
    trigger the windowed partition."""
    import os

    rng = np.random.default_rng(31)
    t = list(_random_text(rng, 30_000, amb_rate=0.0))
    for p in rng.choice(30_000, size=10, replace=False):
        t[p] = _AMBIG[int(rng.integers(0, len(_AMBIG)))]
    t[1] = "N"
    t[-3] = "R"
    seq = Sequence.from_text("chr", "".join(t))

    def build():
        sdb = SequenceDatabase([seq], add_reverse_complements=True)
        return HashBlockDatabase(sdb)

    db_native = build()
    os.environ["MAPPER_TPU_NATIVE"] = "0"
    try:
        db_python = build()
    finally:
        os.environ.pop("MAPPER_TPU_NATIVE", None)
    db_native.verify_matches(db_python)


def test_full_database_build_identical():
    """End-to-end: databases built with and without the native scalar path
    contain identical per-size indexes."""
    import os

    rng = np.random.default_rng(23)
    text = _random_text(rng, 2000, amb_rate=0.01, runs_of_n=1)
    seq = Sequence.from_text("chr", text)

    def build():
        sdb = SequenceDatabase([seq], add_reverse_complements=True)
        return HashBlockDatabase(sdb, hint_max_interesting_size=24)

    db_native = build()
    os.environ["MAPPER_TPU_NATIVE"] = "0"
    try:
        db_python = build()
    finally:
        os.environ.pop("MAPPER_TPU_NATIVE", None)
    db_native.verify_matches(db_python)
