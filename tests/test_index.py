"""Index-layer tests: packed store, database build, lookup roundtrip,
determinism audit, lazy growth, disk cache, duplication detection."""

import numpy as np
import pytest

from mapper_tpu import basepairs
from mapper_tpu.index import hashblock
from mapper_tpu.index.database import (
    HashBlockDatabase,
    choose_max_duplication_length,
    choose_min_duplication_length,
    log2_round_up,
)
from mapper_tpu.index.duplication import DuplicationDetector
from mapper_tpu.index.packedmap import PackedIndex, max_interesting_count_per_key
from mapper_tpu.sequence import Sequence, SequenceDatabase, sort_and_complement


def make_db(texts: dict[str, str], **kwargs) -> HashBlockDatabase:
    seqs = [Sequence.from_text(name, text) for name, text in texts.items()]
    seq_db = SequenceDatabase(sort_and_complement(seqs))
    return HashBlockDatabase(seq_db, **kwargs)


def random_text(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_log2_round_up():
    assert log2_round_up(1) == 1
    assert log2_round_up(2) == 1
    assert log2_round_up(3) == 2
    assert log2_round_up(65) == 7
    assert log2_round_up(1 << 20) == 20


def test_duplication_length_choices():
    seqs = [Sequence.from_text("a", random_text(1000, 0))]
    db = SequenceDatabase(sort_and_complement(seqs))
    assert choose_min_duplication_length(db) == 10
    assert choose_max_duplication_length(db) == 20


def test_max_interesting_count_formula():
    assert max_interesting_count_per_key(10, 5) == 100
    assert max_interesting_count_per_key(1, 5) == 5
    assert max_interesting_count_per_key(1000, 5) == 32766


def test_packed_index_build_and_get():
    keys = np.array([3, 3, 4, 18, 18], dtype=np.int64)
    positions = np.array([100, 50, 7, 1, 3], dtype=np.int64)
    index = PackedIndex.build(5, keys, positions, capacity=7, max_interesting_count=3)
    assert list(index.get(3)) == [50, 100]  # sorted canonical order
    assert list(index.get(4)) == [7, 1, 3] or list(index.get(4)) == [1, 3, 7]
    # 18 % 7 == 4: keys 4 and 18 collide — lookups see the union of the bin
    assert len(index.get(18)) == 3


def test_packed_index_overflow_and_counts():
    keys = np.array([0, 0, 0, 1], dtype=np.int64)
    positions = np.array([5, 6, 7, 9], dtype=np.int64)
    index = PackedIndex.build(5, keys, positions, capacity=11, max_interesting_count=2)
    assert index.get(0) is None  # 3 items > cap 2 -> "too popular"
    assert index.num_matches_lower_bound(0) == 2**31 - 1
    assert list(index.get(1)) == [9]
    assert int(index.num_matches_lower_bound(1)) == 1
    assert index.num_overfilled_keys() == 1
    assert index.num_items_added() == 4


def test_packed_index_negative_key_wraps_like_java():
    keys = np.array([-5], dtype=np.int64)
    positions = np.array([42], dtype=np.int64)
    index = PackedIndex.build(5, keys, positions, capacity=7, max_interesting_count=5)
    # Java: -5 % 7 = -5, then +7 -> 2
    assert list(index.get(-5)) == [42]
    assert int(index.bin_of(-5)) == 2


def seed_lookup_roundtrip(db: HashBlockDatabase, query_text: str, expected_global_pos_range):
    """Build the query pyramid, look up each gapmer, and check that the true
    position appears among the matches of at least one block."""
    codes = basepairs.encode(query_text)
    prefixes = hashblock.GapmerPrefixes(codes)
    found = 0
    for row in hashblock.build_pyramid(codes):
        if len(row) == 0:
            break
        g = hashblock.expand_gapmers(row, prefixes)
        for k in range(len(g)):
            num_bp = int(g.num_basepairs_used[k])
            if num_bp < db.get_min_interesting_size():
                continue
            key = int(g.fwd[k]) if g.primary[k] else int(g.rev[k])
            matches = db.match_block(num_bp, int(g.length[k]), key, bool(g.primary[k]))
            if matches is None:
                continue
            lo, hi = expected_global_pos_range
            block_offset = int(g.start[k])
            expect = lo + block_offset
            if expect in matches.tolist():
                found += 1
    return found


def test_seed_lookup_roundtrip_forward():
    text = random_text(400, 5)
    db = make_db({"ref": text})
    seq_db = db.get_sequence_database()
    ref = seq_db.get_sequence(0)
    assert ref.name == "ref"
    # query = exact substring; every stored block of the query must be findable
    query = text[100:250]
    lo = seq_db.encode_position(ref, 100)
    found = seed_lookup_roundtrip(db, query, (lo, lo + 150))
    assert found >= 3  # several block sizes should match


def test_seed_lookup_roundtrip_reverse_strand():
    text = random_text(400, 6)
    db = make_db({"ref": text})
    seq_db = db.get_sequence_database()
    rc = seq_db.get_sequence(1)
    assert rc.complemented_from is seq_db.get_sequence(0)
    # query equal to a substring of the reverse complement strand
    rc_text = rc.get_text()
    query = rc_text[50:200]
    lo = seq_db.encode_position(rc, 50)
    found = seed_lookup_roundtrip(db, query, (lo, lo + 150))
    assert found >= 3


def test_determinism_audit():
    text = random_text(600, 7)
    db1 = make_db({"ref": text})
    db2 = make_db({"ref": text})
    db1.verify_matches(db2)  # should not raise


def test_lazy_growth():
    db = make_db({"ref": random_text(300, 8)})
    initial = db.get_hashed_length()
    db.require_set_up_through_size(initial + 5)
    assert db.get_hashed_length() == (initial + 5) * 2
    for size in range(1, db.get_hashed_length() + 1):
        assert size in db.maps


def test_cache_roundtrip(tmp_path):
    text = random_text(500, 9)
    db1 = make_db({"ref": text}, cache_dir=str(tmp_path))
    db2 = make_db({"ref": text}, cache_dir=str(tmp_path))
    db1.verify_matches(db2)


def test_duplication_detector_finds_repeat():
    # two copies of a 60bp segment, separated by random sequence
    segment = random_text(60, 10)
    filler1 = random_text(80, 11)
    filler2 = random_text(80, 12)
    text = filler1 + segment + filler2 + segment
    db = make_db({"ref": text})
    detector = DuplicationDetector(db, min_num_interesting_copies=2, window_size=1)
    ref = db.get_sequence_database().get_sequence(0)
    # near the repeat: should report a duplication
    assert detector.may_contain_duplication_in_range(ref, 80, 140) is not None
    all_dups = detector.get_all()
    assert len(all_dups) >= 1


def test_duplication_detector_clean_region():
    text = random_text(400, 13)
    db = make_db({"ref": text})
    detector = DuplicationDetector(db, min_num_interesting_copies=2, window_size=1)
    ref = db.get_sequence_database().get_sequence(0)
    hits = sum(
        detector.may_contain_duplication_in_range(ref, i, i + 50) is not None
        for i in range(0, 350, 50)
    )
    # a random 400bp sequence should have few if any detected duplications
    assert hits <= 2


def test_ambiguous_reference_build():
    text = random_text(100, 14) + "N" + random_text(100, 15)
    db = make_db({"ref": text})
    # must not crash and still answer lookups for a clean substring
    seq_db = db.get_sequence_database()
    ref = seq_db.get_sequence(0)
    query = text[10:90]
    lo = seq_db.encode_position(ref, 10)
    found = seed_lookup_roundtrip(db, query, (lo, lo + 80))
    assert found >= 1


def test_dircache_uniqueness_and_consistency(tmp_path):
    """DirCache_Test analog (reference src/test/java/DirCache_Test.java via
    MemoryFilesystem): 1000 distinct key sets map to 1000 distinct dirs, and
    re-getting any key set returns the same dir."""
    from mapper_tpu.index.dircache import DirCache

    cache = DirCache(str(tmp_path))
    dirs = {}
    for i in range(1000):
        keys = {"kind": "test", "n": str(i), "flavor": str(i % 7)}
        d = cache.get_or_create_dir(keys)
        assert d not in dirs.values()
        dirs[i] = d
    for i in (0, 1, 500, 999):
        keys = {"kind": "test", "n": str(i), "flavor": str(i % 7)}
        assert cache.get_or_create_dir(keys) == dirs[i]


def test_hybrid_ambiguity_hashing_matches_scalar():
    """Sequences with sparse IUPAC codes hash via the hybrid path (native
    clean segments + scalar windows around the ambiguity); every PackedIndex
    must be structurally identical to the full scalar pass."""
    import numpy as np

    from mapper_tpu.index.database import HashBlockDatabase
    from mapper_tpu.sequence import Sequence, SequenceDatabase

    rng = np.random.default_rng(11)
    bases = np.array(list("ACGT"))
    amb_codes = list("RYSWKMN")
    n, n_amb = 24000, 12
    t = list(rng.choice(bases, size=n))
    for p in rng.choice(n, size=n_amb, replace=False):
        t[p] = amb_codes[int(rng.integers(0, len(amb_codes)))]
    # ambiguity near the sequence edges exercises window clipping
    t[3] = "N"
    t[-2] = "R"
    text = "".join(t)

    def build(force_scalar):
        old = HashBlockDatabase._HYBRID_MAX_AMB_FRACTION
        HashBlockDatabase._HYBRID_MAX_AMB_FRACTION = -1.0 if force_scalar else old
        try:
            seq_db = SequenceDatabase(
                [Sequence.from_text("s", text)], add_reverse_complements=True
            )
            return HashBlockDatabase(seq_db)
        finally:
            HashBlockDatabase._HYBRID_MAX_AMB_FRACTION = old

    hybrid = build(False)
    scalar_db = build(True)
    assert set(hybrid.maps) == set(scalar_db.maps)
    for size in hybrid.maps:
        hybrid.maps[size].verify_matches(scalar_db.maps[size])
