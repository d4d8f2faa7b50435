import numpy as np

from mapper_tpu.sequence import Sequence, SequenceBuilder, SequenceDatabase, sort_and_complement


def test_sequence_basics():
    seq = Sequence.from_text("s", "ACGT")
    assert len(seq) == 4
    assert seq.get_text() == "ACGT"
    assert seq.get_range(1, 2) == "CG"
    assert seq.char_at(3) == "T"


def test_reverse_complement_links_back():
    seq = Sequence.from_text("s", "AACG")
    rc = seq.reverse_complement()
    assert rc.get_text() == "CGTT"
    assert rc.complemented_from is seq


def test_builder():
    builder = SequenceBuilder().set_name("x").add("AC").add("GT").set_id(7)
    seq = builder.build()
    assert seq.get_text() == "ACGT"
    assert seq.name == "x"
    assert seq.identifier == 7


def test_sort_and_complement_orders_by_descending_length():
    a = Sequence.from_text("short", "ACG")
    b = Sequence.from_text("long", "ACGTACGT")
    ordered = sort_and_complement([a, b])
    assert [s.name for s in ordered] == ["long", "long-rev", "short", "short-rev"]
    assert ordered[1].complemented_from is ordered[0]


def test_position_codec_roundtrip():
    seqs = sort_and_complement(
        [Sequence.from_text("a", "ACGTAC"), Sequence.from_text("b", "GG")]
    )
    db = SequenceDatabase(seqs)
    for seq in db.get_all():
        for idx in (0, len(seq) - 1):
            encoded = db.encode_position(seq, idx)
            decoded_seq, decoded_idx = db.decode_position(encoded)
            assert decoded_seq is seq
            assert decoded_idx == idx


def test_vectorized_position_decode():
    db = SequenceDatabase(
        sort_and_complement([Sequence.from_text("a", "ACGTAC"), Sequence.from_text("b", "GG")])
    )
    encoded = np.array(
        [db.encode_position(s, i) for s in db.get_all() for i in range(len(s))],
        dtype=np.int64,
    )
    seq_idx, offsets = db.decode_positions(encoded)
    k = 0
    for si, s in enumerate(db.get_all()):
        for i in range(len(s)):
            assert seq_idx[k] == si
            assert offsets[k] == i
            k += 1


def test_concatenated_codes_matches_positions():
    db = SequenceDatabase(
        sort_and_complement([Sequence.from_text("a", "ACGTAC"), Sequence.from_text("b", "GG")])
    )
    concat = db.concatenated_codes()
    for seq in db.get_all():
        start = db.encode_position(seq, 0)
        assert np.array_equal(concat[start : start + len(seq)], seq.codes)


def test_duplicate_names():
    db = SequenceDatabase(
        [Sequence.from_text("x", "AC"), Sequence.from_text("x", "GG")]
    )
    assert db.get_duplicate_names() == ["x"]


class _HugeFakeSequence(Sequence):
    """RepeatingSequence analog (reference src/test/java/RepeatingSequence.java):
    fakes a multi-gigabase sequence without materializing codes, to exercise
    the int64 position codec past the 2^31 boundary."""

    def __init__(self, name, n):
        self.name = name
        self.path = None
        self.quality = None
        self.complemented_from = None
        self.identifier = -1
        self._rc_cache = None
        self._fake_len = n

    def __len__(self):
        return self._fake_len


def test_position_codec_past_int32_boundary():
    import numpy as np

    big = 1 << 30
    seqs = [
        _HugeFakeSequence("a", big),
        _HugeFakeSequence("b", big),
        _HugeFakeSequence("c", big + 12345),
    ]
    db = SequenceDatabase(seqs)
    assert db.total_size > (1 << 31)
    probes = [
        (seqs[0], 0),
        (seqs[0], big - 1),
        (seqs[1], 0),
        (seqs[1], big - 1),  # encoded = 2^31 - 1
        (seqs[2], 0),  # encoded = 2^31
        (seqs[2], big + 12344),
    ]
    encoded = [db.encode_position(s, i) for s, i in probes]
    assert encoded[3] == (1 << 31) - 1
    assert encoded[4] == 1 << 31
    for (s, i), e in zip(probes, encoded):
        ds, di = db.decode_position(e)
        assert ds is s and di == i
    seq_idx, offsets = db.decode_positions(np.asarray(encoded, dtype=np.int64))
    assert seq_idx.tolist() == [0, 0, 1, 1, 2, 2]
    assert offsets.tolist() == [0, big - 1, 0, big - 1, 0, big + 12344]
