"""Differential tests: the fully on-device candidate pipeline
(batch/device_candidates.py) must reproduce batch/candidates.py's
generate_candidates bit-for-bit — same candidate rows in the same order —
for ambiguity-free reads, including the uint32-limb emulation of the Java
int64 hash arithmetic (HashBlock.java:261-269)."""

import numpy as np
import pytest

from mapper_tpu import Api, basepairs
from mapper_tpu.batch import device_candidates as dc
from mapper_tpu.batch.candidates import ReadBatch, generate_candidates
from mapper_tpu.index import hashblock as hb
from mapper_tpu.sequence import Sequence


def _random_reads(rng, ref_text, n, length=150, snp=0.02, rc_fraction=0.5):
    bases = np.array(list("ACGT"))
    reads = []
    for i in range(n):
        pos = int(rng.integers(0, len(ref_text) - length))
        read = np.array(list(ref_text[pos : pos + length]))
        snps = rng.random(length) < snp
        read[snps] = bases[rng.integers(0, 4, size=int(snps.sum()))]
        text = "".join(read)
        if rng.random() < rc_fraction:
            text = basepairs.decode(basepairs.reverse_complement(basepairs.encode(text)))
        reads.append(Sequence.from_text(f"r{i}", text))
    return reads


def test_merge_hashes_u32_limbs_match_int64():
    """The uint32-limb mergeHashes equals the int64 numpy implementation on
    adversarial inputs (INT_MIN/INT_MAX, sign flips, wraps)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    special = np.array(
        [-(2**31), 2**31 - 1, -1, 0, 1, 54323, -54323, 2**30, -(2**30)],
        dtype=np.int64,
    )
    l_hash = np.concatenate([special, rng.integers(-(2**31), 2**31, size=500)])
    r_hash = np.concatenate([special[::-1], rng.integers(-(2**31), 2**31, size=500)])
    l_len = rng.integers(1, 400, size=l_hash.shape[0])
    r_len = rng.integers(1, 400, size=l_hash.shape[0])
    want = hb._merge_hashes(l_len, l_hash.astype(np.int32), r_len, r_hash.astype(np.int32))
    got = dc._merge_hashes_device(
        jnp.asarray(l_len, jnp.int32),
        jnp.asarray(l_hash.astype(np.int32)),
        jnp.asarray(r_len, jnp.int32),
        jnp.asarray(r_hash.astype(np.int32)),
    )
    assert np.array_equal(np.asarray(got), want)


def _assert_tables_equal(got, want, fallback_ids):
    """Candidate tables equal on all non-fallback reads."""
    skip = set(int(i) for i in fallback_ids)
    g_keep = ~np.isin(got.read_id, list(skip)) if skip else np.ones(len(got), bool)
    w_keep = ~np.isin(want.read_id, list(skip)) if skip else np.ones(len(want), bool)
    assert np.array_equal(got.read_id[g_keep], want.read_id[w_keep])
    assert np.array_equal(got.reversed_[g_keep], want.reversed_[w_keep])
    assert np.array_equal(got.ref_seq_index[g_keep], want.ref_seq_index[w_keep])
    assert np.array_equal(got.offset[g_keep], want.offset[w_keep])
    assert np.array_equal(got.votes[g_keep], want.votes[w_keep])


def test_device_candidates_match_host_single_contig():
    rng = np.random.default_rng(11)
    ref_text = "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=120_000)])
    index = Api.new_database({"chr1": ref_text})
    reads = _random_reads(rng, ref_text, 96)
    batch = ReadBatch.from_sequences(reads)
    want = generate_candidates(batch, index.hashblock_database)
    result = dc.generate_candidates_device(batch, index.hashblock_database)
    assert result is not None
    got, fallback_ids = result
    assert len(fallback_ids) == 0
    _assert_tables_equal(got, want, fallback_ids)


def test_device_candidates_match_host_multi_contig_mixed_lengths():
    rng = np.random.default_rng(12)
    bases = np.array(list("ACGT"))
    contigs = {
        f"g{i}": "".join(bases[rng.integers(0, 4, size=size)])
        for i, size in enumerate((60_000, 30_000, 9_000))
    }
    index = Api.new_database(contigs)
    reads = []
    for name, text in contigs.items():
        reads.extend(_random_reads(rng, text, 16))
    # mixed lengths, contig-edge reads, and a high-SNP read
    reads.extend(_random_reads(rng, contigs["g0"], 8, length=80))
    reads.extend(_random_reads(rng, contigs["g1"], 8, length=37, snp=0.1))
    edge_src = contigs["g2"]
    reads.append(Sequence.from_text("edge0", edge_src[:150]))
    reads.append(Sequence.from_text("edge1", edge_src[-150:]))
    batch = ReadBatch.from_sequences(reads)
    want = generate_candidates(batch, index.hashblock_database)
    result = dc.generate_candidates_device(batch, index.hashblock_database)
    assert result is not None
    got, fallback_ids = result
    # budget overflows may legitimately defer a few reads; everything else
    # must match exactly
    assert len(fallback_ids) <= 2
    _assert_tables_equal(got, want, fallback_ids)


def test_device_candidates_repetitive_reference_defers_or_matches():
    """A repeat-heavy reference exercises the V/P budgets and the noise
    filter; deferred reads are flagged, the rest match."""
    rng = np.random.default_rng(13)
    unit = "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=500)])
    ref_text = (unit * 60) + "".join(
        np.array(list("ACGT"))[rng.integers(0, 4, size=20_000)]
    )
    index = Api.new_database({"rep": ref_text})
    reads = _random_reads(rng, ref_text, 96, snp=0.01)
    batch = ReadBatch.from_sequences(reads)
    want = generate_candidates(batch, index.hashblock_database)
    result = dc.generate_candidates_device(batch, index.hashblock_database)
    assert result is not None
    got, fallback_ids = result
    _assert_tables_equal(got, want, fallback_ids)


def _summarize(result):
    if result is None:
        return None
    out = []
    for choice in result.get_first_alignments():
        comp = choice.get_component(0)
        out.append(
            (
                comp.get_sequence_b().name,
                comp.get_start_index_b(),
                comp.is_reference_reversed(),
                round(choice.get_penalty(), 6),
                tuple(
                    (s.start_a, s.start_b, s.length_a, s.length_b)
                    for s in comp.sections
                ),
            )
        )
    return sorted(out)


def test_fused_engine_parity_cpu():
    """BatchAligner with the fused device-candidate path produces exactly the
    host path's results (CPU backend, jnp scoring)."""
    from mapper_tpu import AlignmentParameters
    from mapper_tpu.align.query import Query
    from mapper_tpu.batch.engine import BatchAligner

    rng = np.random.default_rng(21)
    ref_text = "".join(np.array(list("ACGT"))[rng.integers(0, 4, size=80_000)])
    index = Api.new_database({"c1": ref_text[:50_000], "c2": ref_text[50_000:]})
    params = AlignmentParameters.defaults()
    reads = _random_reads(rng, ref_text[:50_000], 48)
    reads += _random_reads(rng, ref_text[50_000:], 24)
    # an indel read and an unalignable read exercise fallback routing
    indel = list(ref_text[100:250])
    del indel[60:63]
    reads.append(Sequence.from_text("indel", "".join(indel)))
    reads.append(Sequence.from_text("junk", "ACGT" * 37 + "AC"))
    queries = [Query(r) for r in reads]

    host = BatchAligner(index, params, device_candidates=False)
    fused = BatchAligner(index, params, device_candidates=True)
    got_host = host.process_batch(queries)
    got_fused = fused.process_batch(queries)
    for i, (a, b) in enumerate(zip(got_host, got_fused)):
        assert _summarize(a) == _summarize(b), (i, reads[i].name)
