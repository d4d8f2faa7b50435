"""Hash-range sharded index lookup must agree with the host merged-index
walk on an 8-virtual-device CPU mesh."""

import numpy as np

from mapper_tpu import Api
from mapper_tpu.batch.candidates import ReadBatch, collect_batch_seeds
from mapper_tpu.parallel.mesh import make_mesh
from mapper_tpu.parallel.sharded_index import ShardedIndex
from mapper_tpu.sequence import Sequence


def test_sharded_lookup_matches_host():
    rng = np.random.default_rng(2)
    ref_text = "".join(rng.choice(list("ACGT"), size=20000))
    index = Api.new_database({"c1": ref_text[:15000], "c2": ref_text[15000:]})
    db = index.hashblock_database

    reads = []
    for i in range(24):
        pos = int(rng.integers(0, 15000 - 160))
        reads.append(Sequence.from_text(f"r{i}", ref_text[pos : pos + 150]))
    batch = ReadBatch.from_sequences(reads)
    seg, _, _, num_bp, key, _ = collect_batch_seeds(batch, db)
    assert seg.shape[0] > 0

    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = ShardedIndex(db, mesh, k_match=12)
    vals, counts, valid = sharded.lookup(num_bp, key)

    merged = db.merged_index()
    cap_per_seed = merged["capacities"][num_bp]
    bins = merged["bases"][num_bp] + np.remainder(key, cap_per_seed)
    host_counts = merged["counts"][bins]
    assert np.array_equal(counts, host_counts)

    limits = np.minimum(merged["caps"][num_bp], 12)
    for s in range(seg.shape[0]):
        c = int(host_counts[s])
        take = min(c, int(limits[s]))
        expected = merged["values"][
            merged["offsets"][bins[s]] : merged["offsets"][bins[s]] + take
        ]
        got = vals[s][valid[s]]
        assert np.array_equal(got, expected), s


def test_sharded_lookup_scale_multi_mb():
    """VERDICT r3 #6: the beyond-HBM claim needs a multi-Mb drive.  4.6 Mb
    reference, thousands of seeds from 512 reads, byte-identity vs the host
    merged-index walk, and the value-balanced shard layout must keep total
    device values memory within ~1.3x of the unsharded array (the old
    equal-bin split paddded every shard to the largest shard's values)."""
    rng = np.random.default_rng(46)
    ref_text = "".join(rng.choice(list("ACGT"), size=4_600_000))
    index = Api.new_database({"chr": ref_text})
    db = index.hashblock_database

    reads = []
    for i in range(512):
        pos = int(rng.integers(0, 4_600_000 - 160))
        reads.append(Sequence.from_text(f"r{i}", ref_text[pos : pos + 150]))
    batch = ReadBatch.from_sequences(reads)
    seg, _, _, num_bp, key, _ = collect_batch_seeds(batch, db)
    assert seg.shape[0] > 5000  # thousands of seeds

    mesh = make_mesh()
    sharded = ShardedIndex(db, mesh, k_match=12)
    assert sharded.values_memory_ratio <= 1.3
    vals, counts, valid = sharded.lookup(num_bp, key)

    merged = db.merged_index()
    cap_per_seed = merged["capacities"][num_bp]
    bins = merged["bases"][num_bp] + np.remainder(key, cap_per_seed)
    host_counts = merged["counts"][bins]
    assert np.array_equal(counts, host_counts)
    limits = np.minimum(merged["caps"][num_bp], 12)
    take = np.minimum(host_counts, limits)
    # vectorized expected-values check (per-seed loops are too slow at this size)
    starts = merged["offsets"][bins]
    j = np.arange(12)[None, :]
    sel = j < take[:, None]
    vidx = np.minimum(starts[:, None] + j, len(merged["values"]) - 1)
    expected = np.where(sel, merged["values"][vidx], 0)
    got = np.where(valid, vals, 0)
    assert np.array_equal(sel, valid)
    assert np.array_equal(got, expected)
