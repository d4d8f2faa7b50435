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
