"""Device voting must produce the same candidate table as the numpy path."""

import numpy as np
import pytest

from mapper_tpu import Api, AlignmentParameters, basepairs
from mapper_tpu.batch.candidates import ReadBatch, collect_batch_seeds, generate_candidates
from mapper_tpu.batch.device_vote import generate_candidates_device
from mapper_tpu.sequence import Sequence


def random_text(n, rng):
    return "".join(rng.choice(list("ACGT"), size=n))


def table_rows(table):
    return sorted(
        zip(
            table.read_id.tolist(),
            table.reversed_.tolist(),
            table.ref_seq_index.tolist(),
            table.offset.tolist(),
            table.votes.tolist(),
        )
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_device_vote_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    ref_text = random_text(6000, rng)
    index = Api.new_database({"c1": ref_text[:4000], "c2": ref_text[4000:]})
    reads = []
    for i in range(32):
        which = 0 if rng.random() < 0.5 else 4000
        limit = 4000 if which == 0 else 2000
        pos = int(rng.integers(0, limit - 160))
        read = list(ref_text[which + pos : which + pos + 150])
        for _ in range(int(rng.integers(0, 3))):
            j = int(rng.integers(0, len(read)))
            read[j] = {"A": "C", "C": "G", "G": "T", "T": "A"}[read[j]]
        text = "".join(read)
        if rng.random() < 0.5:
            text = basepairs.decode(basepairs.reverse_complement(basepairs.encode(text)))
        reads.append(Sequence.from_text(f"r{i}", text))
    batch = ReadBatch.from_sequences(reads)
    numpy_table = generate_candidates(batch, index.hashblock_database)
    seeds = collect_batch_seeds(batch, index.hashblock_database)
    device_table = generate_candidates_device(batch, index.hashblock_database, seeds)
    assert table_rows(device_table) == table_rows(numpy_table)
