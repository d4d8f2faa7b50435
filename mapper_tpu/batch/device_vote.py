"""Device-side seed lookup + offset voting.

Takes the host-collected seed arrays (batch/candidates.collect_batch_seeds)
and runs the index lookup, strand folding, vote counting, and top-K selection
as one jitted XLA program:

- merged-index gather (counts/offsets/values live on the device),
- fixed-width match expansion ([S, K_MATCH] instead of a ragged CSR walk),
- packed-int64 vote keys sorted once; segment boundaries give the counts,
- per-read top-K by (votes desc) via a second sort.

Shapes are bucketed (seed count padded to a power-of-two class) so the program
compiles a handful of times per run.  Falls back to the numpy implementation
off-TPU.
"""

from __future__ import annotations

import functools

import jax

# the packed vote keys need real 64-bit integers (reads x strands x contigs x
# offsets overflow int32 on real genomes); every other device computation pins
# its dtypes explicitly so this is safe to enable globally
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mapper_tpu.batch.candidates import CandidateTable, ReadBatch, _strand_tables

BIG_KEY = np.int64(2**62)


class DeviceVoteContext:
    """Device-resident index arrays, built once per database."""

    def __init__(self, database):
        merged = database.merged_index()
        self.capacities = jnp.asarray(merged["capacities"])
        self.caps = jnp.asarray(merged["caps"])
        self.bases = jnp.asarray(merged["bases"])
        self.counts = jnp.asarray(merged["counts"])
        self.offsets = jnp.asarray(merged["offsets"])
        self.values = jnp.asarray(merged["values"])
        rev_flags, fwd_index, seq_lengths = _strand_tables(database)
        self.rev_flags = jnp.asarray(rev_flags)
        self.fwd_index = jnp.asarray(fwd_index)
        self.seq_lengths = jnp.asarray(seq_lengths)
        self.rc_index = jnp.asarray(database._rc_index)
        self.seq_starts = jnp.asarray(database.get_sequence_database().starts)
        self.through = merged["through"]


@functools.partial(
    jax.jit,
    static_argnames=("k_match", "k_out", "num_reads", "span", "bias", "n_seqs"),
)
def _vote_device(
    ctx_arrays,
    seg,
    block_start,
    block_len,
    num_bp,
    key,
    primary,
    read_lengths,
    max_matches_per_seed,
    k_match: int,
    k_out: int,
    num_reads: int,
    span: int,
    bias: int,
    n_seqs: int,
):
    (
        capacities,
        caps,
        bases,
        counts_arr,
        offsets_arr,
        values_arr,
        rev_flags,
        fwd_index,
        seq_lengths,
        rc_index,
        seq_starts,
    ) = ctx_arrays

    s = seg.shape[0]
    cap_per_seed = capacities[num_bp]
    bins = bases[num_bp] + jnp.remainder(key, cap_per_seed)
    counts = counts_arr[bins]
    limit = jnp.minimum(jnp.minimum(caps[num_bp], max_matches_per_seed), k_match)
    usable = (counts > 0) & (counts <= limit) & (seg >= 0)
    eff_counts = jnp.where(usable, counts, 0)

    # fixed-width match expansion [S, K_MATCH]
    j = jnp.arange(k_match, dtype=jnp.int64)[None, :]
    valid = j < eff_counts[:, None]
    value_idx = jnp.clip(offsets_arr[bins][:, None] + j, 0, values_arr.shape[0] - 1)
    positions = values_arr[value_idx]  # encoded global positions

    # decode (sequence, offset)
    pos_seq_idx = jnp.searchsorted(seq_starts, positions, side="right") - 1
    pos_offsets = positions - seq_starts[pos_seq_idx]

    b_start = block_start[:, None]
    b_len = block_len[:, None]
    this_primary = primary[:, None]
    read_len = read_lengths[seg][:, None]

    folded_offsets = jnp.where(
        this_primary,
        pos_offsets,
        seq_lengths[rc_index[pos_seq_idx]] - pos_offsets - b_len,
    )
    folded_seq_idx = jnp.where(this_primary, pos_seq_idx, rc_index[pos_seq_idx])
    matched_reverse = rev_flags[folded_seq_idx]
    matched_fwd_idx = fwd_index[folded_seq_idx]

    contig_len = seq_lengths[matched_fwd_idx]
    fwd_offset = folded_offsets - b_start
    rc_offset = (contig_len - (folded_offsets + b_len)) - (read_len - (b_start + b_len))
    offset = jnp.where(matched_reverse, rc_offset, fwd_offset)

    read = jnp.broadcast_to(seg[:, None], (s, k_match))

    packed = (
        ((read.astype(jnp.int64) * 2 + matched_reverse) * n_seqs + matched_fwd_idx)
        * span
        + (offset + bias)
    )
    packed = jnp.where(valid, packed, BIG_KEY)
    flat = packed.reshape(-1)

    order = jnp.argsort(flat)
    sorted_keys = flat[order]
    boundary = jnp.concatenate(
        [jnp.ones(1, bool), sorted_keys[1:] != sorted_keys[:-1]]
    )
    boundary &= sorted_keys != BIG_KEY
    group_id = jnp.cumsum(boundary) - 1  # id per row (within valid prefix)
    total = flat.shape[0]
    votes_per_group = jnp.zeros(total, jnp.int32).at[
        jnp.where(sorted_keys != BIG_KEY, group_id, total - 1)
    ].add(jnp.where(sorted_keys != BIG_KEY, 1, 0))
    votes_rows = jnp.where(boundary, votes_per_group[group_id], 0)

    # representative rows = boundaries; rank groups per read by votes desc
    g_key = jnp.where(boundary, sorted_keys, BIG_KEY)
    g_votes = votes_rows
    g_read = (g_key // (2 * n_seqs * span)).astype(jnp.int64)
    g_read = jnp.where(boundary, g_read, num_reads)
    # sort groups by (read, -votes)
    rank_key = g_read * (total + 1) * 2 + (total - g_votes)
    order2 = jnp.argsort(rank_key)
    g_key2 = g_key[order2]
    g_votes2 = g_votes[order2]
    g_read2 = g_read[order2]

    # positions within each read group
    idx = jnp.arange(total, dtype=jnp.int64)
    is_first = jnp.concatenate([jnp.ones(1, bool), g_read2[1:] != g_read2[:-1]])
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, idx, 0)
    )
    rank = idx - group_start
    keep = (g_read2 < num_reads) & (rank < k_out)

    # scatter into [num_reads, k_out] slots
    slot = jnp.where(keep, g_read2 * k_out + rank, num_reads * k_out)
    out_keys = jnp.full(num_reads * k_out + 1, BIG_KEY, jnp.int64).at[slot].set(
        jnp.where(keep, g_key2, BIG_KEY)
    )
    out_votes = jnp.zeros(num_reads * k_out + 1, jnp.int32).at[slot].set(
        jnp.where(keep, g_votes2, 0)
    )
    return out_keys[:-1], out_votes[:-1]


def generate_candidates_device(
    batch: ReadBatch,
    database,
    seeds,
    max_candidates_per_read: int = 8,
    max_matches_per_seed: int = 12,
    k_match: int = 12,
) -> CandidateTable:
    """Device voting over host-collected seeds.  `seeds` is the tuple from
    collect_batch_seeds."""
    seg, block_start, block_len, num_bp, key, primary = seeds
    num_reads = batch.num_reads
    if seg.shape[0] == 0 or num_reads == 0:
        return CandidateTable(
            *[np.zeros(0, dtype=t) for t in (np.int32, bool, np.int32, np.int64, np.int32)]
        )

    ctx = getattr(database, "_device_vote_ctx", None)
    if ctx is None or ctx.through != database.max_fully_set_up_size:
        ctx = DeviceVoteContext(database)
        database._device_vote_ctx = ctx

    seq_db = database.get_sequence_database()
    n_seqs = seq_db.get_num_sequences()
    max_len = int(batch.lengths.max())
    longest_contig = int(max((len(s) for s in seq_db.get_all()), default=1))
    span = longest_contig + 2 * max_len + 2
    bias = max_len + 1

    # bucket the seed count so the program compiles per size class
    s = seg.shape[0]
    s_padded = 1 << max(10, (s - 1).bit_length())

    def pad(arr, fill=0):
        return np.pad(arr, (0, s_padded - s), constant_values=fill)

    ctx_arrays = (
        ctx.capacities,
        ctx.caps,
        ctx.bases,
        ctx.counts,
        ctx.offsets,
        ctx.values,
        ctx.rev_flags,
        ctx.fwd_index,
        ctx.seq_lengths,
        ctx.rc_index,
        ctx.seq_starts,
    )
    out_keys, out_votes = _vote_device(
        ctx_arrays,
        jnp.asarray(pad(seg.astype(np.int64), fill=-1)),
        jnp.asarray(pad(block_start)),
        jnp.asarray(pad(block_len, fill=1)),
        jnp.asarray(pad(num_bp, fill=1)),
        jnp.asarray(pad(key)),
        jnp.asarray(pad(primary.astype(np.int64)).astype(bool)),
        jnp.asarray(batch.lengths),
        jnp.int64(max_matches_per_seed),
        k_match=k_match,
        k_out=max_candidates_per_read,
        num_reads=num_reads,
        span=span,
        bias=bias,
        n_seqs=n_seqs,
    )
    out_keys = np.asarray(out_keys)
    out_votes = np.asarray(out_votes)

    # slots are [num_reads, k_out] sorted by votes desc; apply the same
    # adaptive noise filter as the numpy path (drop rows far below the read's
    # top vote unless the top itself is weak)
    keys2 = out_keys.reshape(num_reads, max_candidates_per_read)
    votes2 = out_votes.reshape(num_reads, max_candidates_per_read)
    top = votes2[:, :1]
    keep = (keys2 != BIG_KEY) & ((top < 6) | (votes2 * 3 >= top))
    keys = keys2[keep]
    votes = votes2[keep]
    read_of = np.broadcast_to(
        np.arange(num_reads, dtype=np.int32)[:, None], keys2.shape
    )[keep]

    offset = keys % span - bias
    rest = keys // span
    seq_idx = rest % n_seqs
    rest //= n_seqs
    reversed_ = (rest % 2).astype(bool)
    return CandidateTable(
        read_of,
        reversed_,
        seq_idx.astype(np.int32),
        offset.astype(np.int64),
        votes.astype(np.int32),
    )
