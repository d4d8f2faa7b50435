"""Device-side seed lookup + offset voting.

Takes the host-collected seed arrays (batch/candidates.collect_batch_seeds)
and runs the index lookup, strand folding, vote counting, and top-K selection
as one jitted XLA program:

- merged-index gather (counts/offsets/values live on the device),
- fixed-width match expansion ([S, K_MATCH] instead of a ragged CSR walk),
- vote keys are int32 PAIRS (hi = read/strand/contig, lo = offset) sorted
  lexicographically with a single multi-key ``lax.sort``; segment boundaries
  give the counts,
- per-read top-K by (votes desc) via a second multi-key sort.

All device arithmetic is int32 — TPU sorts over int64 require emulated
wide-integer comparators that compile pathologically slowly, so the key
space is split into a pair instead.  Shapes are bucketed (seed count padded
to a power-of-two class) so the program compiles a handful of times per run.
The engine falls back to the numpy implementation when the key components
would overflow int32.
"""

from __future__ import annotations

import functools

import jax

# the encoded global positions in the merged index are int64 (fwd+rc
# concatenation of a large genome overflows int32); x64 must be on for the
# device arrays to keep their dtype.  Only gathers/searchsorted touch int64 —
# every sort key is int32 (wide-integer sort comparators are the thing that
# compiles pathologically slowly on TPU).
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from mapper_tpu.batch.candidates import CandidateTable, ReadBatch, _strand_tables

INVALID = np.int32(2**31 - 1)


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
    static_argnames=("k_match", "k_out", "num_reads", "bias", "n_seqs"),
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
    j = jnp.arange(k_match, dtype=jnp.int32)[None, :]
    valid = j < eff_counts[:, None]
    value_idx = jnp.clip(offsets_arr[bins][:, None] + j, 0, values_arr.shape[0] - 1)
    positions = values_arr[value_idx]  # encoded global positions

    # decode (sequence, offset)
    pos_seq_idx = jnp.searchsorted(seq_starts, positions, side="right") - 1
    pos_offsets = (positions - seq_starts[pos_seq_idx]).astype(jnp.int32)

    b_start = block_start[:, None]
    b_len = block_len[:, None]
    this_primary = primary[:, None]
    read_len = read_lengths[seg][:, None]

    folded_offsets = jnp.where(
        this_primary,
        pos_offsets,
        seq_lengths[rc_index[pos_seq_idx]].astype(jnp.int32) - pos_offsets - b_len,
    )
    folded_seq_idx = jnp.where(this_primary, pos_seq_idx, rc_index[pos_seq_idx])
    matched_reverse = rev_flags[folded_seq_idx].astype(jnp.int32)
    matched_fwd_idx = fwd_index[folded_seq_idx].astype(jnp.int32)

    contig_len = seq_lengths[matched_fwd_idx].astype(jnp.int32)
    fwd_offset = folded_offsets - b_start
    rc_offset = (contig_len - (folded_offsets + b_len)) - (read_len - (b_start + b_len))
    offset = jnp.where(matched_reverse == 1, rc_offset, fwd_offset)

    read = jnp.broadcast_to(seg[:, None], (s, k_match))

    hi = (read * 2 + matched_reverse) * n_seqs + matched_fwd_idx
    lo = offset + bias
    hi = jnp.where(valid, hi, INVALID)
    lo = jnp.where(valid, lo, INVALID)
    flat_hi = hi.reshape(-1)
    flat_lo = lo.reshape(-1)

    sorted_hi, sorted_lo = jax.lax.sort((flat_hi, flat_lo), num_keys=2)
    total = flat_hi.shape[0]
    boundary = jnp.concatenate(
        [
            jnp.ones(1, bool),
            (sorted_hi[1:] != sorted_hi[:-1]) | (sorted_lo[1:] != sorted_lo[:-1]),
        ]
    )
    is_valid = sorted_hi != INVALID
    boundary &= is_valid
    group_id = jnp.cumsum(boundary) - 1  # id per row (within valid prefix)
    votes_per_group = jnp.zeros(total, jnp.int32).at[
        jnp.where(is_valid, group_id, total - 1)
    ].add(jnp.where(is_valid, 1, 0))
    votes_rows = jnp.where(boundary, votes_per_group[group_id], 0)

    # representative rows = boundaries; rank groups per read by votes desc
    g_hi = jnp.where(boundary, sorted_hi, INVALID)
    g_lo = jnp.where(boundary, sorted_lo, INVALID)
    g_votes = votes_rows
    g_read = jnp.where(boundary, sorted_hi // (2 * n_seqs), num_reads).astype(jnp.int32)
    neg_votes = (total - g_votes).astype(jnp.int32)
    # stable sort by (read asc, votes desc); carries keep (hi, lo, votes) aligned
    g_read2, _, g_hi2, g_lo2, g_votes2 = jax.lax.sort(
        (g_read, neg_votes, g_hi, g_lo, g_votes), num_keys=2
    )

    # positions within each read group
    idx = jnp.arange(total, dtype=jnp.int32)
    is_first = jnp.concatenate([jnp.ones(1, bool), g_read2[1:] != g_read2[:-1]])
    group_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, idx, 0)
    )
    rank = idx - group_start
    keep = (g_read2 < num_reads) & (rank < k_out)

    # scatter into [num_reads, k_out] slots
    slot = jnp.where(keep, g_read2 * k_out + rank, num_reads * k_out)
    out_hi = jnp.full(num_reads * k_out + 1, INVALID, jnp.int32).at[slot].set(
        jnp.where(keep, g_hi2, INVALID)
    )
    out_lo = jnp.full(num_reads * k_out + 1, INVALID, jnp.int32).at[slot].set(
        jnp.where(keep, g_lo2, INVALID)
    )
    out_votes = jnp.zeros(num_reads * k_out + 1, jnp.int32).at[slot].set(
        jnp.where(keep, g_votes2, 0)
    )
    return out_hi[:-1], out_lo[:-1], out_votes[:-1]


def generate_candidates_device(
    batch: ReadBatch,
    database,
    seeds,
    max_candidates_per_read: int = 8,
    max_matches_per_seed: int = 12,
    k_match: int = 12,
) -> CandidateTable:
    """Device voting over host-collected seeds.  `seeds` is the tuple from
    collect_batch_seeds.  Returns None when the int32 key space would
    overflow (caller should use the numpy path)."""
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
    bias = max_len + 1
    if 2 * num_reads * n_seqs >= 2**31 - 1 or longest_contig + 2 * max_len + 2 >= 2**31 - 1:
        return None  # int32 pair keys can't represent this workload

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
    out_hi, out_lo, out_votes = _vote_device(
        ctx_arrays,
        jnp.asarray(pad(seg.astype(np.int32), fill=-1)),
        jnp.asarray(pad(block_start.astype(np.int32))),
        jnp.asarray(pad(block_len.astype(np.int32), fill=1)),
        jnp.asarray(pad(num_bp, fill=1)),
        jnp.asarray(pad(key)),
        jnp.asarray(pad(primary.astype(np.int8)).astype(bool)),
        jnp.asarray(batch.lengths.astype(np.int32)),
        jnp.int32(max_matches_per_seed),
        k_match=k_match,
        k_out=max_candidates_per_read,
        num_reads=num_reads,
        bias=bias,
        n_seqs=n_seqs,
    )
    out_hi = np.asarray(out_hi)
    out_lo = np.asarray(out_lo)
    out_votes = np.asarray(out_votes)

    # slots are [num_reads, k_out] sorted by votes desc; apply the same
    # adaptive noise filter as the numpy path (drop rows far below the read's
    # top vote unless the top itself is weak)
    hi2 = out_hi.reshape(num_reads, max_candidates_per_read)
    lo2 = out_lo.reshape(num_reads, max_candidates_per_read)
    votes2 = out_votes.reshape(num_reads, max_candidates_per_read)
    top = votes2[:, :1]
    keep = (hi2 != INVALID) & ((top < 6) | (votes2 * 3 >= top))
    hi = hi2[keep].astype(np.int64)
    lo = lo2[keep].astype(np.int64)
    votes = votes2[keep]
    read_of = np.broadcast_to(
        np.arange(num_reads, dtype=np.int32)[:, None], hi2.shape
    )[keep]

    seq_idx = hi % n_seqs
    rest = hi // n_seqs
    reversed_ = (rest % 2).astype(bool)
    offset = lo - bias
    return CandidateTable(
        read_of,
        reversed_,
        seq_idx.astype(np.int32),
        offset.astype(np.int64),
        votes.astype(np.int32),
    )
