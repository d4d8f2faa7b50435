"""The TPU batch alignment engine.

Pipeline (single-end fast path):
1. batched candidate generation (batch/candidates.py): one vectorized pass for
   the whole batch's pyramids + one gather into the packed index + one lexsort
   for offset voting;
2. window building: candidate reference windows gathered from the concatenated
   reference array;
3. device scoring: ungapped diagonal penalties + banded affine DP penalties
   (align/pallas_dp.py) for every candidate at once;
4. vectorized decision: per-read best / Max_PenaltySpan window / MaxNumMatches,
   ties broken toward ungapped (StraightAligner semantics);
5. finalization: candidates whose banded score equals their ungapped score
   become full-length ungapped alignments directly (the overwhelmingly common
   case); reads needing indels, contig-edge economics, paired-end logic, or
   that the batch path leaves unaligned fall back to the exact sequential
   worker (align/worker.py), which is the output-parity reference.

This trades redundant device FLOPs (scoring every candidate, collisions
included) for the removal of per-read host control flow — the TPU-first
inversion of the reference's adaptive search.
"""

from __future__ import annotations

import os

import numpy as np

from mapper_tpu import basepairs
from mapper_tpu.align import pallas_dp
from mapper_tpu.align.blocks import (
    AlignedBlock,
    QueryAlignment,
    QueryAlignments,
    new_sequence_alignment,
)
from mapper_tpu.align.query import Query
from mapper_tpu.align.worker import AlignerWorker
from mapper_tpu.batch.candidates import CandidateTable, ReadBatch, generate_candidates
from mapper_tpu.sequence import Sequence

EPS = 1e-3


class BatchAligner:
    def __init__(
        self,
        reference_index,
        parameters,
        band: int | None = None,
        max_query_length: int = 512,
        max_candidates_per_read: int = 8,
        listeners: list | None = None,
        tile: int = 1024,
        pipeline_chunk_reads: int | None = 2048,
    ):
        self.reference_index = reference_index
        self.database = reference_index.hashblock_database
        self.seq_db = self.database.get_sequence_database()
        self.parameters = parameters
        self.band = band  # None = choose 64/128 per batch from the indel budget
        self.tile = tile
        self.max_query_length = max_query_length
        self.max_candidates_per_read = max_candidates_per_read
        # chunked dispatch lets chunk k+1's host stages overlap chunk k's
        # device scoring (None disables the pipeline)
        self.pipeline_chunk_reads = pipeline_chunk_reads
        self.listeners = listeners if listeners is not None else []
        self.fallback_worker = AlignerWorker(reference_index, parameters)
        self.concat = self.seq_db.concatenated_codes()
        self.stats_fallback_reads = 0
        self.stats_batch_reads = 0

    # ------------------------------------------------------------------

    def process_batch(
        self, queries: list[Query], notify: bool = True
    ) -> list[QueryAlignments]:
        results: list[QueryAlignments | None] = [None] * len(queries)

        batch_indices: list[int] = []
        paired_indices: list[int] = []
        fallback_indices: list[int] = []
        for i, query in enumerate(queries):
            clean = all(
                len(s) <= self.max_query_length
                and not bool(np.any(basepairs.is_ambiguous(s.codes)))
                for s in query.get_sequences()
            )
            if query.get_num_sequences() == 1 and clean:
                batch_indices.append(i)
            elif query.get_num_sequences() == 2 and clean:
                paired_indices.append(i)
            else:
                fallback_indices.append(i)

        if batch_indices:
            batch_queries = [queries[i] for i in batch_indices]
            batch_results = self._align_single_end_pipelined(batch_queries)
            for local, i in enumerate(batch_indices):
                if batch_results[local] is None:
                    fallback_indices.append(i)
                else:
                    results[i] = batch_results[local]

        if paired_indices:
            paired_queries = [queries[i] for i in paired_indices]
            paired_results = self._align_paired_batch(paired_queries)
            for local, i in enumerate(paired_indices):
                if paired_results[local] is None:
                    fallback_indices.append(i)
                else:
                    results[i] = paired_results[local]

        for i in fallback_indices:
            self.stats_fallback_reads += 1
            results[i] = self.fallback_worker.align(queries[i])

        if notify:
            for listener in self.listeners:
                listener.add_alignments(results)
        return results

    # ------------------------------------------------------------------

    def _align_paired_batch(self, queries: list[Query]) -> list[QueryAlignments | None]:
        """Paired-end batch path: one batched candidate pass over both mates'
        component sequences, then exact pairing + extension
        (query_aligner.py's algebra with the native DP) on the trimmed
        candidate set.  Falls back per pair when nothing pairs."""
        from mapper_tpu.align.candidates import PathsCounter, SequenceMatch
        from mapper_tpu.align.query_aligner import QueryMatchAligner

        p = self.parameters
        components: list[Sequence] = []
        for query in queries:
            components.append(query.get_sequence(0))
            components.append(query.get_sequence(1).reverse_complement())
        batch = ReadBatch.from_sequences(components)
        table = generate_candidates(
            batch, self.database, max_candidates_per_read=self.max_candidates_per_read
        )
        order = np.argsort(table.read_id, kind="stable")
        boundaries = np.searchsorted(
            table.read_id[order], np.arange(2 * len(queries) + 1)
        )

        results: list[QueryAlignments | None] = []
        for pair_idx, query in enumerate(queries):
            max_interesting = query.get_length() * p.max_error_rate
            max_inner = int(
                max_interesting * query.get_spacing_deviation_per_unit_penalty()
                + query.get_expected_inner_distance()
            )
            counters_per_component = []
            for ci in range(2):
                read_id = 2 * pair_idx + ci
                rows = order[boundaries[read_id] : boundaries[read_id + 1]]
                component_seq = components[read_id]
                shims = []
                for c in rows.tolist():
                    ref = self.seq_db.get_sequence(int(table.ref_seq_index[c]))
                    if table.reversed_[c]:
                        seq_a = component_seq.reverse_complement()
                    else:
                        seq_a = component_seq
                    match = SequenceMatch(seq_a, ref, int(table.offset[c]))
                    shims.append(_CounterShim(match))
                counters_per_component.append(shims)

            paths_counter = PathsCounter.__new__(PathsCounter)
            paths_counter.components = []
            paths_counter.max_offset_between_components = max_inner + len(
                query.get_sequence(0)
            )
            paths_counter.found_nonempty_result = True
            paths_counter._prev_components = None
            paths_counter._prev_matches = None
            pair_matches = paths_counter._match_without_cache(counters_per_component)

            if not pair_matches:
                results.append(None)
                continue
            aligner = QueryMatchAligner(query, p, self.reference_index)
            for match in pair_matches:
                aligner.align(match)
            best = aligner.get_best_alignments()
            if not best:
                results.append(None)  # mate-rescue paths: sequential fallback
                continue
            for choice in best:  # ancestral -> original coordinate rewrite
                computed = choice.get_sequence_b()
                original = self.reference_index.get_original_sequence(computed)
                if original is not computed:
                    choice.put_sequence_b(original)
            if len(best) > p.max_num_matches:
                results.append(QueryAlignments.unaligned(query.get_sequences()))
                continue
            results.append(
                QueryAlignments.single_component(query.get_sequences(), best)
            )
        return results

    # ------------------------------------------------------------------

    def _align_single_end_pipelined(
        self, queries: list[Query]
    ) -> list[QueryAlignments | None]:
        """Software-pipelined single-end path: the batch is split into chunks
        and chunk k+1's host work (candidate generation + window gathers) runs
        while chunk k's scores compute on the device — JAX dispatch is async,
        so the device stays busy during the host stages."""
        chunk = self.pipeline_chunk_reads
        n = len(queries)
        if chunk is None or n <= chunk:
            ctx = self._dispatch_single_end(queries)
            return self._finish_single_end(ctx)
        # even chunk sizes (no ragged tail) keep the padded candidate count in
        # the same compile-size bucket across chunks and across batches
        k = -(-n // chunk)
        base, extra = divmod(n, k)
        results: list[QueryAlignments | None] = []
        pending = None
        lo = 0
        for i in range(k):
            hi = lo + base + (1 if i < extra else 0)
            ctx = self._dispatch_single_end(queries[lo:hi])
            lo = hi
            if pending is not None:
                results.extend(self._finish_single_end(pending))
            pending = ctx
        results.extend(self._finish_single_end(pending))
        return results

    def _align_single_end_batch(
        self, queries: list[Query]
    ) -> list[QueryAlignments | None]:
        """Returns one QueryAlignments per query, or None where the exact
        sequential path must decide."""
        return self._finish_single_end(self._dispatch_single_end(queries))

    def _dispatch_single_end(self, queries: list[Query]):
        """Host stages + asynchronous device dispatch for one chunk; returns an
        opaque context consumed by _finish_single_end."""
        import os
        import time as _time

        trace = os.environ.get("MAPPER_TPU_TRACE") == "1"
        t0 = _time.time()

        def mark(label):
            nonlocal t0
            if trace:
                now = _time.time()
                print(f"[engine] {label}: {now - t0:.3f}s", flush=True)
                t0 = now

        p = self.parameters
        reads = [q.get_sequence(0) for q in queries]
        batch = ReadBatch.from_sequences(reads)
        num_reads = batch.num_reads
        self.stats_batch_reads += num_reads

        max_indel = np.maximum(
            0,
            (
                (batch.lengths * p.max_error_rate - p.deletion_start_penalty)
                / p.deletion_extension_penalty
            ).astype(np.int64),
        )
        if self.band is not None:
            band = self.band
        else:
            band = 64 if int(max_indel.max(initial=0)) <= 31 else 128
        shift = np.minimum(max_indel, band // 2)

        mark("setup")
        import jax as _jax

        # Device-side voting is opt-in: the multi-million-element sort/scatter
        # vote program compiles pathologically slowly on remote TPU backends
        # (observed >10min for both int64 and int32-pair keys), so the numpy
        # voting path stays the default.
        if os.environ.get("MAPPER_TPU_DEVICE_VOTE") == "1" and _jax.default_backend() == "tpu":
            from mapper_tpu.batch.candidates import collect_batch_seeds
            from mapper_tpu.batch.device_vote import generate_candidates_device

            seeds = collect_batch_seeds(batch, self.database)
            mark("seeds")
            table = generate_candidates_device(
                batch,
                self.database,
                seeds,
                max_candidates_per_read=self.max_candidates_per_read,
            )
            if table is None:  # int32 key-space overflow: use the numpy path
                table = generate_candidates(
                    batch, self.database, max_candidates_per_read=self.max_candidates_per_read
                )
        else:
            table = generate_candidates(
                batch, self.database, max_candidates_per_read=self.max_candidates_per_read
            )
        mark(f"candidates ({len(table)})")
        if len(table) == 0:
            return [None] * num_reads

        seq_starts = self.seq_db.starts
        _, _, seq_lengths = _tables(self.database)
        n_per_cand = batch.lengths[table.read_id]
        shift_per_cand = shift[table.read_id]
        contig_len = seq_lengths[table.ref_seq_index]

        win_start_local = np.maximum(0, table.offset - shift_per_cand)
        win_end_local = np.minimum(contig_len, table.offset + n_per_cand + shift_per_cand)
        valid = win_end_local > win_start_local
        # edge candidates (clamped windows touching contig bounds) use the
        # sequential path for exact contig-edge economics
        at_edge = (table.offset - shift_per_cand < 0) | (
            table.offset + n_per_cand + shift_per_cand > contig_len
        )

        # bucket the padded query length so the kernel compiles once per size
        # class instead of once per batch
        lq = -(-int(batch.lengths.max()) // 64) * 64
        lw = lq + band
        num_cands = len(table)

        # query codes per candidate (RC codes for reverse-strand candidates)
        q_mat = np.zeros((num_reads, lq), dtype=np.uint8)
        rc_mat = np.zeros((num_reads, lq), dtype=np.uint8)
        for r, seq in enumerate(reads):
            q_mat[r, : len(seq)] = seq.codes
            rc_mat[r, : len(seq)] = basepairs.reverse_complement(seq.codes)
        q_codes = np.where(
            table.reversed_[:, None], rc_mat[table.read_id], q_mat[table.read_id]
        )

        # window codes gathered from the concatenated reference
        win_start_global = seq_starts[table.ref_seq_index] + win_start_local
        w_idx = win_start_global[:, None] + np.arange(lw, dtype=np.int64)[None, :]
        w_len = (win_end_local - win_start_local).astype(np.int64)
        w_idx = np.minimum(w_idx, self.concat.shape[0] - 1)
        w_codes = self.concat[w_idx]

        import jax

        mark("windows")
        in_contig = (table.offset >= 0) & (table.offset + n_per_cand <= contig_len)
        use_device_diag = jax.default_backend() == "tpu"
        if use_device_diag:
            # async dispatch: jnp results are futures until np.asarray in finish
            banded_dev, diag_dev = pallas_dp.banded_scores(
                q_codes,
                w_codes,
                n_per_cand,
                w_len,
                p,
                band=band,
                tile=self.tile,
                return_diag_sums=True,
            )
            host_ungapped = None
        else:
            banded_dev = pallas_dp.banded_scores(
                q_codes, w_codes, n_per_cand, w_len, p, band=band, tile=self.tile
            )
            diag_dev = None
            diag_start = seq_starts[table.ref_seq_index] + np.clip(table.offset, 0, None)
            d_idx = diag_start[:, None] + np.arange(lq, dtype=np.int64)[None, :]
            d_idx = np.minimum(d_idx, self.concat.shape[0] - 1)
            ref_diag = self.concat[d_idx]
            x_valid = np.arange(lq)[None, :] < n_per_cand[:, None]
            pen = _base_penalty_np(q_codes, ref_diag, p)
            host_ungapped = np.where(x_valid, pen, 0.0).sum(axis=1)
            host_ungapped = np.where(in_contig, host_ungapped, np.inf)
        mark("dispatch")
        return {
            "queries": queries,
            "batch": batch,
            "num_reads": num_reads,
            "table": table,
            "banded_dev": banded_dev,
            "diag_dev": diag_dev,
            "host_ungapped": host_ungapped,
            "in_contig": in_contig,
            "valid": valid,
            "at_edge": at_edge,
            "n_per_cand": n_per_cand,
            "win_start_local": win_start_local,
            "num_cands": num_cands,
            "band": band,
            "mark": mark,
        }

    def _finish_single_end(self, ctx) -> list[QueryAlignments | None]:
        """Materialize one chunk's device scores and make the per-read
        decisions (second pipeline stage)."""
        if isinstance(ctx, list):  # empty-candidate chunk resolved at dispatch
            return ctx
        p = self.parameters
        queries = ctx["queries"]
        batch = ctx["batch"]
        num_reads = ctx["num_reads"]
        table = ctx["table"]
        in_contig = ctx["in_contig"]
        valid = ctx["valid"]
        at_edge = ctx["at_edge"]
        n_per_cand = ctx["n_per_cand"]
        win_start_local = ctx["win_start_local"]
        num_cands = ctx["num_cands"]
        band = ctx["band"]
        mark = ctx["mark"]

        banded = np.asarray(ctx["banded_dev"], dtype=np.float64)
        if ctx["diag_dev"] is not None:
            diag_sums = np.asarray(ctx["diag_dev"], dtype=np.float64)
            # the voted offset's diagonal is band lane (offset - window start)
            lane = (table.offset - win_start_local).astype(np.int64)
            lane_valid = (lane >= 0) & (lane < band)
            ungapped = np.where(
                in_contig & lane_valid,
                diag_sums[np.arange(num_cands), np.clip(lane, 0, band - 1)],
                np.inf,
            )
        else:
            ungapped = ctx["host_ungapped"]

        mark("scoring")
        # --- per-read decisions (vectorized over the candidate table) ----
        max_allowed = np.nextafter(n_per_cand * p.max_error_rate, np.inf)
        score = np.where(valid, np.minimum(banded, ungapped), np.inf)
        viable = score <= max_allowed + EPS

        order = np.argsort(table.read_id, kind="stable")
        read_sorted = table.read_id[order]
        score_sorted = np.where(viable, score, np.inf)[order]
        boundaries = np.searchsorted(read_sorted, np.arange(num_reads + 1))
        starts, ends = boundaries[:-1], boundaries[1:]
        nonempty = starts < ends

        best_per_read = np.full(num_reads, np.inf)
        if order.shape[0]:
            safe_starts = np.minimum(starts, order.shape[0] - 1)
            reduced = np.minimum.reduceat(score_sorted, safe_starts)
            best_per_read = np.where(nonempty, reduced, np.inf)

        read_max_allowed = np.nextafter(batch.lengths * p.max_error_rate, np.inf)
        cutoff_per_read = np.minimum(
            best_per_read + p.max_penalty_span, read_max_allowed
        )
        emit = viable & (score <= cutoff_per_read[table.read_id] + EPS)
        # reads whose emit set needs anything but clean ungapped emission go to
        # the exact path
        bad = emit & (at_edge | (banded < ungapped - EPS))
        bad_reads = np.zeros(num_reads, dtype=bool)
        bad_reads[table.read_id[bad]] = True
        emit_counts = np.bincount(table.read_id[emit], minlength=num_reads)

        results: list[QueryAlignments | None] = [None] * num_reads
        emit_sorted = emit[order]
        for r in np.nonzero(nonempty & ~bad_reads & (emit_counts > 0))[0].tolist():
            query = queries[r]
            if emit_counts[r] > p.max_num_matches:
                results[r] = QueryAlignments.unaligned(query.get_sequences())
                continue
            rows = order[starts[r] : ends[r]]
            rows = rows[emit_sorted[starts[r] : ends[r]]]
            choices = []
            ok = True
            for c in rows.tolist():
                choice = self._make_ungapped_alignment(query, table, c)
                if choice is None:
                    ok = False
                    break
                choices.append(choice)
            if not ok:
                continue
            # dedup identical choices (different vote buckets, same placement)
            seen = set()
            unique = []
            for choice in choices:
                key = choice.content_key()
                if key not in seen:
                    seen.add(key)
                    unique.append(choice)
            results[r] = QueryAlignments.single_component(query.get_sequences(), unique)
        mark("decisions+emit")
        return results

    def _make_ungapped_alignment(
        self, query: Query, table: CandidateTable, c: int
    ) -> QueryAlignment | None:
        seq = query.get_sequence(0)
        ref = self.seq_db.get_sequence(int(table.ref_seq_index[c]))
        offset = int(table.offset[c])
        if table.reversed_[c]:
            seq_a = seq.reverse_complement()
        else:
            seq_a = seq
        if offset < 0 or offset + len(seq_a) > len(ref):
            return None
        # under ancestry inference the index holds ancestral sequences: report
        # coordinates on the original contig while keeping the ancestral codes
        # as the penalty base (AlignerWorker.updateSequenceB semantics)
        original = self.reference_index.get_original_sequence(ref)
        if original is not ref:
            block = AlignedBlock(
                seq_a, original, 0, offset, len(seq_a), len(seq_a),
                sequence_b_history=ref,
            )
        else:
            block = AlignedBlock(seq_a, ref, 0, offset, len(seq_a), len(seq_a))
        alignment = new_sequence_alignment(
            [block], bool(table.reversed_[c]), self.parameters
        )
        max_allowed = np.nextafter(len(seq_a) * self.parameters.max_error_rate, np.inf)
        if alignment.get_penalty() > max_allowed:
            return None
        return QueryAlignment(alignment)


class _CounterShim:
    """Just enough of MatchCounter for PathsCounter pairing."""

    __slots__ = ("match", "priority")

    def __init__(self, match):
        self.match = match
        self.priority = 0

    def get_num_distinct_mismatches(self) -> int:
        return 0


def _base_penalty_np(q, w, params):
    union = (q | w).astype(np.int32)
    can_match = (q & w) != 0
    popcount = (union & 1) + ((union >> 1) & 1) + ((union >> 2) & 1) + ((union >> 3) & 1)
    amb = params.ambiguity_penalty * (popcount - 1) / 3.0
    return np.where(can_match, amb, params.mutation_penalty)


_TABLE_CACHE: dict[int, tuple] = {}


def _tables(database):
    from mapper_tpu.batch.candidates import _strand_tables

    return _strand_tables(database)
