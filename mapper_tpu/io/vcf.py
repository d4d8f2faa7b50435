"""Per-position summary output (reference: QuickVariants VcfWriter; the format
is documented in the file header it writes — the upstream source is in the
absent QuickVariants submodule, so this implementation defines and documents
an equivalent column set with the features the CLI exposes:

- one row per covered reference position (--vcf-exclude-non-mutations drops
  rows whose observed alleles all match the reference),
- middle-of-read and end-of-read depths reported separately
  (--distinguish-query-ends),
- observed alleles with their weights,
- one supporting read name per row unless --vcf-omit-support-reads.
"""

from __future__ import annotations

import numpy as np

from mapper_tpu import basepairs
from mapper_tpu.io.mutations import MutationDetectionParameters, format_number
from mapper_tpu.pileup import ROW_AMB, ROW_CHARS, ROW_DEL, ContigPileup
from mapper_tpu.sequence import Sequence

_HEADER = """\
## Per-position alignment summary
## Columns:
##   CHR, POS (1-based), REF: the reference position
##   DEPTH_MIDDLE / DEPTH_END: aligned weight from the middle / ends of reads
##   ALLELES: observed alleles as allele=middleWeight+endWeight, ';'-separated
##            ('-' = deletion; 'ins:TEXT' = insertion following this position)
##   SUPPORT: name of one supporting read (omitted with --vcf-omit-support-reads)
"""


class VcfWriter:
    def __init__(
        self,
        stream_or_path,
        include_non_mutations: bool,
        parameters: MutationDetectionParameters,
        show_support_read: bool,
    ):
        if isinstance(stream_or_path, str):
            self.stream = open(stream_or_path, "wt", encoding="ascii")
            self._owns = True
        else:
            self.stream = stream_or_path
            self._owns = False
        self.include_non_mutations = include_non_mutations
        self.parameters = parameters
        self.show_support_read = show_support_read
        self.num_reference_positions_matched = 0

    def get_num_reference_positions_matched(self) -> int:
        return self.num_reference_positions_matched

    def write(self, pileups: dict[Sequence, ContigPileup], num_threads: int = 1) -> None:
        self.stream.write(_HEADER)
        columns = ["CHR", "POS", "REF", "DEPTH_MIDDLE", "DEPTH_END", "ALLELES"]
        if self.show_support_read:
            columns.append("SUPPORT")
        self.stream.write("#" + "\t".join(columns) + "\n")
        for sequence, pileup in pileups.items():
            self._write_contig(sequence, pileup)
        if self._owns:
            self.stream.close()

    def _write_contig(self, sequence: Sequence, pileup: ContigPileup) -> None:
        p = self.parameters
        middle_depth = pileup.middle.sum(axis=0)
        end_depth = pileup.end.sum(axis=0)
        total = middle_depth + end_depth
        covered_mask = total > 0
        self.num_reference_positions_matched += int(np.count_nonzero(covered_mask))

        insertions_by_pos: dict[int, list[tuple[str, float, float, str]]] = {}
        for (pos, text), (mid_w, end_w, example) in pileup.insertions.items():
            insertions_by_pos.setdefault(pos, []).append((text, mid_w, end_w, example))

        # --- vectorized fast path: positions whose only observed allele is
        # the (unambiguous) reference base and that have no insertions; on
        # covered genomes this is nearly every row ---------------------------
        from mapper_tpu.pileup import _CODE_TO_ROW

        present = (pileup.middle + pileup.end) > 0
        n_alleles = present.sum(axis=0)
        ref_row = _CODE_TO_ROW[sequence.codes].astype(np.int64)
        is_acgt = np.isin(sequence.codes, (1, 2, 4, 8))
        npos = total.shape[0]
        ref_present = present[ref_row, np.arange(npos)]
        has_ins = np.zeros(npos, dtype=bool)
        if insertions_by_pos:
            has_ins[np.fromiter(insertions_by_pos, dtype=np.int64)] = True
        simple = (
            covered_mask & is_acgt & (n_alleles == 1) & ref_present & ~has_ins
        )

        simple_lines: list[str] = []
        simple_pos = np.zeros(0, dtype=np.int64)
        if self.include_non_mutations:
            keep = simple & (total >= p.min_snp_total_depth)
            simple_pos = np.nonzero(keep)[0]
            if simple_pos.shape[0]:
                # few distinct (ref base, mid, end) combos: format each once
                # (per-column uniques + an int key beat np.unique(axis=0)'s
                # row-sort by ~10x at genome scale)
                mid_u, mid_inv = np.unique(middle_depth[simple_pos], return_inverse=True)
                end_u, end_inv = np.unique(end_depth[simple_pos], return_inverse=True)
                key = (
                    ref_row[simple_pos] * mid_u.shape[0] + mid_inv
                ) * end_u.shape[0] + end_inv
                key_u, inverse = np.unique(key, return_inverse=True)
                supp = "\t." if self.show_support_read else ""
                suffixes = []
                for k in key_u.tolist():
                    e_i = k % end_u.shape[0]
                    rest = k // end_u.shape[0]
                    m_i = rest % mid_u.shape[0]
                    rc = ROW_CHARS[int(rest // mid_u.shape[0])]
                    ms = format_number(float(mid_u[m_i]))
                    es = format_number(float(end_u[e_i]))
                    suffixes.append(f"\t{rc}\t{ms}\t{es}\t{rc}={ms}+{es}{supp}\n")
                name = sequence.name
                simple_lines = [
                    f"{name}\t{pos}{suffixes[j]}"
                    for pos, j in zip((simple_pos + 1).tolist(), inverse.tolist())
                ]

        # --- exact per-position path for everything else ---------------------
        complex_pos_list: list[int] = []
        complex_lines: list[str] = []
        for pos in np.nonzero(covered_mask & ~simple)[0].tolist():
            ref_char = basepairs.decode_one(int(sequence.codes[pos]))
            alleles = []
            is_mutation = False
            for row in range(6):
                mid_w = pileup.middle[row, pos]
                end_w = pileup.end[row, pos]
                if mid_w + end_w <= 0:
                    continue
                char = ROW_CHARS[row]
                if char != ref_char:
                    is_mutation = True
                alleles.append(f"{char}={format_number(mid_w)}+{format_number(end_w)}")
            for text, mid_w, end_w, _example in insertions_by_pos.get(pos, []):
                is_mutation = True
                alleles.append(f"ins:{text}={format_number(mid_w)}+{format_number(end_w)}")
            if not is_mutation and not self.include_non_mutations:
                continue
            if total[pos] < p.min_snp_total_depth:
                continue
            fields = [
                sequence.name,
                str(pos + 1),
                ref_char,
                format_number(middle_depth[pos]),
                format_number(end_depth[pos]),
                ";".join(alleles),
            ]
            if self.show_support_read:
                fields.append(".")
            complex_pos_list.append(pos)
            complex_lines.append("\t".join(fields) + "\n")

        # merge the two (each position-sorted) streams back into one order
        if complex_lines:
            complex_pos = np.array(complex_pos_list, dtype=np.int64)
            merged: list[str | None] = [None] * (len(simple_lines) + len(complex_lines))
            s_idx = np.arange(len(simple_lines)) + np.searchsorted(
                complex_pos, simple_pos
            )
            c_idx = np.arange(len(complex_lines)) + np.searchsorted(
                simple_pos, complex_pos
            )
            for i, line in zip(s_idx.tolist(), simple_lines):
                merged[i] = line
            for i, line in zip(c_idx.tolist(), complex_lines):
                merged[i] = line
            self.stream.write("".join(merged))
        else:
            self.stream.write("".join(simple_lines))
