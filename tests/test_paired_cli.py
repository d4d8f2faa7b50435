"""Paired-end CLI end-to-end (BASELINE config 3 shape: PE reads with
--spacing, SAM + VCF output)."""

import numpy as np

from mapper_tpu import basepairs
from mapper_tpu.cli import main as cli_main


def random_text(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_paired_end_cli(tmp_path):
    ref_text = random_text(8000, 40)
    rng = np.random.default_rng(41)
    r1_lines, r2_lines = [], []
    truths = []
    for i in range(12):
        pos = int(rng.integers(0, 8000 - 400))
        frag = ref_text[pos : pos + 350]
        m1 = frag[:150]
        m2 = basepairs.decode(basepairs.reverse_complement(basepairs.encode(frag[-150:])))
        r1_lines.append(f"@p{i}\n{m1}\n+\n{'I' * 150}\n")
        r2_lines.append(f"@p{i}\n{m2}\n+\n{'I' * 150}\n")
        truths.append(pos)
    (tmp_path / "r1.fastq").write_text("".join(r1_lines))
    (tmp_path / "r2.fastq").write_text("".join(r2_lines))
    (tmp_path / "ref.fasta").write_text(">chr\n" + ref_text + "\n")

    sam = tmp_path / "out.sam"
    vcf = tmp_path / "out.vcf"
    rc = cli_main(
        [
            "--reference",
            str(tmp_path / "ref.fasta"),
            "--paired-queries",
            str(tmp_path / "r1.fastq"),
            str(tmp_path / "r2.fastq"),
            "--spacing",
            "50",
            "50",
            "--out-sam",
            str(sam),
            "--out-vcf",
            str(vcf),
        ]
    )
    assert rc == 0
    body = [l for l in sam.read_text().splitlines() if not l.startswith("@")]
    assert len(body) == 24  # one row per mate per pair
    by_name: dict[str, list[list[str]]] = {}
    for line in body:
        fields = line.split("\t")
        by_name.setdefault(fields[0], []).append(fields)
    for i, pos in enumerate(truths):
        rows = by_name[f"p{i}"]
        assert len(rows) == 2
        flags = sorted(int(r[1]) for r in rows)
        assert flags == [99, 147]
        first = [r for r in rows if int(r[1]) == 99][0]
        assert int(first[3]) == pos + 1
        # mate coordinates cross-reference each other
        second = [r for r in rows if int(r[1]) == 147][0]
        assert int(first[7]) == int(second[3])
        assert int(second[7]) == int(first[3])
    # VCF coverage exists
    vcf_rows = [
        l for l in vcf.read_text().splitlines() if l and not l.startswith("#")
    ]
    assert len(vcf_rows) > 1000
