"""Multi-reference (metagenomic) mode: --out-refs-map-count over several
--reference files (BASELINE config 4)."""

import numpy as np

from mapper_tpu.cli import main as cli_main


def random_text(n, seed):
    rng = np.random.default_rng(seed)
    return "".join(rng.choice(list("ACGT"), size=n))


def test_refs_map_count_multi_reference(tmp_path):
    genome_a = random_text(1500, 30)
    genome_b = random_text(1500, 31)
    ref_a = tmp_path / "a.fasta"
    ref_a.write_text(">gA1\n" + genome_a[:700] + "\n>gA2\n" + genome_a[700:] + "\n")
    ref_b = tmp_path / "b.fasta"
    ref_b.write_text(">gB\n" + genome_b + "\n")

    shared = random_text(150, 32)
    reads = [
        genome_a[100:250],  # only genome A
        genome_b[200:350],  # only genome B
        genome_a[300:450],  # only genome A
        random_text(150, 33),  # matches nothing
    ]
    reads_path = tmp_path / "reads.fasta"
    reads_path.write_text("".join(f">r{i}\n{t}\n" for i, t in enumerate(reads)))

    counts = tmp_path / "counts.txt"
    unaligned = tmp_path / "unaligned.fasta"
    rc = cli_main(
        [
            "--reference",
            str(ref_a),
            "--reference",
            str(ref_b),
            "--queries",
            str(reads_path),
            "--out-refs-map-count",
            str(counts),
            "--out-unaligned",
            str(unaligned),
        ]
    )
    assert rc == 0
    rows = {}
    for line in counts.read_text().splitlines():
        if line.startswith("#") or line.startswith("COUNT"):
            continue
        count, refs = line.split("\t")
        rows[refs] = int(count)
    assert rows == {str(ref_a): 2, str(ref_b): 1}
    assert ">r3" in unaligned.read_text()


def test_reads_mapping_to_both_references(tmp_path):
    shared_segment = random_text(200, 34)
    genome_a = random_text(400, 35) + shared_segment
    genome_b = shared_segment + random_text(400, 36)
    ref_a = tmp_path / "a.fasta"
    ref_a.write_text(">gA\n" + genome_a + "\n")
    ref_b = tmp_path / "b.fasta"
    ref_b.write_text(">gB\n" + genome_b + "\n")
    reads_path = tmp_path / "reads.fasta"
    reads_path.write_text(">r0\n" + shared_segment[25:175] + "\n")
    counts = tmp_path / "counts.txt"
    rc = cli_main(
        [
            "--reference",
            str(ref_a),
            "--reference",
            str(ref_b),
            "--queries",
            str(reads_path),
            "--out-refs-map-count",
            str(counts),
        ]
    )
    assert rc == 0
    rows = {}
    for line in counts.read_text().splitlines():
        if line.startswith("#") or line.startswith("COUNT"):
            continue
        count, refs = line.split("\t")
        rows[refs] = int(count)
    # the read maps to the shared segment in both genomes -> combined row
    assert rows == {f"{ref_a},{ref_b}": 1}
