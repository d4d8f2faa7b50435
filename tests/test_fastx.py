import gzip
import io

from mapper_tpu.io import fastx


def test_parse_fasta_truncates_name_at_space():
    # behavior pinned by the reference's FastaParser_Test.java:12-24
    handle = io.StringIO(">contig1 description here\nACGT\nACGT\n>c2\nGG\n")
    records = list(fastx.parse_fasta(handle))
    assert len(records) == 2
    assert records[0].get_name() == "contig1"
    assert records[0].build().get_text() == "ACGTACGT"
    assert records[1].build().get_text() == "GG"


def test_parse_fastq():
    handle = io.StringIO("@r1 extra\nACGT\n+\nIIII\n@r2\nGGCC\n+r2\nJJJJ\n")
    records = [b.build() for b in fastx.parse_fastq(handle)]
    assert [r.name for r in records] == ["r1", "r2"]
    assert records[0].get_text() == "ACGT"
    assert records[0].quality == b"IIII"
    assert records[1].quality == b"JJJJ"


def test_load_from_gz(tmp_path):
    path = tmp_path / "ref.fasta.gz"
    with gzip.open(path, "wt") as handle:
        handle.write(">a\nACGTACGT\n")
    provider = fastx.load_from(str(path), keep_quality=False)
    records = [b.build() for b in provider]
    assert len(records) == 1
    assert records[0].get_text() == "ACGTACGT"


def test_load_from_multiple_files(tmp_path):
    p1 = tmp_path / "a.fasta"
    p1.write_text(">a\nAC\n")
    p2 = tmp_path / "b.fq"
    p2.write_text("@b\nGT\n+\nII\n")
    provider = fastx.load_from([str(p1), str(p2)], keep_quality=True)
    records = [b.build() for b in provider]
    assert [r.name for r in records] == ["a", "b"]
    assert not provider.all_reads_contain_quality_information()


def test_fasta_writer_roundtrip(tmp_path):
    from mapper_tpu.sequence import Sequence

    path = tmp_path / "out.fasta"
    writer = fastx.FastaWriter(str(path))
    writer.write(Sequence.from_text("s1", "ACGT"))
    writer.close()
    assert path.read_text() == ">s1\nACGT\n"


def test_fastq_writer(tmp_path):
    from mapper_tpu.sequence import Sequence

    path = tmp_path / "out.fastq"
    writer = fastx.FastqWriter(str(path))
    seq = Sequence("r", fastx.parse_fasta(io.StringIO(">x\nACGT\n")).__next__().build().codes, quality=b"IIII")
    writer.write(seq)
    writer.close()
    assert path.read_text() == "@r\nACGT\n+\nIIII\n"
