"""Tests for data acquisition: URL building, gunzip, GENCODE filtering.

Network access is not exercised (zero-egress environment); scraping /
download paths are covered by URL construction + error-handling tests only,
matching the upstream approach of skipping live-network tests.
"""

import gzip
import pathlib

import pytest

from seekr_tpu.data import Downloader, filter_gencode
from seekr_tpu.data.filter_gencode import (
    get_transcript_id_with_ensembl_canonical, get_transcript_id_with_isoform)


def test_build_url_human_lncrna():
    url, gtf_url, release = Downloader().build_url("lncRNA", "human", False, "43")
    assert url == ("ftp://ftp.ebi.ac.uk/pub/databases/gencode/Gencode_human/"
                   "release_43/gencode.v43.lncRNA_transcripts.fa.gz")
    assert gtf_url is None
    assert release == "43"


def test_build_url_mouse_with_gtf():
    url, gtf_url, release = Downloader().build_url("pc", "mouse", True, "M25")
    assert "Gencode_mouse/release_M25/gencode.vM25.pc_transcripts.fa.gz" in url
    assert gtf_url.endswith("gencode.vM25.chr_patch_hapl_scaff.annotation.gtf.gz")


def test_build_url_all_biotype_has_no_prefix():
    url, _, _ = Downloader().build_url("all", "human", False, "22")
    assert url.endswith("gencode.v22.transcripts.fa.gz")


def test_build_url_validation():
    with pytest.raises(AssertionError):
        Downloader().build_url("bogus", "human", False, "43")
    with pytest.raises(AssertionError):
        Downloader().build_url("all", "dog", False, "43")
    with pytest.raises(AssertionError):
        Downloader().build_url("all", "mouse", False, "25")  # must start with M


def test_gunzip_roundtrip(tmp_path):
    payload = b">a\nACGT\n"
    gz = tmp_path / "x.fa.gz"
    with gzip.open(gz, "wb") as f:
        f.write(payload)
    Downloader().gunzip(str(gz))
    assert not gz.exists()
    assert (tmp_path / "x.fa").read_bytes() == payload


def test_gunzip_suffix_not_charstrip(tmp_path):
    # deliberate fix of the reference's str.strip(".gz") quirk (PARITY.md):
    # a name starting/ending in g/z characters must survive intact
    payload = b">z\nGGGG\n"
    gz = tmp_path / "zebra.fa.gz"
    with gzip.open(gz, "wb") as f:
        f.write(payload)
    Downloader().gunzip(str(gz))
    # reference would have produced "ebra.fa"
    assert (tmp_path / "zebra.fa").read_bytes() == payload
    assert not (tmp_path / "ebra.fa").exists()


def test_get_gencode_path_asserts():
    with pytest.raises(AssertionError):
        Downloader().get_gencode("all", release="43", fasta_path="x.fa")


GTF_ATTRS_CANONICAL = ('gene_id "G1"; transcript_id "T1.1"; '
                       'transcript_name "Gm-201"; tag "Ensembl_canonical";')
GTF_ATTRS_PLAIN = ('gene_id "G2"; transcript_id "T2.1"; '
                   'transcript_name "Xy-202"; tag "basic";')


def test_gtf_attribute_parsers():
    assert get_transcript_id_with_ensembl_canonical(GTF_ATTRS_CANONICAL) == "T1.1"
    assert get_transcript_id_with_ensembl_canonical(GTF_ATTRS_PLAIN) == ""
    assert get_transcript_id_with_isoform(GTF_ATTRS_CANONICAL, "201") == "T1.1"
    assert get_transcript_id_with_isoform(GTF_ATTRS_CANONICAL, "202") == ""
    # regex isoform
    assert get_transcript_id_with_isoform(GTF_ATTRS_PLAIN, "[0-9]02") == "T2.1"


@pytest.fixture
def gencode_fixture(tmp_path):
    fa = tmp_path / "in.fa"
    fa.write_text(
        ">T1.1|G1|x|x|x|8|\nAAAATTTT\n"
        ">T2.1|G2|x|x|x|4|\nGGCC\n"
        ">T3.1|G3|x|x|x|8|\nAAAATTTT\n"
        ">T4.1|G4|x|x|x|6|\nCCCGGG\n")
    gtf = tmp_path / "in.gtf"
    gtf.write_text(
        "# comment\n"
        f"chr1\tsrc\ttranscript\t1\t8\t.\t+\t.\t{GTF_ATTRS_CANONICAL}\n"
        "chr1\tsrc\texon\t1\t8\t.\t+\t.\t"
        'transcript_id "T9.9"; tag "Ensembl_canonical";\n'
        "chr1\tsrc\ttranscript\t1\t4\t.\t+\t.\t"
        'transcript_id "T2.1"; transcript_name "Xy-202"; tag "basic";\n'
        "chr1\tsrc\ttranscript\t1\t6\t.\t+\t.\t"
        'transcript_id "T4.1"; transcript_name "Zz-201"; '
        'tag "Ensembl_canonical";\n')
    return str(fa), str(gtf), tmp_path


def test_filter_by_length(gencode_fixture, monkeypatch):
    fa, gtf, tmp = gencode_fixture
    monkeypatch.chdir(tmp)
    headers, seqs = filter_gencode(fa, len_threshold=6, outputname="len")
    assert headers == ["T1.1|G1|x|x|x|8|", "T3.1|G3|x|x|x|8|",
                       "T4.1|G4|x|x|x|6|"]
    assert (tmp / "len.fa").read_text().startswith(">T1.1|G1")


def test_filter_canonical(gencode_fixture, monkeypatch):
    fa, gtf, tmp = gencode_fixture
    monkeypatch.chdir(tmp)
    headers, seqs = filter_gencode(fa, gtf_path=gtf, canonical=True,
                                   outputname="canon")
    # T1.1 and T4.1 carry Ensembl_canonical on 'transcript' lines; the exon
    # line for T9.9 must be ignored
    assert headers == ["T1.1|G1|x|x|x|8|", "T4.1|G4|x|x|x|6|"]


def test_filter_isoform_regex(gencode_fixture, monkeypatch):
    fa, gtf, tmp = gencode_fixture
    monkeypatch.chdir(tmp)
    headers, _ = filter_gencode(fa, gtf_path=gtf, isoform="20[12]",
                                outputname="iso")
    assert headers == ["T1.1|G1|x|x|x|8|", "T2.1|G2|x|x|x|4|",
                       "T4.1|G4|x|x|x|6|"]


def test_filter_rm_dup_keeps_first(gencode_fixture, monkeypatch):
    fa, gtf, tmp = gencode_fixture
    monkeypatch.chdir(tmp)
    headers, seqs = filter_gencode(fa, rm_dup=True, outputname="dedup")
    assert headers == ["T1.1|G1|x|x|x|8|", "T2.1|G2|x|x|x|4|",
                       "T4.1|G4|x|x|x|6|"]  # T3 dup of T1 dropped
    assert len(set(seqs)) == len(seqs)


def test_filter_canonical_without_gtf_returns_none(gencode_fixture,
                                                   monkeypatch, capsys):
    fa, _, tmp = gencode_fixture
    monkeypatch.chdir(tmp)
    assert filter_gencode(fa, canonical=True) is None
    assert "provide a gtf file path" in capsys.readouterr().out


def test_filter_canonical_plus_isoform_alignment(tmp_path, monkeypatch):
    """Combined canonical+isoform filtering keeps the right transcripts.

    The reference masks the per-GTF-line list with the per-fasta-record
    presence mask (seekr/filter_gencode.py:171), which misaligns the two
    whenever the GTF has lines for transcripts absent from the fasta —
    here T2 — and silently filters the wrong set (PARITY.md deviation).
    """
    monkeypatch.chdir(tmp_path)
    fa = tmp_path / "in.fa"
    # fasta has T1 and T3 only (GTF also knows T2)
    fa.write_text(">T1|G1|x|x|x|x|8|\nAAAATTTT\n"
                  ">T3|G3|x|x|x|x|8|\nGGGGCCCC\n")
    gtf = tmp_path / "in.gtf"

    def line(tid, name, canonical):
        tag = 'tag "Ensembl_canonical";' if canonical else 'tag "basic";'
        return (f"chr1\tsrc\ttranscript\t1\t8\t.\t+\t.\t"
                f'gene_id "G"; transcript_id "{tid}"; '
                f'transcript_name "{name}"; {tag}\n')

    # T1: canonical, isoform 201; T2: canonical, isoform 202 (not in fasta);
    # T3: canonical, isoform 202
    gtf.write_text(line("T1", "A-201", True) + line("T2", "B-202", True)
                   + line("T3", "C-202", True))
    headers, seqs = filter_gencode(str(fa), str(gtf), canonical=True,
                                   isoform="202", outputname="out")
    assert headers == ["T3|G3|x|x|x|x|8|"]
    assert seqs == ["GGGGCCCC"]


def test_filter_dedup_only_plain_headers(tmp_path, monkeypatch):
    # non-GENCODE headers must work when no length filtering is requested
    # (the reference parses the length field eagerly and crashes)
    monkeypatch.chdir(tmp_path)
    fa = tmp_path / "plain.fa"
    fa.write_text(">seq1\nAAAA\n>seq2\nAAAA\n>seq3\nTTTT\n")
    headers, seqs = filter_gencode(str(fa), rm_dup=True, outputname="out")
    assert headers == ["seq1", "seq3"]
    assert seqs == ["AAAA", "TTTT"]


def test_canonical_gencode(tmp_path, capsys):
    from seekr_tpu.data.canonical import canonical_gencode

    fa = tmp_path / "old.fa"
    fa.write_text(
        ">ENST1.1|ENSG1.1|OTTG|OTTT|XIST-001|XIST|100|lncRNA|\nAAAA\n"
        ">ENST2.1|ENSG1.1|OTTG|OTTT|XIST-002|XIST|90|lncRNA|\nGGGG\n"
        ">ENST3.1|ENSG2.1|OTTG|OTTT|TUG1-001|TUG1|80|lncRNA|\nTTTT\n"
        ">PLAIN-001\nCCCC\n"           # headers without '|' fields
        ">PLAIN-0001\nCCAA\n")
    out = tmp_path / "canon.fa"
    kept = canonical_gencode(str(fa), str(out), zeros=2)
    assert kept == 3
    text = out.read_text()
    assert "XIST-001" in text and "TUG1-001" in text and ">PLAIN-001\n" in text
    assert "XIST-002" not in text and "PLAIN-0001" not in text
    # record shape preserved: header line then sequence line
    lines = text.strip().splitlines()
    assert lines[0].startswith(">") and lines[1] == "AAAA"

    # zeros knob matches -0001 instead
    kept = canonical_gencode(str(fa), str(out), zeros=3)
    assert kept == 1
    assert "PLAIN-0001" in out.read_text()

    # nothing matches -> advisory message
    empty_in = tmp_path / "new.fa"
    empty_in.write_text(">ENST9.1|ENSG9.1|O|O|GENE-201|GENE|10|lncRNA|\nAA\n")
    assert canonical_gencode(str(empty_in), str(out), zeros=2) == 0
    assert "no longer use -001 numbering" in capsys.readouterr().out


def test_cli_canonical_gencode(tmp_path, monkeypatch, capsys):
    import pytest

    from seekr_tpu import cli

    monkeypatch.chdir(tmp_path)
    with open("in.fa", "w") as fh:
        fh.write(">A-001\nAAAA\n>B-002\nGGGG\n")
    cli.console_canonical_gencode(["in.fa", "out.fa", "-z", "2"])
    assert ">A-001" in pathlib.Path("out.fa").read_text()
    with pytest.raises(SystemExit):
        cli.console_canonical_gencode([])
    assert "seekr_canonical_gencode" in capsys.readouterr().out
