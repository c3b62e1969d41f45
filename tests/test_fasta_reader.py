import pytest

from seekr_tpu.io.fasta import Reader, write_fasta


@pytest.fixture
def fasta_file(tmp_path):
    path = tmp_path / "toy.fa"
    path.write_text(
        ">first|meta\n"
        "acgt\n"
        "ACGT\n"
        ">second\n"
        "nnAG\n"
    )
    return str(path)


def test_multiline_join_and_upper(fasta_file):
    seqs = Reader(fasta_file).get_seqs()
    assert seqs == ["ACGTACGT", "NNAG"]


def test_headers_keep_gt(fasta_file):
    headers = Reader(fasta_file).get_headers()
    assert headers == [">first|meta", ">second"]


def test_get_data(fasta_file):
    tuples, headers, seqs = Reader(fasta_file).get_data()
    assert list(tuples) == [(">first|meta", "ACGTACGT"), (">second", "NNAG")]
    assert headers == [">first|meta", ">second"]
    assert seqs == ["ACGTACGT", "NNAG"]


def test_header_without_sequence_raises(tmp_path):
    path = tmp_path / "bad.fa"
    path.write_text(">a\n>b\nACGT\n")
    with pytest.raises(AssertionError):
        Reader(str(path)).get_seqs()


def test_roundtrip_write(tmp_path):
    path = tmp_path / "out.fa"
    write_fasta(str(path), ["h1", "h2"], ["AAAA", "GGGG"])
    assert Reader(str(path)).get_seqs() == ["AAAA", "GGGG"]
    assert Reader(str(path)).get_headers() == [">h1", ">h2"]


def test_reference_example_fixture(example_fa):
    # structural contract shared by the reference fixture and the in-repo
    # fallback (tests/fixtures): 5 toy seqs, first one 6 nt, uppercased
    seqs = Reader(example_fa).get_seqs()
    assert len(seqs) == 5
    assert len(seqs[0]) == 6
    assert all(set(s) <= set("AGTCN") for s in seqs)
    assert Reader(example_fa).get_headers() == [
        f">SEQ{i}" for i in range(1, 6)]


class TestNativeParserDivergenceGates:
    """Inputs where the C++ parser COULD diverge must take the Python path,
    so results never depend on toolchain availability (round-2 review)."""

    def test_lone_cr_is_line_break(self, tmp_path):
        # Python universal newlines: '\r' breaks the line -> seq 'ACGT'
        fa = tmp_path / "cr.fa"
        fa.write_bytes(b">h\nAC\rGT\n")
        assert Reader(str(fa)).get_seqs() == ["ACGT"]

    def test_unicode_whitespace_stripped(self, tmp_path):
        # str.strip() removes NBSP; the native byte trim would keep it
        fa = tmp_path / "nbsp.fa"
        fa.write_bytes(b">h\nACGT\xc2\xa0\n")
        assert Reader(str(fa)).get_seqs() == ["ACGT"]

    def test_leading_sequence_line_matches_reference(self, tmp_path):
        # reference reader keeps a misaligned leading sequence line; the
        # native parser would silently drop it -> must fall back
        fa = tmp_path / "leading.fa"
        fa.write_bytes(b"ACGT\n>h\nTTTT\n")
        lines = Reader(str(fa)).get_lines()
        assert lines == ["ACGT", ">h", "TTTT"]


def test_leading_blank_lines_parse_identically_both_paths(tmp_path,
                                                          monkeypatch):
    """Blank lines before the first header must parse the same with and
    without the native toolchain (review finding: the native gate
    approved such files while the Python path raised AssertionError —
    behavior depended on toolchain availability).  The reference crashes
    with IndexError on ANY blank line; tolerating them is the package's
    documented deviation and must hold on both paths."""
    from seekr_tpu.io.fasta import Reader

    fa = tmp_path / "lead.fa"
    fa.write_text("\n\n>h1\nacgt\n\n>h2\nTTTT\n")

    native_seqs = Reader(str(fa)).get_seqs()

    import seekr_tpu.native as native_mod
    monkeypatch.setattr(native_mod, "native_available", lambda: False)
    python_seqs = Reader(str(fa)).get_seqs()

    assert native_seqs == python_seqs == ["ACGT", "TTTT"]
