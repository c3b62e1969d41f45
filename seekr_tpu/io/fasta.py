"""FASTA ingestion.

Semantics match the reference reader (seekr/fasta_reader.py:41-63): lines are
stripped, multi-line sequences joined, sequences upper-cased, and file order
preserved.  One documented deviation: blank lines are tolerated (skipped) —
the reference's ``line[0]`` indexing raises IndexError on any empty line
(fasta_reader.py:53), which is a crash, not a behavior worth reproducing.  The reference materialises a list of alternating header/sequence
strings; we keep that public contract (``get_lines``/``get_seqs``/
``get_headers``/``get_data``) so downstream tooling behaves identically.

A native C++ parser (seekr_tpu.io.native) is used transparently for large
files when available; this module is the canonical (and fallback) behavior.
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Optional, Tuple


class Reader:
    """Read a FASTA file into headers + single-line upper-case sequences.

    Parameters
    ----------
    infasta : str (default=None)
        Path to the input fasta file.
    outfasta : str (default=None)
        Path used by :meth:`save` to write ``self.data`` back out.
    names : iterable of str (default=None)
        Names used by :meth:`supply_basic_header`.
    """

    def __init__(self, infasta: Optional[str] = None, outfasta: Optional[str] = None,
                 names: Optional[Iterable[str]] = None):
        self.infasta = infasta
        self.outfasta = outfasta
        self.names = names
        self.data: Optional[List[str]] = None

    # -- internals --------------------------------------------------------

    def _read_data(self) -> None:
        """Set ``data`` to the stripped lines of the fasta file."""
        with open(self.infasta) as infasta:
            self.data = [line.strip() for line in infasta]

    def _upper_seq_per_line(self) -> None:
        """Collapse each record's sequence onto one upper-case line.

        Mirrors reference behavior: a header line must be followed by at
        least one sequence line (headers back-to-back raise AssertionError),
        and the first line must be a header.
        """
        new_data: List[str] = []
        seq = ""
        seen_header = False
        for i, line in enumerate(self.data):
            if not line:
                # blank lines are tolerated ANYWHERE, including before the
                # first header — the native gate approves such files, so
                # the Python path must parse them identically (the
                # reference crashes with IndexError on any blank line;
                # documented deviation)
                continue
            if line[:1] == ">":
                if seq:
                    new_data.append(seq.upper())
                    seq = ""
                else:
                    # the FIRST header legitimately has no sequence yet;
                    # any later empty-sequence header is the reference's
                    # header-without-a-sequence error
                    assert not seen_header, \
                        f"There may be a header without a sequence at line {i}."
                seen_header = True
                new_data.append(line)
            else:
                seq += line
        new_data.append(seq.upper())
        self.data = new_data

    def _native_lines(self) -> Optional[List[str]]:
        """Parse via the C++ reader; None if unavailable or ambiguous input.

        Falls back to the Python path whenever the native result COULD
        diverge from the canonical reader, so behavior never depends on
        toolchain availability.  The byte-level gate (shared with
        encode_fasta: _native_parse_is_safe) rejects lone-CR line breaks,
        any non-ASCII byte, and leading sequence lines; the post-hoc
        checks below additionally reject empty sequences (the reference's
        header-without-a-sequence assertion must fire on the Python path).
        """
        try:
            from seekr_tpu import native
        except ImportError:
            return None
        if not native.native_available():
            return None
        from seekr_tpu.io.encode import _native_parse_is_safe

        # shared byte-level gate (one policy with encode_fasta): rejects
        # lone-CR line breaks, ANY non-ASCII byte (str.strip's Unicode
        # whitespace cannot be handled byte-wise, even mid-record), and
        # files whose first non-empty line is not a header
        if not _native_parse_is_safe(self.infasta):
            return None
        try:
            with native.NativeFasta(self.infasta) as nf:
                headers = nf.headers()
                seqs = nf.seqs()
        except (IOError, OSError):
            return None
        if not headers or len(headers) != len(seqs) or any(not s for s in seqs):
            return None
        if any("\r" in h or h != h.strip() for h in headers) \
                or any("\r" in s or s != s.strip() for s in seqs):
            return None
        data: List[str] = []
        for header, seq in zip(headers, seqs):
            data.append(header)
            data.append(seq)
        return data

    # -- public API --------------------------------------------------------

    def get_lines(self) -> List[str]:
        if self.data is not None:  # parse once per Reader instance
            return self.data
        lines = self._native_lines()
        if lines is not None:
            self.data = lines
            return self.data
        self._read_data()
        self._upper_seq_per_line()
        return self.data

    def get_seqs(self) -> List[str]:
        return self.get_lines()[1::2]

    def get_headers(self) -> List[str]:
        """Headers including the leading ``>``."""
        return self.get_lines()[::2]

    def get_data(self, tuples_only: bool = False):
        clean = self.get_lines()
        headers = clean[::2]
        seqs = clean[1::2]
        tuples: Iterator[Tuple[str, str]] = zip(headers, seqs)
        if tuples_only:
            return tuples
        return tuples, headers, seqs

    def supply_basic_header(self) -> List[str]:
        """Convert header lines to GENCODE-ish format with name and length."""
        new_fasta: List[str] = []
        if self.names is None:
            self.names = iter(self.get_headers())
        names = iter(self.names)
        for i, line in enumerate(self.data):
            if line[:1] == ">":
                name = next(names).strip(">")
                length = len(self.data[i + 1])
                new_fasta.append(f">||||{name}||{length}|")
            else:
                new_fasta.append(line)
        return new_fasta

    def save(self) -> None:
        """Write ``self.data`` to ``self.outfasta``, one line per entry."""
        with open(self.outfasta, "w") as outfasta:
            for line in self.data:
                outfasta.write(line + "\n")


def write_fasta(path: str, headers: Iterable[str], seqs: Iterable[str]) -> None:
    """Write (header, seq) pairs; headers given WITHOUT the leading '>'."""
    with open(path, "w") as fh:
        for header, seq in zip(headers, seqs):
            fh.write(f">{header}\n{seq}\n")
