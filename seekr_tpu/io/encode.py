"""Tokenize nucleotide strings into dense device-ready arrays.

The reference counts k-mers with a per-character Python loop
(seekr/kmer_counts.py:140-151).  The TPU-native design instead encodes each
base to a 2-bit digit once on the host and ships padded ``[rows, L]`` int8
arrays to the device, where k-mer window codes are formed by shifts and the
histogram is accumulated on the MXU (see seekr_tpu.ops.count).

Column-order contract: the reference enumerates k-mers as
``itertools.product("AGTC", repeat=k)`` (seekr/kmer_counts.py:100,121-122),
i.e. base-4 digits with A=0, G=1, T=2, C=3 and the FIRST character most
significant.  The encoder uses exactly that digit assignment so device
histogram bins line up with reference CSV columns with no permutation.

Bases outside the alphabet (N, IUPAC codes, ...) get the sentinel INVALID;
any window containing one is skipped while the per-kb denominator still uses
the full ``len(seq) - k + 1`` window count (reference kmer_counts.py:144-150).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

ALPHABET_AGTC = "AGTC"
INVALID = 4  # any value >= 4 marks a non-alphabet base; also used for padding

_LUT_CACHE = {}


def base_lut(alphabet: str = ALPHABET_AGTC) -> np.ndarray:
    """256-entry byte -> digit lookup table (INVALID for other bytes).

    Lowercase bytes are INVALID, matching the reference: its k-mer map
    holds uppercase keys only (kmer_counts.py:121-122), so a lowercase
    window is skipped while the denominator keeps it.  File input never
    hits this (the readers upper-case), but manually-assigned ``.seqs``
    with soft-masked (lowercase) bases must count identically to the
    reference.
    """
    lut = _LUT_CACHE.get(alphabet)
    if lut is None:
        lut = np.full(256, INVALID, dtype=np.int8)
        for digit, ch in enumerate(alphabet):
            lut[ord(ch)] = digit
        _LUT_CACHE[alphabet] = lut
    return lut


def encode_seq(seq: str, alphabet: str = ALPHABET_AGTC) -> np.ndarray:
    """Encode one sequence to int8 digits (INVALID where not in alphabet)."""
    raw = np.frombuffer(seq.encode("ascii", errors="replace"), dtype=np.uint8)
    return base_lut(alphabet)[raw]


def kmer_strings(k: int, alphabet: str = ALPHABET_AGTC) -> List[str]:
    """All k-mers in reference column order (product order, first char MSB)."""
    return ["".join(t) for t in itertools.product(alphabet, repeat=k)]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_bucket_length(length: int, k: int, min_len: int = 256) -> int:
    """Padded length for a sequence: next power of two >= max(length, min).

    Power-of-two buckets bound the number of distinct compiled shapes to
    O(log(max_len)) while wasting < 2x padding in the worst case.
    """
    need = max(length, k, min_len)
    padded = min_len
    while padded < need:
        padded *= 2
    return padded


@dataclass
class EncodedSeqs:
    """A set of sequences encoded and grouped into padded length buckets.

    Attributes
    ----------
    buckets : list of (bases, lengths, row_ids)
        ``bases`` is ``[rows, Lpad]`` int8 (digits 0..A-1; INVALID elsewhere,
        padding included), ``lengths`` is ``[rows]`` int32 true sequence
        lengths, ``row_ids`` maps bucket rows back to original fasta order.
    n_seqs : int
    alphabet : str
    """

    buckets: List[Tuple[np.ndarray, np.ndarray, np.ndarray]]
    n_seqs: int
    alphabet: str
    lengths: np.ndarray  # [n_seqs] original order

    @property
    def total_bases(self) -> int:
        return int(self.lengths.sum())


def _assemble_buckets(lengths, k, min_bucket_len, row_multiple,
                      max_rows_per_bucket, encode_chunk, include=None):
    """Shared bucket assembly: group by padded length, pad rows to a power
    of two (>= ``row_multiple``), delegate the row content to
    ``encode_chunk(ids, lpad) -> [len(ids), lpad] int8``.

    ``include`` restricts assembly to those row ids (bucket row_ids stay
    in the original id space).  Keeping one copy of this policy guarantees
    the Python and native encoders produce identically-shaped buckets.
    """
    lengths = np.asarray(lengths)
    by_bucket = {}
    for i in (range(len(lengths)) if include is None else include):
        lpad = pick_bucket_length(int(lengths[i]), k, min_bucket_len)
        by_bucket.setdefault(lpad, []).append(int(i))

    buckets = []
    for lpad in sorted(by_bucket):
        ids = by_bucket[lpad]
        step = max_rows_per_bucket or len(ids)
        for j in range(0, len(ids), step):
            chunk = ids[j:j + step]
            rows = row_multiple
            while rows < len(chunk):
                rows *= 2
            bases = np.full((rows, lpad), INVALID, dtype=np.int8)
            bases[: len(chunk)] = encode_chunk(chunk, lpad)
            blens = np.zeros(rows, dtype=np.int32)
            blens[: len(chunk)] = lengths[chunk]
            buckets.append((bases, blens, np.asarray(chunk, dtype=np.int64)))
    return buckets


def encode_seqs(
    seqs: Sequence[str],
    k: int,
    alphabet: str = ALPHABET_AGTC,
    min_bucket_len: int = 256,
    row_multiple: int = 8,
    max_rows_per_bucket: Optional[int] = None,
) -> EncodedSeqs:
    """Encode + bucket sequences for device counting.

    Rows in each bucket are padded with zero-length dummy rows up to the next
    power of two (>= ``row_multiple``) so the number of distinct compiled
    (rows, length) shapes stays O(log(m) * log(max_len)); dummy rows have
    length 0 and produce all-zero count rows which are dropped on gather.
    """
    lut = base_lut(alphabet)
    lengths = np.fromiter((len(s) for s in seqs), dtype=np.int32, count=len(seqs))

    buckets = _assemble_buckets(lengths, k, min_bucket_len, row_multiple,
                                max_rows_per_bucket,
                                _py_encode_chunk(seqs, lut))
    return EncodedSeqs(buckets=buckets, n_seqs=len(seqs), alphabet=alphabet, lengths=lengths)


def _py_encode_chunk(seqs, lut):
    """Row-chunk encoder closure shared by the pure-Python bucket paths
    (encode_seqs and encode_fasta's fallback)."""
    def encode_chunk(ids, lpad):
        out = np.full((len(ids), lpad), INVALID, dtype=np.int8)
        for r, i in enumerate(ids):
            raw = np.frombuffer(seqs[i].encode("ascii", errors="replace"),
                                dtype=np.uint8)
            out[r, : raw.size] = lut[raw]
        return out
    return encode_chunk


_GATE_CACHE: dict = {}  # (abspath, size, mtime_ns) -> verdict


def _native_parse_is_safe(path: str) -> bool:
    """Cheap byte-level gate: may the C++ parser's output differ from the
    canonical Python reader's?

    The verdict is memoized per (path, size, mtime_ns): the counter flow
    runs the gate twice per file (Reader at construction, encode_fasta at
    count time), and at GENCODE scale each scan is a multi-GB read — the
    stat key invalidates on any file change, the same drift discipline as
    counter._encode_from_file.

    Falls back (returns False) on any '\\r' (Python universal newlines
    treat lone CR as a line break; native splits on '\\n' only), any
    non-ASCII byte (str.strip() removes Unicode whitespace the native
    byte trim keeps), or a first non-empty line that is not a header
    (native drops leading sequence lines, the reference misaligns them).
    One sequential pass over the raw bytes; GENCODE files are pure-ASCII
    LF so the fast path stays native.
    """
    import os as _os

    try:
        st = _os.stat(path)
        cache_key = (_os.path.abspath(path), st.st_size, st.st_mtime_ns)
    except OSError:
        return False
    cached = _GATE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    verdict = _gate_scan(path)
    if len(_GATE_CACHE) > 64:
        _GATE_CACHE.clear()
    _GATE_CACHE[cache_key] = verdict
    return verdict


def _gate_scan(path: str) -> bool:
    first_line_ok = None
    carry = b""
    try:
        with open(path, "rb") as fh:
            while True:  # chunked scan: no whole-file slurp (3x RSS before)
                chunk = fh.read(8 << 20)
                if not chunk:
                    break
                if b"\r" in chunk or not chunk.isascii():
                    return False
                if first_line_ok is None:
                    buf = carry + chunk
                    i, n = 0, len(buf)
                    while i < n:
                        j = buf.find(b"\n", i)
                        if j == -1:
                            carry = buf[i:]
                            break
                        line = buf[i:j].strip()
                        if line:
                            first_line_ok = line.startswith(b">")
                            if not first_line_ok:
                                return False
                            break
                        i = j + 1
    except OSError:
        return False
    if first_line_ok is None:  # no newline seen: judge the remainder
        first_line_ok = carry.strip().startswith(b">")
    return bool(first_line_ok)


def encode_fasta(
    path: str,
    k: int,
    alphabet: str = ALPHABET_AGTC,
    min_bucket_len: int = 256,
    row_multiple: int = 8,
    max_rows_per_bucket: Optional[int] = None,
    include_ids: Optional[Sequence[int]] = None,
) -> EncodedSeqs:
    """Encode a FASTA file directly, using the C++ parser/encoder if present.

    The native path parses once and encodes each padded bucket with a
    multithreaded batch encoder — no Python string per sequence.  Non-AGTC
    alphabets and missing-toolchain environments fall back to the pure
    Python path (byte-identical output).  ``include_ids`` restricts the
    encoded buckets to those records (row_ids stay file-order indices;
    ``lengths``/``n_seqs`` still describe the whole file) — used by the
    counter to keep short sequences on the native batch path while very
    long ones take the chunked route.
    """
    if alphabet == ALPHABET_AGTC:
        try:
            from seekr_tpu import native
        except ImportError:
            native = None
        if native is not None and native.native_available() \
                and _native_parse_is_safe(path):
            with native.NativeFasta(path) as nf:
                lengths = nf.lengths().astype(np.int32)
                # a parse with no records or an empty sequence means the
                # C++ parser disagrees with Python line semantics ->
                # fall through to the Python path instead of silently
                # emitting wrong buckets
                if len(lengths) > 0 and (lengths > 0).all():
                    buckets = _assemble_buckets(
                        lengths, k, min_bucket_len, row_multiple,
                        max_rows_per_bucket, nf.encode_batch,
                        include=include_ids)
                    return EncodedSeqs(buckets=buckets, n_seqs=len(lengths),
                                       alphabet=alphabet, lengths=lengths)

    from seekr_tpu.io.fasta import Reader

    seqs = Reader(path).get_seqs()
    if include_ids is None:
        return encode_seqs(seqs, k, alphabet,
                           min_bucket_len=min_bucket_len,
                           row_multiple=row_multiple,
                           max_rows_per_bucket=max_rows_per_bucket)
    lengths = np.array([len(s) for s in seqs], dtype=np.int64)
    lut = base_lut(alphabet)

    buckets = _assemble_buckets(lengths, k, min_bucket_len, row_multiple,
                                max_rows_per_bucket,
                                _py_encode_chunk(seqs, lut),
                                include=include_ids)
    return EncodedSeqs(buckets=buckets, n_seqs=len(seqs), alphabet=alphabet,
                       lengths=lengths)
