"""Fast labeled-CSV emission for float32 matrices.

The labeled counts CSV is the dominant cost of a GENCODE-scale CLI run
(pandas: ~43 s for 13k x 4096 / 527 MB, vs 35 ms of TPU compute for the
whole pipeline).  ``write_labeled_csv`` produces bytes identical to
``pd.DataFrame(matrix, index, columns).to_csv(path)`` through the
multithreaded C++ formatter (seekr_tpu/native/src/csvio.cpp, ~20x faster)
and falls back to pandas when the native library or float32 dtype is
unavailable.  ``write_raw_csv`` is the ``np.savetxt(fmt='%1.6f')``
equivalent (reference kmer_counts.py:241).
"""

from __future__ import annotations

import csv
import io

import numpy as np


def _quote(cell) -> str:
    """csv-module minimal quoting — identical to what pandas emits."""
    buf = io.StringIO()
    csv.writer(buf, lineterminator="").writerow([str(cell)])
    return buf.getvalue()


def _native_ok(matrix) -> bool:
    if np.asarray(matrix).dtype != np.float32:
        return False
    try:
        from seekr_tpu import native
    except ImportError:
        return False
    return native.native_available()


def write_labeled_csv(path, matrix, index, columns) -> None:
    """Byte-identical to ``pd.DataFrame(matrix, index, columns).to_csv``."""
    matrix = np.asarray(matrix)
    index, columns = list(index), list(columns)
    if matrix.shape != (len(index), len(columns)):
        # same failure the pandas path raises — the native writer must not
        # silently emit a structurally corrupt CSV
        raise ValueError(
            f"Shape of passed values is {matrix.shape}, indices imply "
            f"({len(index)}, {len(columns)})")
    if not _native_ok(matrix):
        import pandas as pd

        pd.DataFrame(matrix, index=index, columns=columns).to_csv(path)
        return
    from seekr_tpu import native

    header = "," + ",".join(_quote(c) for c in columns) + "\n"
    labels = [_quote(i) for i in index]
    native.write_csv_f32(path, matrix, header_line=header,
                         row_label_cells=labels, mode=0)


def _unquote(cell: str) -> str:
    """Inverse of _quote for one still-quoted CSV cell."""
    row = next(iter(csv.reader([cell])), [])
    return row[0] if row else ""


def _is_int(v: str) -> bool:
    # ASCII digits only: str.isdigit() accepts superscripts etc., which
    # int() then rejects with a ValueError pandas never raises
    body = v[1:] if v[:1] in "+-" else v
    return bool(body) and body.isascii() and body.isdigit()


def _is_float(v: str) -> bool:
    # Python float() accepts underscore-grouped literals ('1_000');
    # pandas' C parser does not — reject them so the inferred dtype
    # matches pd.read_csv(index_col=0)
    if not v or "_" in v:
        return False
    try:
        float(v)
        return True
    except ValueError:
        return False


def _infer_index(labels):
    """Per-COLUMN dtype inference, matching pd.read_csv(index_col=0):
    all-int -> ints, all-float-like (empty cells = NaN, like pandas'
    missing-value handling) -> floats, else strings with empty cells as
    NaN."""
    if labels and all(_is_int(v) for v in labels):
        return [int(v) for v in labels]
    if labels and any(v != "" for v in labels) \
            and all(v == "" or _is_float(v) for v in labels):
        return [np.nan if v == "" else float(v) for v in labels]
    return [np.nan if v == "" else v for v in labels]


def read_labeled_csv(path):
    """Drop-in for ``pd.read_csv(path, index_col=0)`` on labeled float
    matrices (the artifact format this package writes), ~6x faster via the
    multithreaded C++ parser; values come back float32 (correctly-rounded
    strtod, equivalent to pandas float_precision='round_trip').  Falls back
    to pandas when the native library is unavailable or the file does not
    parse as a pure float matrix.
    """
    import pandas as pd

    try:
        from seekr_tpu import native
    except ImportError:
        native = None
    if native is not None and native.native_available():
        try:
            data, header, raw_labels = native.read_csv_f32(path)
        except (IOError, RuntimeError):
            data = None
        if data is not None:
            try:
                head_cells = next(iter(csv.reader([header])), [""])
                cols = head_cells[1:]  # pandas keeps header cells as strings
                if len(set(cols)) != len(cols):
                    # pandas mangles duplicate headers ('a' -> 'a.1');
                    # rare (k-mer columns are unique) — defer to pandas
                    return pd.read_csv(path, index_col=0)
                index = _infer_index([_unquote(l) for l in raw_labels])
                df = pd.DataFrame(data, index=index, columns=cols)
                df.index.name = head_cells[0] or None
                return df
            except Exception:
                # malformed shapes (blank header line, header/data column
                # mismatch): the contract is fall-back-to-pandas, never a
                # raise the pandas path would not produce
                return pd.read_csv(path, index_col=0)
    return pd.read_csv(path, index_col=0)


def write_raw_csv(path, matrix) -> None:
    """Byte-identical to ``np.savetxt(path, matrix, delimiter=',',
    fmt='%1.6f')``."""
    matrix = np.asarray(matrix)
    if not _native_ok(matrix):
        np.savetxt(path, matrix, delimiter=",", fmt="%1.6f")
        return
    from seekr_tpu import native

    native.write_csv_f32(path, matrix, header_line=None,
                         row_label_cells=None, mode=1)
