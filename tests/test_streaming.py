"""Streamed matrix emission: npy/csv writers + blocked Pearson streaming."""

import pathlib

import numpy as np
import pandas as pd
import pytest

from seekr_tpu.io.stream import (StreamingCsvWriter, StreamingNpyWriter,
                                 stream_pearson)
from seekr_tpu.models.pearson import pearson


def test_streaming_npy_roundtrip(tmp_path):
    path = str(tmp_path / "out.npy")
    data = np.arange(60, dtype=np.float32).reshape(10, 6)
    with StreamingNpyWriter(path, (10, 6)) as w:
        w.append(data[:4])
        w.append(data[4:9])
        w.append(data[9:])
    np.testing.assert_array_equal(np.load(path), data)


def test_streaming_npy_wrong_rowcount_raises(tmp_path):
    w = StreamingNpyWriter(str(tmp_path / "x.npy"), (4, 3))
    w.append(np.zeros((2, 3), np.float32))
    with pytest.raises(AssertionError):
        w.close()


def test_streaming_csv_labeled_matches_pandas(tmp_path):
    path = str(tmp_path / "out.csv")
    data = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    rows = [f"r{i}" for i in range(5)]
    cols = ["a", "b", "c"]
    with StreamingCsvWriter(path, columns=cols, row_labels=rows) as w:
        w.append(data[:2])
        w.append(data[2:])
    df = pd.read_csv(path, index_col=0)
    assert list(df.index) == rows and list(df.columns) == cols
    np.testing.assert_allclose(df.values, data, atol=5e-7)


def test_streaming_csv_raw_savetxt_format(tmp_path):
    path = str(tmp_path / "raw.csv")
    data = np.array([[1.5, 2.25]], dtype=np.float32)
    with StreamingCsvWriter(path) as w:
        w.append(data)
    ref_path = str(tmp_path / "ref.csv")
    np.savetxt(ref_path, data, delimiter=",", fmt="%1.6f")
    assert (pathlib.Path(path).read_text()
            == pathlib.Path(ref_path).read_text())


def test_streaming_csv_bytes_match_pandas_to_csv(tmp_path):
    """Streamed '%s' blocks are byte-identical to the pandas to_csv
    artifact the sub-threshold CLI path writes — including NaN as an
    empty cell (the native block formatter; '%s' % nan would write
    'nan')."""
    rng = np.random.default_rng(3)
    data = (rng.normal(size=(7, 5)) * 10.0 ** rng.integers(-9, 9, size=(7, 5))
            ).astype(np.float32)
    data[2, 3] = np.nan
    data[5, 0] = np.inf
    rows = [f"r{i}" for i in range(7)]
    cols = ["a", "b,c", 'd"e', "f", "g"]
    path = str(tmp_path / "stream.csv")
    with StreamingCsvWriter(path, columns=cols, row_labels=rows,
                            fmt="%s") as w:
        w.append(data[:3])
        w.append(data[3:])
    ref = str(tmp_path / "ref.csv")
    pd.DataFrame(data, index=rows, columns=cols).to_csv(ref)
    assert (pathlib.Path(path).read_text()
            == pathlib.Path(ref).read_text())


def test_streaming_csv_fallback_nan_matches_native_bytes(tmp_path,
                                                         monkeypatch):
    """The '%s' Python fallback writes NaN as an empty cell exactly like
    the native formatter/pandas, so artifact bytes do not depend on
    whether the native toolchain is available (ADVICE r2)."""
    from seekr_tpu import native

    rng = np.random.default_rng(9)
    data = rng.normal(size=(4, 3)).astype(np.float32)
    data[1, 2] = np.nan
    data[3, 0] = np.nan
    rows = [f"r{i}" for i in range(4)]
    cols = ["a", "b", "c"]

    def write(path):
        with StreamingCsvWriter(path, columns=cols, row_labels=rows,
                                fmt="%s") as w:
            w.append(data[:2])
            w.append(data[2:])
        return pathlib.Path(path).read_text()

    native_bytes = write(str(tmp_path / "native.csv"))
    monkeypatch.setattr(native, "native_available", lambda: False)
    fallback_bytes = write(str(tmp_path / "fallback.csv"))
    assert fallback_bytes == native_bytes
    ref = str(tmp_path / "ref.csv")
    pd.DataFrame(data, index=rows, columns=cols).to_csv(ref)
    assert fallback_bytes == pathlib.Path(ref).read_text()


def test_streaming_csv_float64_fallback_roundtrips(tmp_path):
    """Non-float32 blocks take the Python fallback and still parse back."""
    data = np.array([[0.5, 1.25], [2.5, -3.75]], dtype=np.float64)
    path = str(tmp_path / "f64.csv")
    with StreamingCsvWriter(path, columns=["x", "y"], row_labels=["a", "b"],
                            fmt="%s") as w:
        w.append(data)
    got = pd.read_csv(path, index_col=0)
    np.testing.assert_allclose(got.values, data)


def test_stream_pearson_matches_dense(tmp_path):
    rng = np.random.default_rng(1)
    c1 = rng.normal(size=(37, 16)).astype(np.float32)
    c2 = rng.normal(size=(21, 16)).astype(np.float32)
    dense = pearson(c1, c2)
    path = str(tmp_path / "p.npy")
    with StreamingNpyWriter(path, (37, 21)) as w:
        stream_pearson(c1, c2, w, block_rows=10)
    np.testing.assert_allclose(np.load(path), dense, rtol=1e-5, atol=1e-6)


def test_streaming_csv_quotes_labels_like_pandas(tmp_path):
    import pandas as pd

    labels = ["plain", "with,comma", 'with"quote']
    block = np.arange(9, dtype=np.float32).reshape(3, 3)
    path = str(tmp_path / "quoted.csv")
    with StreamingCsvWriter(path, columns=labels, row_labels=labels,
                            fmt="%s") as w:
        w.append(block)
    got = pd.read_csv(path, index_col=0)
    assert list(got.index) == labels
    assert list(got.columns) == labels
    np.testing.assert_allclose(got.values, block)


def test_triu_collector_matches_collect_then_triu():
    """Tile-wise triu reduction == materialize-then-extract (VERDICT r2
    next #2 'Done' criterion), across odd block splits and dtypes."""
    from seekr_tpu.io.stream import TriuCollector
    from seekr_tpu.utils.adj import triu_values

    rng = np.random.default_rng(7)
    for m, blocks in [(1, [1]), (5, [2, 2, 1]), (17, [17]),
                      (33, [10, 10, 10, 3])]:
        sim = rng.normal(size=(m, m)).astype(np.float32)
        w = TriuCollector(m)
        row = 0
        for b in blocks:
            w.append(sim[row:row + b])
            row += b
        got = w.result()
        np.testing.assert_array_equal(got, triu_values(sim))


def test_triu_collector_guards_row_count():
    from seekr_tpu.io.stream import TriuCollector

    w = TriuCollector(4)
    w.append(np.zeros((2, 4), np.float32))
    with pytest.raises(AssertionError):
        w.result()


def test_triu_index_to_ij_roundtrip():
    from seekr_tpu.utils.adj import triu_index_to_ij

    for m in (2, 3, 7, 50):
        ti, tj = np.triu_indices(m, k=1)
        i, j = triu_index_to_ij(m, np.arange(m * (m - 1) // 2))
        np.testing.assert_array_equal(i, ti)
        np.testing.assert_array_equal(j, tj)


def test_pearson_pairs_matches_full_matrix():
    from seekr_tpu.ops.pearson import pearson_device, pearson_pairs

    rng = np.random.default_rng(9)
    counts = rng.normal(size=(64, 48)).astype(np.float32)
    full = np.asarray(pearson_device(counts, counts))
    ii = rng.integers(0, 64, size=333)
    jj = rng.integers(0, 64, size=333)
    # chunk smaller than the pair count exercises the padded tail
    got = pearson_pairs(counts, ii, jj, chunk=128)
    np.testing.assert_allclose(got, full[ii, jj], rtol=1e-5, atol=1e-5)
    assert pearson_pairs(counts, [], []).size == 0


def test_csv_writer_rejects_columns_without_row_labels(tmp_path):
    """columns= without row_labels= must fail at construction, before
    the header line is on disk (review finding: it used to crash with a
    TypeError on the first append, leaving a partial artifact)."""
    import pytest

    from seekr_tpu.io.stream import StreamingCsvWriter

    path = tmp_path / "x.csv"
    with pytest.raises(ValueError, match="row_labels"):
        StreamingCsvWriter(str(path), columns=["a", "b"])
    assert not path.exists()
