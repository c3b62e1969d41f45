"""Streamed matrix emission: npy/csv writers + blocked Pearson streaming."""

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
    assert open(path).read() == open(ref_path).read()


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
