"""Native CSV writer: byte parity with pandas to_csv / np.savetxt."""

import numpy as np
import pandas as pd
import pytest

from seekr_tpu.io.fast_csv import write_labeled_csv, write_raw_csv

SPECIAL = np.array([0.0, -0.0, 1.0, -1.0, 0.1, 1e-4, 1.5e-4, 1e-5, 1e15,
                    1e16, 123456.789, np.nan, np.inf, -np.inf, 3.4e38,
                    1.2e-38, 5e-42, -454.5454545, 2.0, 1024.0],
                   dtype=np.float32)


def matrices():
    rng = np.random.default_rng(0)
    return {
        "special": np.tile(SPECIAL, (5, 1)),
        "random": rng.uniform(-1e3, 1e3, (60, 40)).astype(np.float32),
        "tiny": (rng.uniform(-1, 1, (30, 20)) * 1e-5).astype(np.float32),
        "huge": (rng.uniform(-1, 1, (30, 20)) * 1e17).astype(np.float32),
    }


@pytest.mark.parametrize("name", ["special", "random", "tiny", "huge"])
def test_labeled_byte_parity_with_pandas(name, tmp_path):
    m = matrices()[name]
    # labels include csv-quoting cases (comma, double quote)
    idx = [f">s{i},x\"q" if i % 7 == 0 else f">s{i}"
           for i in range(m.shape[0])]
    cols = [f"K{j}" for j in range(m.shape[1])]
    a, b = tmp_path / "a.csv", tmp_path / "b.csv"
    write_labeled_csv(str(a), m, idx, cols)
    pd.DataFrame(m, index=idx, columns=cols).to_csv(str(b))
    assert a.read_bytes() == b.read_bytes()


@pytest.mark.parametrize("name", ["special", "random"])
def test_raw_byte_parity_with_savetxt(name, tmp_path):
    m = matrices()[name]
    a, b = tmp_path / "a.csv", tmp_path / "b.csv"
    write_raw_csv(str(a), m)
    np.savetxt(str(b), m, delimiter=",", fmt="%1.6f")
    assert a.read_bytes() == b.read_bytes()


def test_float64_falls_back_to_pandas(tmp_path):
    m = np.array([[0.1, 0.2], [0.3, 0.4]])  # float64
    a = tmp_path / "a.csv"
    write_labeled_csv(str(a), m, ["r0", "r1"], ["c0", "c1"])
    got = pd.read_csv(str(a), index_col=0)
    np.testing.assert_allclose(got.values, m)


def test_range_index_matches_pandas(tmp_path):
    m = np.arange(6, dtype=np.float32).reshape(2, 3)
    a, b = tmp_path / "a.csv", tmp_path / "b.csv"
    write_labeled_csv(str(a), m, range(2), range(3))
    pd.DataFrame(m).to_csv(str(b))
    assert a.read_bytes() == b.read_bytes()


def test_read_labeled_csv_roundtrip_exact():
    import tempfile, os

    from seekr_tpu.io.fast_csv import read_labeled_csv

    rng = np.random.default_rng(1)
    m = np.concatenate([np.tile(SPECIAL, (3, 1)),
                        rng.normal(0, 50, (40, 20)).astype(np.float32)])
    idx = [f">s{i},c\"q" if i % 5 == 0 else f">s{i}" for i in range(m.shape[0])]
    cols = [f"K{j}" for j in range(m.shape[1])]
    d = tempfile.mkdtemp()
    p = os.path.join(d, "x.csv")
    write_labeled_csv(p, m, idx, cols)
    df = read_labeled_csv(p)
    ref = pd.read_csv(p, index_col=0)
    assert list(df.index) == list(ref.index) == idx
    assert list(df.columns) == list(ref.columns) == cols
    # float32 shortest-repr roundtrip is EXACT through the native parser
    np.testing.assert_array_equal(df.values, m)


def test_read_labeled_csv_range_index_matches_pandas(tmp_path):
    from seekr_tpu.io.fast_csv import read_labeled_csv

    m = np.arange(15, dtype=np.float32).reshape(5, 3)
    p = tmp_path / "r.csv"
    pd.DataFrame(m).to_csv(str(p))
    a = read_labeled_csv(str(p))
    b = pd.read_csv(str(p), index_col=0)
    assert list(a.index) == list(b.index)
    assert list(a.columns) == list(b.columns)
    np.testing.assert_allclose(a.values, b.values)


def test_read_labeled_csv_falls_back_on_nonfloat(tmp_path):
    from seekr_tpu.io.fast_csv import read_labeled_csv

    p = tmp_path / "mixed.csv"
    p.write_text(",a,b\nr0,1.5,hello\nr1,2.5,world\n")
    df = read_labeled_csv(str(p))  # must not crash: pandas fallback
    assert list(df.columns) == ["a", "b"]
    assert df["b"].tolist() == ["hello", "world"]


def test_read_index_inference_matches_pandas(tmp_path):
    from seekr_tpu.io.fast_csv import read_labeled_csv

    cases = [
        ["12345", "geneA", "7"],        # mixed -> strings
        ["1.5", "2.5", "3.5"],          # float-like -> floats
        ["3", "1", "2"],                # ints
        ["", "r1", "r2"],               # empty cell -> NaN
    ]
    for i, labels in enumerate(cases):
        p = tmp_path / f"c{i}.csv"
        body = ",a,b\n" + "".join(f"{l},1.5,2.5\n" for l in labels)
        p.write_text(body)
        a = read_labeled_csv(str(p))
        b = pd.read_csv(str(p), index_col=0)
        assert [x if x == x else "NA" for x in a.index] \
            == [x if x == x else "NA" for x in b.index], labels


def test_read_duplicate_columns_defers_to_pandas(tmp_path):
    from seekr_tpu.io.fast_csv import read_labeled_csv

    p = tmp_path / "dup.csv"
    p.write_text(",a,a\nr0,1.5,2.5\n")
    a = read_labeled_csv(str(p))
    b = pd.read_csv(str(p), index_col=0)
    assert list(a.columns) == list(b.columns)  # pandas-mangled 'a','a.1'


def test_write_shape_mismatch_raises(tmp_path):
    m = np.zeros((3, 2), np.float32)
    with pytest.raises(ValueError, match="Shape of passed values"):
        write_labeled_csv(str(tmp_path / "x.csv"), m, ["a", "b", "c"],
                          ["only_one"])


def test_read_fifo_falls_back(tmp_path):
    # named pipes have no seekable size; must not abort the process
    import os
    import threading

    from seekr_tpu.io.fast_csv import read_labeled_csv

    fifo = str(tmp_path / "pipe.csv")
    os.mkfifo(fifo)

    def feed():
        with open(fifo, "w") as f:
            f.write(",a,b\nr0,1.5,2.5\n")

    t = threading.Thread(target=feed)
    t.start()
    df = read_labeled_csv(fifo)
    t.join()
    assert list(df.columns) == ["a", "b"]


def test_formatter_fuzz_random_bit_patterns(tmp_path):
    """Byte parity with pandas across random float32 BIT PATTERNS (hits
    subnormals, huge/tiny magnitudes, and the fixed/scientific thresholds
    far more densely than value-space sampling)."""
    rng = np.random.default_rng(2026)
    bits = rng.integers(0, 2 ** 32, size=20_000, dtype=np.uint64)
    vals = bits.astype(np.uint32).view(np.float32)
    m = vals.reshape(200, 100)
    idx = [f"r{i}" for i in range(200)]
    cols = [f"c{j}" for j in range(100)]
    a, b = tmp_path / "a.csv", tmp_path / "b.csv"
    write_labeled_csv(str(a), m, idx, cols)
    pd.DataFrame(m, index=idx, columns=cols).to_csv(str(b))
    assert a.read_bytes() == b.read_bytes()


def test_native_f64_formatter_matches_pandas_bytes(tmp_path):
    """seekr_write_csv_f64: Python-repr bytes == DataFrame(f64).to_csv
    for random values and every formatting edge (threshold crossings,
    signed zero, inf, NaN-as-empty, denormals, huge, integral)."""
    import io

    import numpy as np
    import pandas as pd
    import pytest

    from seekr_tpu import native
    from seekr_tpu.io.fast_csv import _quote

    if not native.native_available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(0)
    edges = [1e15, 1e16, 9.999e15, 1234567890123456.0, 1e-4, 9.9e-5,
             1e-5, 0.0, -0.0, np.inf, -np.inf, np.nan, 1.0, 0.1, 1 / 3,
             5e-324, 1.7976931348623157e308, -2.5, 123.0, 1e100, -1e-100]
    rows = [edges[i:i + 7] + [0.0] * max(0, 7 - len(edges[i:i + 7]))
            for i in range(0, len(edges), 7)]
    mats = [
        np.array(rows, dtype=np.float64),
        rng.uniform(0, 1, (13, 9)),
        rng.normal(0, 1e6, (5, 5)) * 10.0 ** rng.integers(-20, 20, (5, 5)),
    ]
    for i, mat in enumerate(mats):
        labels = [f"r{j}" for j in range(mat.shape[0])]
        cols = [f"c{j}" for j in range(mat.shape[1])]
        df = pd.DataFrame(mat, index=labels, columns=cols)
        buf = io.StringIO()
        df.to_csv(buf)
        path = tmp_path / f"m{i}.csv"
        with open(path, "w") as fh:
            fh.write("," + ",".join(_quote(c) for c in cols) + "\n")
        native.write_csv_f64(str(path), mat,
                             row_label_cells=[_quote(l) for l in labels],
                             append=True)
        assert path.read_text() == buf.getvalue(), f"matrix {i}"


def test_index_inference_edge_cases_match_pandas(tmp_path):
    """Label-column dtype inference must match pd.read_csv(index_col=0)
    on the adversarial cases (review findings): non-ASCII digits,
    underscore-grouped numerics, and empty-mixed numeric labels."""
    import numpy as np
    import pandas as pd

    from seekr_tpu.io.fast_csv import read_labeled_csv

    cases = [
        ["²", "a"],     # superscript two: isdigit() but not int()
        ["1_000", "2"],      # Python float() accepts it, pandas does not
        ["1", ""],           # pandas: float64 [1.0, nan]
        ["-3", "4"],         # signed ints stay an int index
    ]
    for i, labels in enumerate(cases):
        path = tmp_path / f"c{i}.csv"
        pd.DataFrame([[1.5, 2.5], [3.5, 4.5]], index=labels,
                     columns=["x", "y"]).to_csv(path)
        want = pd.read_csv(path, index_col=0)
        got = read_labeled_csv(str(path))
        assert got.index.dtype == want.index.dtype, labels
        assert [(x if x == x else None) for x in got.index] == \
            [(x if x == x else None) for x in want.index], labels


def test_malformed_header_falls_back_to_pandas(tmp_path):
    """A header/data shape the fast path cannot assemble must defer to
    pandas, not raise (the documented contract)."""
    import pandas as pd

    from seekr_tpu.io.fast_csv import read_labeled_csv

    path = tmp_path / "m.csv"
    # header row with FEWER cells than the data rows
    path.write_text(",x\na,1.0,2.0\nb,3.0,4.0\n")
    want = pd.read_csv(path, index_col=0)
    got = read_labeled_csv(str(path))
    assert list(got.columns) == list(want.columns)
    assert got.shape == want.shape
