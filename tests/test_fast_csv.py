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
