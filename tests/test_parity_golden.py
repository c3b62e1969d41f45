"""Golden-file parity against the reference repo's committed fixtures.

These read (never copy) the upstream fixtures mounted at /root/reference and
assert the TPU engine reproduces them at the reference's own tolerances
(rtol=1e-4, atol=1e-5, upstream tests/test_kmer_counts.py:106).
"""

import numpy as np
import pandas as pd
import pytest

from seekr_tpu import KmerCounter, pearson

RTOL, ATOL = 1e-4, 1e-5


def test_2mers_counts_default_pipeline(ref_data, example_fa):
    golden = np.load(ref_data / "example_2mers_counts.npy")
    counter = KmerCounter(example_fa, k=2, silent=True)
    counter.get_counts()
    assert np.allclose(counter.counts, golden, rtol=RTOL, atol=ATOL)


def test_3mers_raw_csv(ref_data, example_fa, tmp_path):
    out = str(tmp_path / "3mers.csv")
    counter = KmerCounter(example_fa, outfile=out, k=3, binary=False,
                          mean=False, std=False, log2="Log2.none", silent=True)
    counter.make_count_file()
    got = pd.read_csv(out, header=None).values
    golden = pd.read_csv(ref_data / "example_3mers_raw.csv", header=None).values
    assert got.shape == golden.shape
    assert np.allclose(got, golden, rtol=RTOL, atol=ATOL)


def test_norm_vectors(ref_data, example_fa):
    counter = KmerCounter(example_fa, k=2, log2="Log2.none", silent=True)
    counter.get_counts()
    assert np.allclose(counter.mean, np.load(ref_data / "example_mean.npy"), rtol=RTOL, atol=ATOL)
    assert np.allclose(counter.std, np.load(ref_data / "example_std.npy"), rtol=RTOL, atol=ATOL)


def test_counts_with_precomputed_vectors(ref_data, example_fa):
    golden = np.load(ref_data / "example_2mers_count.npy")
    counter = KmerCounter(
        example_fa, k=2,
        mean=str(ref_data / "example_mean.npy"),
        std=str(ref_data / "example_std.npy"),
        log2="Log2.post", silent=True,
    )
    counter.get_counts()
    assert np.allclose(counter.counts, golden, rtol=RTOL, atol=ATOL)


def test_labeled_csv_matches_reference_golden(ref_data, example_fa, tmp_path):
    out = str(tmp_path / "2mers.csv")
    counter = KmerCounter(example_fa, outfile=out, k=2, binary=False, label=True, silent=True)
    counter.make_count_file()
    got = pd.read_csv(out, index_col=0)
    golden = pd.read_csv(ref_data / "example_2mers.csv", index_col=0)
    assert list(got.columns) == list(golden.columns)
    assert list(got.index) == list(golden.index)
    assert np.allclose(got.values, golden.values, rtol=RTOL, atol=ATOL)


def test_pearson_on_golden_counts(ref_data):
    counts = np.load(ref_data / "example_2mers_counts.npy")
    got = pearson(counts, counts)
    # independent oracle: numpy corrcoef on float64
    expected = np.corrcoef(counts.astype(np.float64))
    assert np.allclose(got, expected, rtol=1e-4, atol=1e-5)
