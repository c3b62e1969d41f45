"""Bounded-memory adj_pval (stats/stream_adj.py) vs the in-memory path.

The contract is BITWISE equality with stats.adj_pval for every supported
method — same corrected float64 values, same NaN fills, same CSV bytes.
"""

import numpy as np
import pandas as pd
import pytest

from seekr_tpu.stats.adj_pval import adj_pval
from seekr_tpu.stats.stream_adj import adj_pval_stream

METHODS = ["bonferroni", "sidak", "holm", "holm-sidak", "simes-hochberg",
           "fdr_bh", "fdr_by", "fdr_tsbh", "fdr_tsbky"]


def _sym_pvals(rng, m, dtype=np.float32):
    v = rng.uniform(0, 1, (m, m)).astype(dtype)
    v = np.triu(v, 1)
    v = v + v.T
    np.fill_diagonal(v, 1.0)
    return v.astype(dtype)


def _assert_stream_matches(tmp_path, arr, method, alpha=0.05, name=""):
    df = pd.DataFrame(arr)
    want = adj_pval(df, method, alpha)
    in_csv = tmp_path / f"mem{name}.csv"
    want.to_csv(in_csv)

    src = tmp_path / f"p{name}.npy"
    np.save(src, arr)
    out_npy = tmp_path / f"adj{name}.npy"
    got = adj_pval_stream(str(src), method, alpha,
                          outputname=str(tmp_path / f"st{name}"),
                          out_npy=str(out_npy))
    assert got is None
    streamed = np.load(out_npy)
    np.testing.assert_array_equal(streamed, want.to_numpy())  # bitwise
    assert in_csv.read_bytes() == (tmp_path / f"st{name}.csv").read_bytes()


@pytest.mark.parametrize("method", METHODS)
def test_symmetric_matches_in_memory(tmp_path, method):
    arr = _sym_pvals(np.random.default_rng(0), 17)
    _assert_stream_matches(tmp_path, arr, method)


@pytest.mark.parametrize("method", ["fdr_bh", "fdr_by", "holm",
                                    "fdr_tsbky"])
def test_full_matrix_matches_in_memory(tmp_path, method):
    arr = np.random.default_rng(1).uniform(0, 1, (11, 23)).astype(
        np.float32)
    _assert_stream_matches(tmp_path, arr, method)


def test_float64_input_and_ties(tmp_path):
    rng = np.random.default_rng(2)
    arr = rng.choice([0.001, 0.01, 0.2, 0.2, 0.5, 1.0], size=(9, 13))
    _assert_stream_matches(tmp_path, arr.astype(np.float64), "fdr_bh")


def test_nan_propagation_matches(tmp_path):
    arr = np.random.default_rng(3).uniform(0, 1, (7, 7)).astype(np.float32)
    arr[2, 4] = np.nan  # asymmetric + NaN
    for method in ("fdr_bh", "holm", "bonferroni"):
        _assert_stream_matches(tmp_path, arr, method, name=f"_{method}")


def test_small_chunks_exercise_boundaries(tmp_path):
    """chunk_cells small enough to force one row per chunk."""
    arr = _sym_pvals(np.random.default_rng(4), 13)
    df = pd.DataFrame(arr)
    want = adj_pval(df, "fdr_by").to_numpy()
    src = tmp_path / "p.npy"
    np.save(src, arr)
    adj_pval_stream(str(src), "fdr_by", out_npy=str(tmp_path / "o.npy"),
                    chunk_cells=4)
    np.testing.assert_array_equal(np.load(tmp_path / "o.npy"), want)


def test_symmetric_override_and_validation(tmp_path):
    arr = np.random.default_rng(5).uniform(0, 1, (6, 6)).astype(np.float32)
    src = tmp_path / "p.npy"
    np.save(src, arr)  # NOT symmetric
    # forced symmetric=True: triu-only correction despite asymmetry
    adj_pval_stream(str(src), "fdr_bh", out_npy=str(tmp_path / "o.npy"),
                    symmetric=True)
    out = np.load(tmp_path / "o.npy")
    assert np.isnan(out[np.tril_indices(6)]).all()
    with pytest.raises(ValueError, match="square"):
        adj_pval_stream(np.zeros((2, 3)), "fdr_bh", symmetric=True,
                        out_npy=str(tmp_path / "x.npy"))
    with pytest.raises(ValueError, match="hommel"):
        adj_pval_stream(str(src), "hommel", out_npy=str(tmp_path / "x.npy"))
    with pytest.raises(ValueError, match="not recognized"):
        adj_pval_stream(str(src), "bogus", out_npy=str(tmp_path / "x.npy"))
    with pytest.raises(ValueError, match="artifacts only"):
        adj_pval_stream(str(src), "fdr_bh")


def test_custom_labels_in_csv(tmp_path):
    arr = np.random.default_rng(6).uniform(0, 1, (3, 4)).astype(np.float32)
    labels = ["r,0", "r1", "r2"]  # comma forces quoting
    cols = ["c0", "c1", "c2", "c3"]
    want = adj_pval(pd.DataFrame(arr, index=labels, columns=cols), "fdr_bh")
    want.to_csv(tmp_path / "mem.csv")
    src = tmp_path / "p.npy"
    np.save(src, arr)
    adj_pval_stream(str(src), "fdr_bh", outputname=str(tmp_path / "st"),
                    index=labels, columns=cols)
    assert (tmp_path / "mem.csv").read_bytes() == \
        (tmp_path / "st.csv").read_bytes()


def test_one_by_one_symmetric(tmp_path):
    src = tmp_path / "p.npy"
    np.save(src, np.array([[0.3]], dtype=np.float32))
    adj_pval_stream(str(src), "fdr_bh", out_npy=str(tmp_path / "o.npy"))
    out = np.load(tmp_path / "o.npy")
    assert out.shape == (1, 1) and np.isnan(out[0, 0])


def test_differential_fuzz_vs_in_memory(tmp_path):
    """Randomized differential fuzz: shapes, dtypes, NaN densities,
    duplicate-heavy value pools, methods, and chunk sizes — streamed
    output must equal the in-memory correction BITWISE every time."""
    rng = np.random.default_rng(1234)
    methods = METHODS
    for trial in range(25):
        m1 = int(rng.integers(1, 24))
        symmetric = bool(rng.integers(0, 2))
        m2 = m1 if symmetric else int(rng.integers(1, 24))
        dtype = np.float32 if rng.integers(0, 2) else np.float64
        # duplicate-heavy pools stress tie handling; occasional NaNs
        # stress the poisoning/propagation parity
        if rng.integers(0, 2):
            pool = rng.uniform(0, 1, 4)
            arr = rng.choice(pool, size=(m1, m2))
        else:
            arr = rng.uniform(0, 1, (m1, m2))
        if symmetric:
            arr = np.triu(arr, 1)
            arr = arr + arr.T
            np.fill_diagonal(arr, rng.uniform(0, 1))
        if rng.integers(0, 4) == 0 and not symmetric:
            nan_mask = rng.uniform(size=arr.shape) < 0.1
            arr[nan_mask] = np.nan
        arr = arr.astype(dtype)
        method = methods[int(rng.integers(0, len(methods)))]
        alpha = float(rng.choice([0.01, 0.05, 0.2]))
        chunk = int(rng.choice([1, 7, 1 << 20]))

        want = adj_pval(pd.DataFrame(arr), method, alpha).to_numpy()
        src = tmp_path / f"f{trial}.npy"
        np.save(src, arr)
        out = tmp_path / f"o{trial}.npy"
        adj_pval_stream(str(src), method, alpha, out_npy=str(out),
                        chunk_cells=chunk)
        got = np.load(out)
        np.testing.assert_array_equal(
            got, want,
            err_msg=f"trial={trial} m1={m1} m2={m2} sym={symmetric} "
                    f"dtype={dtype} method={method} alpha={alpha} "
                    f"chunk={chunk}")


def test_tie_mass_streams_without_refinement(tmp_path, monkeypatch):
    """An oversized ALL-EQUAL bucket (the structural-tie case: empirical
    p-values are grid-quantized, fitted ones saturate at exactly 0.0 and
    1.0) must stream in bounded chunks with NO sort and NO refinement
    pass — detected straight from pass-A min/max key metadata — and
    every in-RAM chunk must stay <= the cap.  Bitwise parity holds for
    both accumulate directions and the two-stage scaling."""
    from seekr_tpu.stats import stream_adj

    refines = []
    real_refine = stream_adj._refine_segments
    monkeypatch.setattr(stream_adj, "_refine_segments",
                        lambda *a, **k: refines.append(1) or
                        real_refine(*a, **k))
    seen = []
    real_chunk = stream_adj._correct_chunk
    monkeypatch.setattr(stream_adj, "_correct_chunk",
                        lambda m, p, *a: seen.append(len(p)) or
                        real_chunk(m, p, *a))

    rng = np.random.default_rng(8)
    # pure grid: every value is one of 4 distinct floats -> at most 4
    # nonempty buckets, all all-equal, all far above the cap
    grid = np.array([0.0, 0.25, 0.875, 1.0])
    arr = rng.choice(grid, size=(23, 31), p=[0.1, 0.1, 0.2, 0.6])
    cap = 16
    for method in ("fdr_bh", "holm", "fdr_tsbky"):
        want = adj_pval(pd.DataFrame(arr), method).to_numpy()
        src = tmp_path / f"t_{method}.npy"
        np.save(src, arr)
        out = tmp_path / f"o_{method}.npy"
        adj_pval_stream(str(src), method, out_npy=str(out),
                        max_bucket_pairs=cap)
        np.testing.assert_array_equal(np.load(out), want)
    assert not refines, "all-equal buckets must not trigger refinement"
    assert seen and max(seen) <= cap, \
        f"a chunk of {max(seen)} pairs exceeded the {cap}-pair cap"


def test_mixed_oversized_bucket_radix_refines(tmp_path, monkeypatch):
    """A tie mass sharing its quantile bucket with near-equal distinct
    values (keys differing only in low bits — quantiles cannot split
    them either) forces the byte-radix refinement, which must still be
    bitwise-exact and keep every sorted segment within the cap."""
    from seekr_tpu.stats import stream_adj

    refines = []
    real_refine = stream_adj._refine_segments
    monkeypatch.setattr(stream_adj, "_refine_segments",
                        lambda *a, **k: refines.append(1) or
                        real_refine(*a, **k))
    seen = []
    real_chunk = stream_adj._correct_chunk
    monkeypatch.setattr(stream_adj, "_correct_chunk",
                        lambda m, p, *a: seen.append(len(p)) or
                        real_chunk(m, p, *a))

    rng = np.random.default_rng(9)
    base = np.float64(0.5)
    # a tie mass at exactly 0.5 plus ~1000 distinct near-0.5 values
    # (low-bit perturbations): several distinct values land in every
    # quantile bucket, so buckets overflow the cap WITHOUT being
    # all-equal — only byte-radix refinement can bound them
    eps = np.spacing(base) * rng.integers(1, 1000, size=(64, 64))
    arr = np.where(rng.uniform(size=(64, 64)) < 0.3, base, base + eps)
    cap = 8
    for method in ("fdr_by", "simes-hochberg", "holm-sidak"):
        want = adj_pval(pd.DataFrame(arr), method).to_numpy()
        src = tmp_path / f"r_{method}.npy"
        np.save(src, arr)
        out = tmp_path / f"ro_{method}.npy"
        adj_pval_stream(str(src), method, out_npy=str(out),
                        max_bucket_pairs=cap)
        np.testing.assert_array_equal(np.load(out), want)
    assert refines, "expected the mixed oversized bucket to refine"
    assert seen and max(seen) <= cap


def test_tie_fuzz_with_tiny_cap(tmp_path):
    """Randomized empirical-grid p-values (k/N quantization — guaranteed
    massive ties) under a tiny in-RAM cap: streamed == in-memory,
    bitwise, for every method family."""
    rng = np.random.default_rng(4321)
    for trial in range(15):
        m1 = int(rng.integers(2, 20))
        m2 = int(rng.integers(1, 20))
        n_grid = int(rng.integers(1, 6))  # tiny empirical sample size
        grid = np.arange(n_grid + 1, dtype=np.float64) / n_grid
        arr = rng.choice(grid, size=(m1, m2))
        if rng.integers(0, 2):
            arr = arr.astype(np.float32)
        method = METHODS[int(rng.integers(0, len(METHODS)))]
        cap = int(rng.choice([2, 5, 17]))
        want = adj_pval(pd.DataFrame(arr), method).to_numpy()
        src = tmp_path / f"g{trial}.npy"
        np.save(src, arr)
        out = tmp_path / f"go{trial}.npy"
        adj_pval_stream(str(src), method, out_npy=str(out),
                        max_bucket_pairs=cap,
                        chunk_cells=int(rng.choice([3, 64])))
        np.testing.assert_array_equal(
            np.load(out), want,
            err_msg=f"trial={trial} m1={m1} m2={m2} grid={n_grid + 1} "
                    f"method={method} cap={cap}")


def test_fd_cap_many_row_groups(tmp_path, monkeypatch):
    """The pair store must not keep one fd per partition open: with the
    cap forced to 2 and dozens of row groups (1-row chunks), results
    stay bitwise correct (review finding: ~1,900 fds at the 180k
    extreme would exceed a 1024 ulimit)."""
    from seekr_tpu.stats import stream_adj

    monkeypatch.setattr(stream_adj._PairStore, "_MAX_OPEN", 2)
    arr = _sym_pvals(np.random.default_rng(7), 29)
    want = adj_pval(pd.DataFrame(arr), "fdr_bh").to_numpy()
    src = tmp_path / "p.npy"
    np.save(src, arr)
    adj_pval_stream(str(src), "fdr_bh", out_npy=str(tmp_path / "o.npy"),
                    chunk_cells=29)  # one row per chunk -> 29 groups
    np.testing.assert_array_equal(np.load(tmp_path / "o.npy"), want)
