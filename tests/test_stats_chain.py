"""Tests for the find_dist -> find_pval -> adj_pval chain.

The empirical-CDF device kernel is checked against the reference's exact
per-cell formula (seekr/find_pval.py:164); the chain runs end-to-end on the
upstream example fixtures.
"""

import numpy as np
import pandas as pd
import pytest

from seekr_tpu.ops.ecdf import empirical_pvals
from seekr_tpu.stats import adj_pval, find_dist, find_pval
from seekr_tpu.stats.find_dist import fit_distributions, resolve_models


def test_empirical_pvals_matches_reference_formula():
    rng = np.random.default_rng(0)
    bkg = rng.normal(size=1000).astype(np.float32)
    sim = rng.normal(size=(7, 5)).astype(np.float32)
    sim[0, 0] = bkg[0]  # exercise tie handling
    got = np.asarray(empirical_pvals(bkg, sim))
    expected_counts = np.empty(sim.shape, dtype=np.int64)
    for i in range(sim.shape[0]):
        for j in range(sim.shape[1]):
            expected_counts[i, j] = np.sum(bkg > sim[i, j])
    # exceedance counts must match EXACTLY (including ties); the only
    # difference vs the reference formula is float32 vs float64 division
    np.testing.assert_array_equal(np.rint(got * len(bkg)).astype(np.int64),
                                  expected_counts)


def test_resolve_models():
    assert len(resolve_models("common10")) == 10
    assert "norm" in resolve_models("all")
    assert "levy_stable" not in resolve_models("all")
    assert resolve_models(["norm", "not_a_dist"]) == ["norm"]


def test_fit_distributions_parallel_matches_sequential():
    rng = np.random.default_rng(5)
    data = rng.normal(size=2000)
    seq = fit_distributions(data, ["norm", "uniform", "expon"],
                            statsmethod="ks")
    par = fit_distributions(data, ["norm", "uniform", "expon"],
                            statsmethod="ks", n_jobs=3)
    assert [(n, p) for n, _, p in seq] == [(n, p) for n, _, p in par]


def test_fit_timeout_skips_hung_fit(monkeypatch, capsys):
    """A pathological (here: deliberately sleeping) MLE is skipped with the
    reference-style 'Could not fit ...' message instead of hanging 'all'."""
    import time
    from scipy import stats

    def slow_fit(*a, **k):
        time.sleep(10)
        return (0.0, 1.0)

    monkeypatch.setattr(type(stats.norm), "fit", slow_fit)
    rng = np.random.default_rng(6)
    data = rng.normal(size=2000)
    t0 = time.perf_counter()
    results = fit_distributions(data, ["norm", "uniform"], statsmethod="ks",
                                fit_timeout=0.5)
    assert time.perf_counter() - t0 < 5
    assert [r[0] for r in results] == ["uniform"]
    out = capsys.readouterr().out
    assert "Could not fit norm because" in out
    assert "fit_timeout" in out


def test_fit_timeout_generous_keeps_results():
    rng = np.random.default_rng(7)
    data = rng.normal(size=2000)
    with_to = fit_distributions(data, ["norm", "uniform"], statsmethod="ks",
                                fit_timeout=60.0)
    without = fit_distributions(data, ["norm", "uniform"], statsmethod="ks")
    assert [(n, p) for n, _, p in with_to] == [(n, p) for n, _, p in without]


def test_fit_distributions_norm_recovers_params():
    rng = np.random.default_rng(1)
    data = rng.normal(loc=2.0, scale=0.5, size=5000)
    results = fit_distributions(data, ["norm", "uniform"], statsmethod="ks")
    assert results[0][0] == "norm"
    loc, scale = results[0][2]
    assert abs(loc - 2.0) < 0.05 and abs(scale - 0.5) < 0.05


def test_find_dist_fit_model_false_returns_rvalues(ref_data, example_fa,
                                                   tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    r = find_dist(inputseq=example_fa, k_mer=2, fit_model=False,
                  subsetting=False)
    # 5 sequences -> 10 upper-triangle pairs
    assert r.shape == (10,)
    assert np.all(np.abs(r) <= 1.0 + 1e-5)
    assert (tmp_path / "bkg_mean_2mers.npy").exists()
    assert (tmp_path / "bkg_std_2mers.npy").exists()


def test_find_pval_empirical_and_fitted(ref_data, example_fa, tmp_path,
                                        monkeypatch):
    monkeypatch.chdir(tmp_path)
    bkg = find_dist(inputseq=example_fa, k_mer=2, fit_model=False,
                    subsetting=False)
    pvals = find_pval(example_fa, example_fa, "bkg_mean_2mers.npy",
                      "bkg_std_2mers.npy", 2, fitres=bkg,
                      progress_bar=False, outputname="pv")
    assert pvals.shape == (5, 5)
    assert (tmp_path / "pv.csv").exists()
    assert np.all((pvals.values >= 0) & (pvals.values <= 1))

    fitres = fit_distributions(bkg, ["norm"], statsmethod="ks")
    pvals2 = find_pval(example_fa, example_fa, "bkg_mean_2mers.npy",
                       "bkg_std_2mers.npy", 2, fitres=fitres,
                       progress_bar=False)
    assert pvals2.shape == (5, 5)
    assert np.all((pvals2.values >= -1e-9) & (pvals2.values <= 1 + 1e-9))


def test_find_pval_invalid_fitres_returns_none(ref_data, example_fa, tmp_path,
                                               monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    find_dist(inputseq=example_fa, k_mer=2, fit_model=False, subsetting=False)
    assert find_pval(example_fa, example_fa, "bkg_mean_2mers.npy",
                     "bkg_std_2mers.npy", 2, fitres="bogus") is None
    assert find_pval(example_fa, example_fa, "bkg_mean_2mers.npy",
                     "bkg_std_2mers.npy", 2,
                     fitres=np.zeros((3, 3))) is None
    # wrong k vs norm vectors -> None (intended check; upstream :76 is buggy)
    assert find_pval(example_fa, example_fa, "bkg_mean_2mers.npy",
                     "bkg_std_2mers.npy", 3, fitres=np.zeros(5)) is None


def test_find_pval_bestfit_out_of_range_returns_none(ref_data, example_fa,
                                                     tmp_path, monkeypatch,
                                                     capsys):
    """bestfit outside [1, len(fitres)] returns None with an advisory
    instead of IndexError (empty/short list) or silently selecting the
    WORST fit (bestfit=0 -> fitres[-1] in the reference)."""
    monkeypatch.chdir(tmp_path)
    find_dist(inputseq=example_fa, k_mer=2, fit_model=False, subsetting=False)
    fitres = [("norm", 0.1, (0.0, 1.0))]
    args = (example_fa, example_fa, "bkg_mean_2mers.npy",
            "bkg_std_2mers.npy", 2)
    assert find_pval(*args, fitres=fitres, bestfit=0) is None
    assert find_pval(*args, fitres=fitres, bestfit=2) is None
    assert find_pval(*args, fitres=[], bestfit=1) is None
    out = capsys.readouterr().out
    assert "bestfit must be between 1 and" in out
    # non-integer bestfit: advisory + None, never a TypeError from the
    # index nor a silent 1.5 -> 1 truncation (review finding)
    assert find_pval(*args, fitres=fitres, bestfit=1.5) is None
    assert find_pval(*args, fitres=fitres, bestfit="two") is None
    assert find_pval(*args, fitres=fitres, bestfit=None) is None
    out = capsys.readouterr().out
    assert "bestfit must be an integer" in out
    # in-range still works, including integral strings/floats
    assert find_pval(*args, fitres=fitres, bestfit=1) is not None
    assert find_pval(*args, fitres=fitres, bestfit="1") is not None


def test_resolve_models_drops_unfittable_with_message(capsys):
    """Distributions without a .fit method (all scipy discrete families)
    are excluded with the INTENDED message: the reference prints the
    whole requested list because it compares names against distribution
    objects (seekr/find_dist.py:141-146); ours names just the dropped
    ones (documented deviation)."""
    got = resolve_models(["bernoulli", "poisson", "norm"])
    assert got == ["norm"]
    out = capsys.readouterr().out
    assert "do not have a 'fit' method" in out
    assert "bernoulli" in out and "poisson" in out
    # the surviving name is not listed as excluded
    assert "'norm'" not in out.split("fit' method:")[-1]
    # 'all' drops them silently like the reference
    all_names = resolve_models("all")
    assert "norm" in all_names and "bernoulli" not in all_names
    assert "fit' method" not in capsys.readouterr().out


def test_empirical_pvals_nan_background_counts_as_not_greater():
    # reference semantics: mean(bkg > r) — NaN comparisons are False, while
    # naive searchsorted would count NaNs (sorted past the end) as greater
    bkg = np.array([0.1, 0.5, np.nan, np.nan])
    got = np.asarray(empirical_pvals(bkg, np.array([[0.6, 0.0]])))
    want = np.array([[np.mean(bkg > 0.6), np.mean(bkg > 0.0)]])
    np.testing.assert_allclose(got, want)
    assert got[0, 0] == 0.0  # not 0.5


def test_find_pval_rejects_string_params(ref_data, example_fa, tmp_path,
                                         monkeypatch, capsys):
    # intended validation (reference's np.isscalar('x') hole is fixed):
    # malformed fitres -> advisory message + None, not a scipy crash
    from seekr_tpu.stats.find_pval import check_main_list

    assert not check_main_list([("norm", "bad", ("a", "b"))])
    assert check_main_list([("norm", 0.1, (0.0, 1.0))])
    assert check_main_list([("norm", np.float32(0.1), (np.float64(0.0), 1))])


def test_adj_pval_single_cell_symmetric_no_crash():
    # 1x1 symmetric matrix -> empty upper triangle -> empty correction
    df = pd.DataFrame([[0.5]], index=["a"], columns=["a"])
    adj = adj_pval(df, method="fdr_bh")
    assert adj is not None
    assert np.isnan(adj.values[0, 0])


def test_resolve_models_bare_string_is_one_name(capsys):
    from seekr_tpu.stats.find_dist import resolve_models

    assert resolve_models("norm") == ["norm"]
    assert "Excluding" not in capsys.readouterr().out


def test_plot_fits_empty_results_no_crash(tmp_path, capsys):
    from seekr_tpu.stats.find_dist import plot_fits

    plot_fits(np.zeros(10), [], str(tmp_path / "p"))
    assert "skipping" in capsys.readouterr().out
    assert not (tmp_path / "p.pdf").exists()


def test_find_dist_mesh_matches_single_device(ref_data, example_fa, tmp_path,
                                              monkeypatch):
    """-dp routing of the background Pearson is numerically equivalent."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    monkeypatch.chdir(tmp_path)
    fa = str(ref_data.parent / "ldseq.fa")
    base = find_dist(inputseq=fa, k_mer=2, fit_model=False, subsetting=False)
    meshed = find_dist(inputseq=fa, k_mer=2, fit_model=False,
                       subsetting=False, data_parallel=4)
    np.testing.assert_allclose(meshed, base, rtol=1e-4, atol=1e-5)


def test_adj_pval_symmetric_upper_triangle():
    p = np.array([[0.0, 0.01, 0.02],
                  [0.01, 0.0, 0.03],
                  [0.02, 0.03, 0.0]])
    df = pd.DataFrame(p, index=list("abc"), columns=list("abc"))
    adj = adj_pval(df, method="bonferroni")
    triu = np.triu_indices(3, k=1)
    np.testing.assert_allclose(adj.values[triu],
                               np.clip(p[triu] * 3, 0, 1))
    assert np.isnan(adj.values[np.tril_indices(3)]).all()


def test_adj_pval_asymmetric_full_matrix(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = np.array([[0.01, 0.2], [0.5, 0.04]])
    df = pd.DataFrame(p, index=["r1", "r2"], columns=["c1", "c2"])
    adj = adj_pval(df, method="bonferroni", outputname="adj")
    np.testing.assert_allclose(adj.values, np.clip(p * 4, 0, 1))
    assert (tmp_path / "adj.csv").exists()


def test_adj_pval_non_dataframe_returns_none():
    assert adj_pval(np.zeros((2, 2)), method="bonferroni") is None


def test_find_dist_plotfit_and_outputs(ref_data, example_fa, tmp_path,
                                       monkeypatch):
    monkeypatch.chdir(tmp_path)
    results = find_dist(inputseq=example_fa, k_mer=2, fit_model=True,
                        models=["norm", "uniform"], subsetting=False,
                        plotfit="fitplot", outputname="fitres")
    assert len(results) == 2
    assert (tmp_path / "fitplot.pdf").exists()
    assert (tmp_path / "fitres.csv").exists()
    df = pd.read_csv(tmp_path / "fitres.csv")
    assert list(df.columns) == ["distribution_name", "D_statistics", "params"]


@pytest.mark.parametrize("statsmethod", ["mse", "aic", "bic"])
def test_fit_distributions_other_statsmethods(statsmethod):
    rng = np.random.default_rng(6)
    data = rng.normal(size=3000)
    results = fit_distributions(data, ["norm", "uniform"],
                                statsmethod=statsmethod)
    assert len(results) == 2
    # norm must beat uniform on normal data for every metric
    assert results[0][0] == "norm"


def test_fit_distributions_invalid_statsmethod_falls_back(capsys):
    rng = np.random.default_rng(7)
    results = fit_distributions(rng.normal(size=500), ["norm"],
                                statsmethod="bogus")
    assert "valid statsmethod" in capsys.readouterr().out
    assert results[0][0] == "norm"


def test_is_symmetric_fast_path_matches_pandas_semantics():
    """The tiled numeric path must decide exactly like rounded.equals(
    rounded.T) — fuzzed over NaN patterns, rounding-boundary deltas,
    label mismatches, and asymmetries."""
    from seekr_tpu.stats.adj_pval import is_symmetric

    def literal(df):
        masked = df.where(~np.eye(df.shape[0], dtype=bool))
        rounded = np.round(masked, 5)
        return rounded.equals(rounded.T)

    rng = np.random.default_rng(42)
    for trial in range(30):
        m = int(rng.integers(1, 40))
        a = rng.random((m, m))
        mat = (a + a.T) / 2
        kind = trial % 6
        if kind == 1 and m > 1:  # single asymmetric cell
            mat[0, m - 1] += 1e-3
        elif kind == 2 and m > 1:  # sub-rounding-tolerance asymmetry
            mat[0, m - 1] += 1e-7
        elif kind == 3:  # symmetric NaNs + NaN diagonal
            mat[np.diag_indices(m)] = np.nan
            if m > 2:
                mat[0, 1] = mat[1, 0] = np.nan
        elif kind == 4 and m > 1:  # one-sided NaN
            mat[0, m - 1] = np.nan
        labels = [f"s{i}" for i in range(m)]
        df = pd.DataFrame(mat, index=labels, columns=labels)
        assert is_symmetric(df) == literal(df), (trial, kind, m)
    # label mismatch defeats symmetry even with symmetric values
    sym = pd.DataFrame(np.zeros((3, 3)), index=list("abc"),
                       columns=list("xyz"))
    assert is_symmetric(sym) == literal(sym) == False  # noqa: E712


def test_is_symmetric_tiled_crosses_tile_boundary():
    from seekr_tpu.stats.adj_pval import _tiled_symmetric

    rng = np.random.default_rng(3)
    m = 130
    a = rng.random((m, m))
    mat = (a + a.T) / 2
    assert _tiled_symmetric(mat, tile=64)
    mat[7, 100] += 1.0  # off-diagonal tile pair
    assert not _tiled_symmetric(mat, tile=64)


def test_triu_values_matches_triu_indices():
    from seekr_tpu.utils.adj import triu_values as _triu_values

    rng = np.random.default_rng(11)
    for m in (1, 2, 3, 17, 128):
        sim = rng.random((m, m)).astype(np.float32)
        expected = sim[np.triu_indices(m, k=1)]
        got = _triu_values(sim)
        assert got.dtype == expected.dtype
        assert np.array_equal(got, expected)


def test_triu_fill_roundtrip_and_nan_fill():
    from seekr_tpu.utils.adj import triu_fill, triu_values

    rng = np.random.default_rng(12)
    for m in (1, 2, 3, 17, 64):
        mat = rng.random((m, m))
        flat = triu_values(mat)
        out = triu_fill(m, flat)
        # matches the index-array scatter the reference-style code used
        expected = np.full((m, m), np.nan)
        expected[np.triu_indices(m, k=1)] = flat
        np.testing.assert_array_equal(out, expected)
        # strict upper triangle survives the round trip exactly
        assert np.array_equal(triu_values(out), flat)


def test_find_dist_sampled_path_bounded_memory(ref_data, example_fa, tmp_path,
                                               monkeypatch):
    """Forcing the pool threshold to 0 routes subsetting through
    sample_triu_pairs (index sampling + device gather-dot): values must be
    genuine members of the full triu pool and the run must be seedable."""
    monkeypatch.chdir(tmp_path)
    full = find_dist(inputseq=example_fa, k_mer=2, fit_model=False,
                     subsetting=False)
    np.random.seed(3)
    got = find_dist(inputseq=example_fa, k_mer=2, fit_model=False,
                    subsetting=True, subset_size=4,
                    exact_subsample_max_pool=0)
    assert got.shape == (4,)
    # every sampled value is an actual pair correlation from the pool
    for v in got:
        assert np.min(np.abs(full - v)) < 1e-5
    # distinct indices -> distinct pool positions (pool has no exact dups
    # for this fixture)
    assert len(np.unique(np.round(got, 6))) == 4
    np.random.seed(3)
    again = find_dist(inputseq=example_fa, k_mer=2, fit_model=False,
                      subsetting=True, subset_size=4,
                      exact_subsample_max_pool=0)
    np.testing.assert_array_equal(got, again)


def test_find_dist_default_threshold_keeps_exact_choice(ref_data, example_fa,
                                                        tmp_path, monkeypatch):
    """Below EXACT_SUBSAMPLE_MAX_POOL the subset is byte-exact with the
    reference recipe: np.random.choice over the materialized triangle
    (seekr/find_dist.py:166-171) under the same global seed."""
    monkeypatch.chdir(tmp_path)
    full = find_dist(inputseq=example_fa, k_mer=2, fit_model=False,
                     subsetting=False)
    np.random.seed(11)
    expected = np.random.choice(full, size=6, replace=False)
    np.random.seed(11)
    got = find_dist(inputseq=example_fa, k_mer=2, fit_model=False,
                    subsetting=True, subset_size=6)
    np.testing.assert_array_equal(got, expected)


def test_similarity_triu_mesh_matches_single(ref_data):
    """Tile-path (sharded) == tile-path (single-device) == dense oracle."""
    import jax

    from seekr_tpu.models.pearson import pearson
    from seekr_tpu.parallel.mesh import make_mesh
    from seekr_tpu.stats.find_dist import similarity_triu
    from seekr_tpu.utils.adj import triu_values

    rng = np.random.default_rng(21)
    counts = rng.normal(size=(37, 16)).astype(np.float32)
    oracle = triu_values(np.asarray(pearson(counts, counts)))
    single = similarity_triu(counts, block_rows=10)
    np.testing.assert_allclose(single, oracle, rtol=1e-5, atol=1e-6)
    mesh = make_mesh(jax.devices()[:4])
    meshed = similarity_triu(counts, mesh=mesh, block_rows=10)
    np.testing.assert_allclose(meshed, oracle, rtol=1e-5, atol=1e-6)


def test_mse_fitting_deterministic_across_n_jobs():
    """statsmethod='mse' draws synthetic samples: per-task seeds from
    the global RNG make seeded runs reproduce and n_jobs>1 identical to
    sequential (review finding: spawn workers got OS-entropy RNGs)."""
    import numpy as np

    from seekr_tpu.stats.find_dist import fit_distributions

    data = np.random.default_rng(5).normal(0.1, 0.2, 400)
    np.random.seed(7)
    seq1 = fit_distributions(data, ["norm", "uniform"], "mse")
    np.random.seed(7)
    seq2 = fit_distributions(data, ["norm", "uniform"], "mse")
    assert seq1 == seq2
    np.random.seed(7)
    par = fit_distributions(data, ["norm", "uniform"], "mse", n_jobs=2)
    assert par == seq1


def test_sorted_background_matches_empirical_pvals():
    """SortedBackground (the sort-once serving/streaming path) is
    bitwise-identical to empirical_pvals, including NaN backgrounds."""
    from seekr_tpu.ops.ecdf import SortedBackground, empirical_pvals

    rng = np.random.default_rng(21)
    bkg = rng.normal(size=5000)
    bkg[::17] = np.nan
    sim = rng.normal(size=(9, 11)).astype(np.float32)
    sb = SortedBackground(bkg)
    np.testing.assert_array_equal(sb.pvals(sim), empirical_pvals(bkg, sim))
    np.testing.assert_array_equal(sb.pvals(sim), empirical_pvals(bkg, sim))
