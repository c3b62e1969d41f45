"""Side-by-side oracle tests against the mounted reference implementation.

Imports the actual upstream package (read-only at /root/reference) and
compares whole pipeline stages on its larger test corpora (111 and 151 real
transcripts).  Skipped when the reference is not mounted.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="module")
def ref_pkg():
    if os.environ.get("SEEKR_TPU_FORCE_LOCAL_FIXTURES"):
        pytest.skip("bare-clone reproduction (SEEKR_TPU_FORCE_LOCAL_FIXTURES)")
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.kmer_counts import BasicCounter as RefCounter
        from seekr.pearson import pearson as ref_pearson
    except ImportError:
        pytest.skip("reference package not importable")
    finally:
        sys.path.remove(REFERENCE)
    return RefCounter, ref_pearson


@pytest.fixture(scope="module")
def seqs_fastas(ref_data):
    return (str(ref_data.parent / "seqs1.fa"), str(ref_data.parent / "seqs2.fa"))


@pytest.mark.parametrize("log2", ["Log2.none", "Log2.pre", "Log2.post"])
def test_counts_match_reference_all_log2_modes(ref_pkg, seqs_fastas, log2):
    from seekr_tpu import BasicCounter

    RefCounter, _ = ref_pkg
    fa1, _ = seqs_fastas
    ours = BasicCounter(fa1, k=3, log2=log2, silent=True)
    ours.get_counts()
    ref = RefCounter(fa1, k=3, log2=log2, silent=True)
    ref.get_counts()
    np.testing.assert_allclose(ours.counts, ref.counts, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.mean), ref.mean,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours.std), ref.std,
                               rtol=1e-4, atol=1e-4)


def test_raw_counts_match_reference(ref_pkg, seqs_fastas):
    from seekr_tpu import BasicCounter

    RefCounter, _ = ref_pkg
    _, fa2 = seqs_fastas
    ours = BasicCounter(fa2, k=4, mean=False, std=False, log2="Log2.none",
                        silent=True)
    ours.get_counts()
    ref = RefCounter(fa2, k=4, mean=False, std=False, log2="Log2.none",
                     silent=True)
    ref.get_counts()
    np.testing.assert_allclose(ours.counts, ref.counts, rtol=1e-4, atol=1e-4)


def test_cross_pearson_matches_reference(ref_pkg, seqs_fastas, tmp_path):
    from seekr_tpu import BasicCounter, pearson

    RefCounter, ref_pearson = ref_pkg
    fa1, fa2 = seqs_fastas
    o1 = BasicCounter(fa1, k=3, silent=True)
    o1.get_counts()
    mean, std = tmp_path / "m.npy", tmp_path / "s.npy"
    np.save(mean, o1.mean)
    np.save(std, o1.std)
    o2 = BasicCounter(fa2, k=3, mean=str(mean), std=str(std), silent=True)
    o2.get_counts()
    r1 = RefCounter(fa1, k=3, silent=True)
    r1.get_counts()
    r2 = RefCounter(fa2, k=3, mean=str(mean), std=str(std), silent=True)
    r2.get_counts()
    np.testing.assert_allclose(
        pearson(o1.counts, o2.counts), ref_pearson(r1.counts, r2.counts),
        rtol=1e-3, atol=1e-4)


def test_find_dist_rvalues_match_reference(ref_pkg, seqs_fastas, tmp_path,
                                           monkeypatch):
    """fit_model=False r-value arrays agree (no RNG subsetting)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.find_dist import find_dist as ref_find_dist
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.stats import find_dist

    fa1, _ = seqs_fastas
    ours = find_dist(inputseq=fa1, k_mer=2, fit_model=False, subsetting=False)
    theirs = ref_find_dist(inputseq=fa1, k_mer=2, fit_model=False,
                           subsetting=False)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(np.sort(ours), np.sort(theirs),
                               rtol=1e-3, atol=1e-4)


def test_find_pval_fitted_matches_reference(ref_pkg, seqs_fastas, tmp_path,
                                            monkeypatch):
    """Fitted-distribution branch: our vectorized 1-cdf(r) vs the
    reference's per-cell loop (seekr/find_pval.py:126-133), same fitres."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.find_pval import find_pval as ref_find_pval
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.stats import find_dist, find_pval
    from seekr_tpu.stats.find_dist import fit_distributions

    fa1, fa2 = seqs_fastas
    bkg = find_dist(inputseq=fa1, k_mer=2, fit_model=False, subsetting=False)
    fitres = fit_distributions(bkg, ["norm", "cauchy"], statsmethod="ks")
    mean, std = "bkg_mean_2mers.npy", "bkg_std_2mers.npy"
    ours = find_pval(fa1, fa2, mean, std, 2, fitres=fitres,
                     progress_bar=False)
    theirs = ref_find_pval(fa1, fa2, mean, std, 2, fitres=fitres,
                           progress_bar=False)
    assert list(ours.index) == list(theirs.index)
    assert list(ours.columns) == list(theirs.columns)
    np.testing.assert_allclose(ours.values, theirs.values,
                               rtol=1e-4, atol=2e-3)


def test_find_pval_empirical_matches_reference(ref_pkg, seqs_fastas, tmp_path,
                                               monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, REFERENCE)
    try:
        from seekr.find_pval import find_pval as ref_find_pval
    finally:
        sys.path.remove(REFERENCE)
    from seekr_tpu.stats import find_dist, find_pval

    fa1, fa2 = seqs_fastas
    bkg = find_dist(inputseq=fa1, k_mer=2, fit_model=False, subsetting=False)
    mean, std = "bkg_mean_2mers.npy", "bkg_std_2mers.npy"
    ours = find_pval(fa1, fa2, mean, std, 2, fitres=bkg, progress_bar=False)
    theirs = ref_find_pval(fa1, fa2, mean, std, 2, fitres=bkg,
                           progress_bar=False)
    assert list(ours.index) == list(theirs.index)
    assert list(ours.columns) == list(theirs.columns)
    np.testing.assert_allclose(ours.values, theirs.values,
                               rtol=1e-4, atol=2e-3)
