"""Unit tests for the in-house multiple-test correction (no statsmodels).

fdr_bh / fdr_by are checked against scipy.stats.false_discovery_control as an
independent oracle; step methods against hand-computed values; the rest via
ordering invariants (hochberg <= hommel <= holm, etc.).
"""

import numpy as np
import pytest

from seekr_tpu.stats.multitest import multipletests

P = np.array([0.01, 0.04, 0.03, 0.005])

ALL_METHODS = ["bonferroni", "sidak", "holm-sidak", "holm", "simes-hochberg",
               "hommel", "fdr_bh", "fdr_by", "fdr_tsbh", "fdr_tsbky"]


def corrected(p, method):
    return multipletests(p, alpha=0.05, method=method)[1]


def test_bonferroni_hand():
    np.testing.assert_allclose(corrected(P, "bonferroni"),
                               np.clip(P * 4, 0, 1))


def test_sidak_hand():
    np.testing.assert_allclose(corrected(P, "sidak"), 1 - (1 - P) ** 4,
                               rtol=1e-12)


def test_holm_hand():
    # sorted [.005,.01,.03,.04] * [4,3,2,1] = [.02,.03,.06,.04] -> cummax
    expected_sorted = [0.02, 0.03, 0.06, 0.06]
    got = corrected(P, "holm")
    np.testing.assert_allclose(np.sort(got), expected_sorted)


def test_hochberg_hand():
    # sorted * [4,3,2,1] = [.02,.03,.06,.04] -> cummin from right
    expected_sorted = [0.02, 0.03, 0.04, 0.04]
    got = corrected(P, "simes-hochberg")
    np.testing.assert_allclose(np.sort(got), expected_sorted)


def test_fdr_bh_hand():
    # sorted * 4/[1,2,3,4] = [.02,.02,.04,.04] -> cummin from right
    expected_sorted = [0.02, 0.02, 0.04, 0.04]
    got = corrected(P, "fdr_bh")
    np.testing.assert_allclose(np.sort(got), expected_sorted)


def test_fdr_bh_by_vs_scipy():
    fdc = pytest.importorskip("scipy.stats").false_discovery_control
    rng = np.random.default_rng(0)
    p = rng.uniform(size=200)
    np.testing.assert_allclose(corrected(p, "fdr_bh"), fdc(p, method="bh"),
                               rtol=1e-12)
    np.testing.assert_allclose(corrected(p, "fdr_by"), fdc(p, method="by"),
                               rtol=1e-12)


@pytest.mark.parametrize("method", ALL_METHODS)
def test_bounds_and_order_preserved(method):
    rng = np.random.default_rng(1)
    p = rng.uniform(size=50)
    c = corrected(p, method)
    assert np.all(c >= p - 1e-12), method
    assert np.all(c <= 1.0 + 1e-12), method
    # correction preserves the significance ordering of sorted p-values
    order = np.argsort(p)
    assert np.all(np.diff(c[order]) >= -1e-12), method


def test_hommel_between_hochberg_and_holm():
    rng = np.random.default_rng(2)
    p = rng.uniform(size=30)
    hoch = corrected(p, "simes-hochberg")
    homm = corrected(p, "hommel")
    holm = corrected(p, "holm")
    assert np.all(homm >= hoch - 1e-12)
    assert np.all(homm <= holm + 1e-12)


@pytest.mark.parametrize("method", ALL_METHODS)
def test_single_pvalue(method):
    c = corrected(np.array([0.03]), method)
    # fdr_tsbky scales by (1+alpha) like statsmodels' two-stage bky
    expected = 0.03 * 1.05 if method == "fdr_tsbky" else 0.03
    np.testing.assert_allclose(c, [expected])


def test_shape_preserved():
    p = np.array([[0.01, 0.2], [0.5, 0.9]])
    rej, c, _, _ = multipletests(p, method="fdr_bh")
    assert c.shape == (2, 2) and rej.shape == (2, 2)


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        multipletests(P, method="nope")


@pytest.mark.parametrize("method", ALL_METHODS)
def test_native_path_bitwise_equals_numpy_path(method, monkeypatch):
    native_mod = pytest.importorskip("seekr_tpu.native")
    if not native_mod.native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    if method == "hommel":
        p = rng.random(300)  # hommel is O(n^2); keep it small
    else:
        p = np.round(rng.random(70001), 3)  # ties like empirical p-values
        p[:30] = 0.0
        p[30:60] = 1.0
    monkeypatch.setenv("SEEKR_TPU_HOST_SORT", "numpy")
    ref = multipletests(p, method=method)
    monkeypatch.setenv("SEEKR_TPU_HOST_SORT", "native")
    got = multipletests(p, method=method)
    assert ref[1].tobytes() == got[1].tobytes()
    assert np.array_equal(ref[0], got[0])


def test_native_path_nan_falls_back(monkeypatch):
    native_mod = pytest.importorskip("seekr_tpu.native")
    if not native_mod.native_available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(12)
    p = rng.random(70001)
    p[123] = np.nan
    monkeypatch.setenv("SEEKR_TPU_HOST_SORT", "native")
    got = multipletests(p, method="fdr_bh")
    monkeypatch.setenv("SEEKR_TPU_HOST_SORT", "numpy")
    ref = multipletests(p, method="fdr_bh")
    assert np.array_equal(ref[1], got[1], equal_nan=True)


def test_is_sorted_matches_unsorted_and_skips_scatter():
    """is_sorted=True returns the same corrected values as the unsorted
    call on pre-sorted input (it now skips the identity-permutation
    scatter entirely — review finding)."""
    rng = np.random.default_rng(11)
    p = np.sort(rng.uniform(0, 1, 5000))
    for method in ("fdr_bh", "fdr_by", "holm"):
        r1, c1 = multipletests(p, 0.05, method=method)[:2]
        r2, c2 = multipletests(p, 0.05, method=method, is_sorted=True)[:2]
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(r1, r2)
