"""stats.fast_cdf must be BITWISE-equal to the frozen scipy path.

The fitted find_pval branch substitutes fast_cdf for
``getattr(stats, name)(*params).cdf(x)`` with no tolerance or size
gate, so equality here is byte equality, over adversarial inputs:
in/out-of-support values, exact support boundaries, NaN/inf inputs,
invalid (non-positive) scale and shape parameters, float32 inputs, and
partial parameter tuples (scipy's loc/scale defaults).
"""

import numpy as np
import pytest
import scipy.special as sc
from scipy import stats

from seekr_tpu.stats.fast_cdf import _FORMULAS, fast_cdf

DISTS = sorted(_FORMULAS)


def _params_for(name, rng):
    n_shapes = _FORMULAS[name][0]
    shapes = tuple(float(rng.uniform(0.2, 3.0)) for _ in range(n_shapes))
    loc = float(rng.normal(scale=0.5))
    scale = float(rng.uniform(0.05, 2.0))
    return shapes + (loc, scale)


def _adversarial_x(rng, lo, hi, loc, scale):
    vals = [
        rng.uniform(-3, 3, 257),           # generic, mostly in-support
        np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1.0, -1.0]),
        # exact standardized-support boundaries mapped back to x-space
        np.array([loc + b * scale for b in (lo, hi)
                  if np.isfinite(b)]),
        rng.uniform(-50, 50, 64),          # far tails
    ]
    return np.concatenate([v for v in vals if len(v)])


@pytest.mark.parametrize("name", DISTS)
def test_bitwise_vs_frozen_scipy(name):
    rng = np.random.default_rng(hash(name) % (2 ** 32))
    lo, hi = _FORMULAS[name][1]
    for trial in range(5):
        params = _params_for(name, rng)
        loc, scale = params[-2], params[-1]
        x = _adversarial_x(rng, lo, hi, loc, scale)
        with np.errstate(all="ignore"):
            ref = getattr(stats, name)(*params).cdf(x)
        got = fast_cdf(name, params, x)
        assert got is not None
        assert got.dtype == ref.dtype
        assert got.tobytes() == ref.tobytes(), (name, trial, params)


@pytest.mark.parametrize("name", DISTS)
def test_bitwise_float32_matrix_input(name):
    rng = np.random.default_rng(1)
    params = _params_for(name, rng)
    sim = rng.uniform(-1, 1, (37, 53)).astype(np.float32)
    with np.errstate(all="ignore"):
        ref = getattr(stats, name)(*params).cdf(sim)
    got = fast_cdf(name, params, sim)
    assert got.shape == ref.shape and got.dtype == ref.dtype
    assert got.tobytes() == ref.tobytes()


def test_partial_param_tuples_use_scipy_defaults():
    x = np.linspace(-2, 2, 101)
    for name, params in [("norm", ()), ("norm", (0.3,)),
                         ("gamma", (1.7,)), ("gamma", (1.7, 0.2))]:
        ref = getattr(stats, name)(*params).cdf(x)
        got = fast_cdf(name, params, x)
        assert got.tobytes() == ref.tobytes(), (name, params)


def test_invalid_params_all_nan_like_scipy():
    x = np.linspace(-2, 2, 11)
    for name, params in [("norm", (0.0, -1.0)),   # scale <= 0
                         ("norm", (0.0, 0.0)),
                         ("gamma", (-2.0, 0.0, 1.0)),  # shape <= 0
                         ("lognorm", (np.nan, 0.0, 1.0))]:
        with np.errstate(all="ignore"):
            ref = getattr(stats, name)(*params).cdf(x)
            # the z = (x-loc)/scale divide warns for scale=0 exactly like
            # scipy's own unprotected transform — warning parity
            got = fast_cdf(name, params, x)
        assert got.tobytes() == ref.tobytes(), (name, params)


def test_unsupported_returns_none():
    assert fast_cdf("beta", (2.0, 3.0), np.zeros(3)) is None
    assert fast_cdf("nosuchdist", (1.0,), np.zeros(3)) is None
    # array-valued params take the scipy path
    assert fast_cdf("norm", (np.zeros(3), 1.0), np.zeros(3)) is None


def test_probe_disables_on_formula_mismatch(monkeypatch):
    # Simulate a scipy whose _cdf formula changed out from under us: the
    # one-time probe must catch the divergence and route the distribution
    # to the scipy fallback (fast_cdf -> None) for the whole process.
    from seekr_tpu.stats import fast_cdf as mod

    broken = dict(mod._FORMULAS)
    broken["norm"] = (0, (-np.inf, np.inf), lambda z: 0.999 * sc.ndtr(z))
    monkeypatch.setattr(mod, "_FORMULAS", broken)
    monkeypatch.setattr(mod, "_PROBE_VERDICTS", {})
    assert mod.fast_cdf("norm", (0.0, 1.0), np.zeros(4)) is None
    # verdict is memoized: still None on a second call
    assert mod.fast_cdf("norm", (0.5, 2.0), np.zeros(4)) is None


def test_probe_memoizes_pass(monkeypatch):
    from seekr_tpu.stats import fast_cdf as mod

    monkeypatch.setattr(mod, "_PROBE_VERDICTS", {})
    out = mod.fast_cdf("norm", (0.0, 1.0), np.array([0.0, 1.0]))
    assert out is not None
    assert mod._PROBE_VERDICTS == {("norm", (0.0, 1.0)): True}
    # a NEW params tuple re-probes (formula drift can be regime-local)
    out2 = mod.fast_cdf("norm", (0.5, 2.0), np.array([0.0, 1.0]))
    assert out2 is not None
    assert len(mod._PROBE_VERDICTS) == 2


def test_probe_runs_before_full_evaluation(monkeypatch):
    # a probe-failed distribution must NOT pay the full-size fast-path
    # evaluation on every call (it would double the total cost forever)
    from seekr_tpu.stats import fast_cdf as mod

    broken = dict(mod._FORMULAS)
    broken["norm"] = (0, (-np.inf, np.inf), lambda z: 0.999 * sc.ndtr(z))
    monkeypatch.setattr(mod, "_FORMULAS", broken)
    monkeypatch.setattr(mod, "_PROBE_VERDICTS", {})
    assert mod.fast_cdf("norm", (0.0, 1.0), np.zeros(4)) is None

    calls = []
    real_impl = mod._fast_cdf_impl

    def spy(*a, **kw):
        calls.append(np.asarray(a[2]).size)
        return real_impl(*a, **kw)

    monkeypatch.setattr(mod, "_fast_cdf_impl", spy)
    assert mod.fast_cdf("norm", (0.0, 1.0), np.zeros(1 << 16)) is None
    assert calls == []  # cached verdict short-circuits all evaluation


def test_large_array_threads_bitwise():
    # crosses the _MIN_PARALLEL threshold: block-parallel evaluation
    # must still be byte-equal to the frozen path
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 1 << 21).astype(np.float32)
    params = (0.05, -0.9, 1.1)
    ref = stats.lognorm(*params).cdf(x)
    got = fast_cdf("lognorm", params, x)
    assert got.tobytes() == ref.tobytes()


def test_find_pval_fitted_branch_unchanged(tmp_path, monkeypatch, capsys):
    """End-to-end: the fitted branch produces the same DataFrame through
    the fast path as through a forced scipy fallback."""
    from seekr_tpu.stats import fast_cdf as fc
    from seekr_tpu.stats.find_pval import find_pval

    fa1 = tmp_path / "a.fa"
    fa2 = tmp_path / "b.fa"
    fa1.write_text(">s1\nAGTCAGTCAGTCAGTC\n>s2\nGGGTTTAAACCCGGGT\n")
    fa2.write_text(">t1\nAGTCAGAGAGTCAGTC\n>t2\nCCCGTTTAAACCCGGG\n")
    mean = np.full(16, 60.0, dtype=np.float32)
    std = np.full(16, 20.0, dtype=np.float32)
    mp, sp = tmp_path / "m.npy", tmp_path / "s.npy"
    np.save(mp, mean)
    np.save(sp, std)
    fitres = [("norm", 0.1, (0.0, 0.5))]
    got = find_pval(str(fa1), str(fa2), str(mp), str(sp), 2, fitres=fitres,
                    progress_bar=False)
    monkeypatch.setattr(fc, "_FORMULAS", {})  # force the scipy fallback
    ref = find_pval(str(fa1), str(fa2), str(mp), str(sp), 2, fitres=fitres,
                    progress_bar=False)
    capsys.readouterr()
    assert got.to_numpy().tobytes() == ref.to_numpy().tobytes()
