"""Fast, bitwise-identical CDFs for the distributions find_dist fits.

The reference's fitted p-value branch evaluates a frozen scipy
distribution's ``cdf`` over the whole similarity matrix
(seekr/find_pval.py:126-133).  ``rv_continuous.cdf`` pays heavy
per-call machinery (arg parsing/validation, masking, ``argsreduce``
compression) — measured 7-126 s for a 169M-cell GENCODE-scale matrix —
while the underlying ``scipy.special`` ufuncs run at tens of millions
of evaluations per second and release the GIL.

This module re-implements the wrapper arithmetic of
``rv_continuous.cdf`` exactly for the ten ``common10`` distributions
(scipy _continuous_distns ``_cdf`` one-liners, same operation order,
same float64 promotion, same open-support/NaN/invalid-argument
semantics), evaluated over row blocks on a thread pool.  Output is
bitwise-equal to the frozen-distribution path — enforced by
tests/test_fast_cdf.py — so no size gate or tolerance is needed;
``fast_cdf`` returns None for anything it does not support and callers
fall back to scipy.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import scipy.special as sc

_INF = np.inf

# name -> (n_shape_params, (support_lo, support_hi), standardized cdf)
# formulas mirror scipy.stats._continuous_distns *_gen._cdf verbatim
_FORMULAS = {
    "norm": (0, (-_INF, _INF), lambda z: sc.ndtr(z)),
    "cauchy": (0, (-_INF, _INF), lambda z: np.arctan2(1, -z) / np.pi),
    "expon": (0, (0.0, _INF), lambda z: -sc.expm1(-z)),
    "gamma": (1, (0.0, _INF), lambda z, a: sc.gammainc(a, z)),
    "lognorm": (1, (0.0, _INF), lambda z, s: sc.ndtr(np.log(z) / s)),
    "chi2": (1, (0.0, _INF), lambda z, df: sc.chdtr(df, z)),
    "pareto": (1, (1.0, _INF), lambda z, b: 1 - z ** (-b)),
    "rayleigh": (0, (0.0, _INF), lambda z: -sc.expm1(-0.5 * z ** 2)),
    "exponpow": (1, (0.0, _INF),
                 lambda z, b: -sc.expm1(-sc.expm1(z ** b))),
    "uniform": (0, (0.0, 1.0), lambda z: z),
}

_MIN_PARALLEL = 1 << 20


def _eval_blockwise(fn, z, shapes):
    """Elementwise ``fn(z, *shapes)`` over row blocks on threads.

    The special-function ufuncs release the GIL, so a small pool gives a
    near-linear speedup on the multi-megabyte matrices this is for;
    elementwise purity keeps the result bitwise-equal to one full call.
    Out-of-support points are evaluated and discarded (scipy evaluates
    only the valid subset), so warnings are suppressed locally.
    """
    with np.errstate(all="ignore"):
        if z.size < _MIN_PARALLEL or z.ndim == 0:
            return fn(z, *shapes)
        flat = z.reshape(-1)
        out = np.empty_like(flat)
        n_threads = 4
        block = (len(flat) + n_threads - 1) // n_threads

        def run(t):
            lo = t * block
            hi = min(len(flat), lo + block)
            with np.errstate(all="ignore"):  # errstate is thread-local
                out[lo:hi] = fn(flat[lo:hi], *shapes)

        with ThreadPoolExecutor(n_threads) as pool:
            list(pool.map(run, range(n_threads)))
        return out.reshape(z.shape)


def fast_cdf(distname: str, params, x):
    """``getattr(scipy.stats, distname)(*params).cdf(x)``, bitwise-equal.

    Returns the float64 cdf array, or None when ``distname``/``params``
    fall outside the supported set (caller falls back to scipy).  The
    wrapper arithmetic replicates rv_continuous.cdf: float64 promotion
    of ``(x - loc) / scale`` via 0-d array operands, cdf on the OPEN
    support interval, 1.0 at/above the upper bound, 0.0 at/below the
    lower bound, NaN for NaN inputs or invalid (non-positive scale /
    shape) parameters.

    The bitwise guarantee is pinned to the installed scipy's ``_cdf``
    formulas, which can change between versions (cauchy's arctan2 form,
    for one, is recent) — so the first call per (distribution, params)
    runs a small probe grid through both this path and the frozen scipy
    distribution BEFORE any full-size evaluation and compares exactly;
    any mismatch routes that combination to scipy for the life of the
    process (the grid is ~a dozen points, so re-probing new params is
    free next to one matrix evaluation).
    """
    if str(distname) not in _FORMULAS:
        return None
    if not _probe_ok(str(distname), params):
        return None
    return _fast_cdf_impl(distname, params, x)


_PROBE_VERDICTS: dict = {}


def _probe_ok(distname: str, params) -> bool:
    """Exactness spot check vs frozen scipy, memoized per (dist, params).

    The grid spans both support sides, the open interval, extreme |z|
    (asymptotic branches), and NaN.  Anything the probe itself cannot
    evaluate (array-valued params, wrong arity — scipy would raise on
    the real call too) fails closed to the scipy path, uncached.
    """
    try:
        key = (distname, tuple(float(p) for p in params))
    except (TypeError, ValueError):
        return False  # array-valued/odd params: scipy path
    verdict = _PROBE_VERDICTS.get(key)
    if verdict is None:
        import scipy.stats as st

        base = np.array([-1e9, -2.5, -1.0, 0.0, 0.3, 0.7, 1.0, 1.5,
                         4.0, 25.0, 1e9, np.nan])
        # ALSO probe in the fitted frame: for params like loc=500 the
        # fixed x-grid lands entirely on the saturated tails (both paths
        # return exactly 0/1 there), and a scipy _cdf formula drift in
        # the central range would slip past the probe.  loc/scale are
        # the last two params for every scipy loc-scale family.
        if len(params) >= 2:
            loc, scale = float(params[-2]), float(params[-1])
            probe = np.concatenate([base, loc + scale * base])
        else:
            probe = base
        with np.errstate(all="ignore"):
            try:
                want = getattr(st, distname)(*params).cdf(probe)
            except Exception:
                verdict = False
            else:
                got = _fast_cdf_impl(distname, params, probe)
                verdict = (got is not None
                           and np.array_equal(want, got, equal_nan=True))
        _PROBE_VERDICTS[key] = verdict
    return verdict


def _fast_cdf_impl(distname: str, params, x):
    """The re-implemented rv_continuous.cdf arithmetic (see fast_cdf)."""
    spec = _FORMULAS.get(str(distname))
    if spec is None:
        return None
    n_shapes, (lo_a, lo_b), fn = spec
    params = tuple(params)
    if not (n_shapes <= len(params) <= n_shapes + 2):
        return None  # scipy would raise; let it
    shapes = params[:n_shapes]
    loc = params[n_shapes] if len(params) > n_shapes else 0.0
    scale = params[n_shapes + 1] if len(params) > n_shapes + 1 else 1.0

    x = np.asarray(x)
    loc_a = np.asarray(loc)
    scale_a = np.asarray(scale)
    shape_ok = all(np.asarray(s).ndim == 0 for s in shapes)
    if (x.dtype.kind not in "fiu" or loc_a.dtype.kind not in "fiu"
            or scale_a.dtype.kind not in "fiu" or loc_a.ndim
            or scale_a.ndim or not shape_ok):
        return None  # array-valued params: take the scipy path
    dtyp = np.promote_types(x.dtype, np.float64)
    z = np.asarray((x - loc_a) / scale_a, dtype=dtyp)

    shape_arrs = tuple(np.asarray(s) for s in shapes)
    argcheck = all(np.all(s > 0) for s in shape_arrs)
    cond0 = bool(argcheck) and bool(scale_a > 0)

    output = np.zeros(z.shape, dtyp)
    if not cond0:
        output[...] = np.nan
        return output
    cond1 = (lo_a < z) & (z < lo_b)
    cond2 = z >= lo_b
    vals = _eval_blockwise(fn, z, shape_arrs)
    np.copyto(output, 1.0, where=cond2)
    np.copyto(output, vals, where=cond1)
    np.copyto(output, np.nan, where=np.isnan(z))
    return output
