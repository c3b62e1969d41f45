"""Empirical-CDF p-values.

Replaces the reference's O(N) Python loop per matrix cell
(seekr/find_pval.py:157-164: ``p[i,j] = sum(fitres > sim[i,j]) / N``) with a
sort-once + vectorized ``searchsorted`` — O(N log N) preprocessing and
O(log N) per cell.

``count > r`` equals ``N - (# elements <= r)``; ``searchsorted(side='right')``
gives exactly the count of background values <= r, so the two formulations
agree exactly for every r, including ties.

Two implementations:
  * ``empirical_pvals`` — host numpy in float64.  Exact reproduction of the
    reference comparison semantics (numpy promotes float32 sim vs float64
    background to float64); used by find_pval.
  * ``ecdf_sf`` — float32 device op for use inside jit pipelines (sharded /
    fused paths) where the inputs are already float32 device arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_total",))
def ecdf_sf(background_sorted: jax.Array, r: jax.Array,
            n_total=None) -> jax.Array:
    """Device empirical survival function P(X > r) per element of ``r``.

    background_sorted: [N] ascending, FINITE values only (drop NaNs before
    sorting — they would sort past every insertion point and count as
    greater).  ``n_total``: the ORIGINAL sample size including any dropped
    NaNs — the reference's ``mean(bkg > r)`` keeps NaNs in the denominator
    while they count as not-greater, so dividing by the finite count alone
    would inflate every p-value on a NaN-containing background.  Defaults
    to N (correct when nothing was dropped).  Comparisons happen in the
    background's dtype (float32 under default JAX config).
    """
    n = background_sorted.shape[0]
    denom = n if n_total is None else int(n_total)
    le = jnp.searchsorted(background_sorted, r.astype(background_sorted.dtype), side="right")
    return (n - le).astype(jnp.float32) / jnp.float32(denom)


class SortedBackground:
    """Sort-once wrapper for repeated ECDF evaluations.

    The per-call cost of ``empirical_pvals`` is dominated by the
    O(N log N) sort of an UNCHANGED background — the serving path
    evaluates per query and streamed find_pval per tile, so hoisting the
    sort pays N-fold.  ``pvals`` is bitwise-identical to
    ``empirical_pvals`` on the same background.
    """

    def __init__(self, background):
        bkg = np.asarray(background, dtype=np.float64).ravel()
        self.n_total = len(bkg)
        self.finite = np.sort(bkg[~np.isnan(bkg)])

    def pvals(self, sim) -> np.ndarray:
        r = np.asarray(sim, dtype=np.float64)
        le = np.searchsorted(self.finite, r, side="right")
        return ((len(self.finite) - le) / self.n_total).astype(np.float64)


def empirical_pvals(background, sim) -> np.ndarray:
    """Host p-values for a similarity matrix against a 1-D background sample.

    Promotes to float64 like the reference's ``fitres > sim[i, j]``
    comparison, so near-tie values within float32 eps resolve identically.
    NaN background entries compare False in the reference's ``mean(bkg > r)``
    (they sort PAST every searchsorted insertion point, which would
    otherwise count them as greater) — so only finite values enter the
    numerator while the denominator keeps the full sample size.

    Repeated evaluations against the SAME background should construct one
    :class:`SortedBackground` instead (the sort here is per-call).
    """
    return SortedBackground(background).pvals(sim)
