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

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def ecdf_sf(background_sorted: jax.Array, r: jax.Array) -> jax.Array:
    """Device empirical survival function P(X > r) per element of ``r``.

    background_sorted: [N] ascending, FINITE values only (drop NaNs before
    sorting — they would sort past every insertion point and count as
    greater).  Comparisons happen in the background's dtype (float32 under
    default JAX config).
    """
    n = background_sorted.shape[0]
    le = jnp.searchsorted(background_sorted, r.astype(background_sorted.dtype), side="right")
    return (n - le).astype(jnp.float32) / jnp.float32(n)


def empirical_pvals(background, sim) -> np.ndarray:
    """Host p-values for a similarity matrix against a 1-D background sample.

    Promotes to float64 like the reference's ``fitres > sim[i, j]``
    comparison, so near-tie values within float32 eps resolve identically.
    NaN background entries compare False in the reference's ``mean(bkg > r)``
    (they sort PAST every searchsorted insertion point, which would
    otherwise count them as greater) — so only finite values enter the
    numerator while the denominator keeps the full sample size.
    """
    bkg = np.asarray(background, dtype=np.float64).ravel()
    n_total = len(bkg)
    finite = np.sort(bkg[~np.isnan(bkg)])
    r = np.asarray(sim, dtype=np.float64)
    le = np.searchsorted(finite, r, side="right")
    return ((len(finite) - le) / n_total).astype(np.float64)
