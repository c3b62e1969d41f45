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

    background_sorted: [N] ascending.  Comparisons happen in the
    background's dtype (float32 under default JAX config).
    """
    n = background_sorted.shape[0]
    le = jnp.searchsorted(background_sorted, r.astype(background_sorted.dtype), side="right")
    return (n - le).astype(jnp.float32) / jnp.float32(n)


def empirical_pvals(background, sim) -> np.ndarray:
    """Host p-values for a similarity matrix against a 1-D background sample.

    Promotes to float64 like the reference's ``fitres > sim[i, j]``
    comparison, so near-tie values within float32 eps resolve identically.
    """
    bkg = np.sort(np.asarray(background, dtype=np.float64).ravel())
    r = np.asarray(sim, dtype=np.float64)
    le = np.searchsorted(bkg, r, side="right")
    return ((len(bkg) - le) / len(bkg)).astype(np.float64)
