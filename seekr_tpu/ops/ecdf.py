"""Empirical-CDF p-values on device.

Replaces the reference's O(N) Python loop per matrix cell
(seekr/find_pval.py:157-164: ``p[i,j] = sum(fitres > sim[i,j]) / N``) with a
sort-once + vectorized ``searchsorted`` — O(N log N) preprocessing and
O(log N) per cell, fully on the accelerator.

``count > r`` equals ``N - (# elements <= r)``; ``searchsorted(side='right')``
gives exactly the count of background values <= r, so the two formulations
agree bit-for-bit for every r (including ties).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def ecdf_sf(background_sorted: jax.Array, r: jax.Array) -> jax.Array:
    """Empirical survival function P(X > r) per element of ``r``.

    background_sorted: [N] ascending float32.
    r: any shape.
    Returns float32 of r's shape.
    """
    n = background_sorted.shape[0]
    le = jnp.searchsorted(background_sorted, r.astype(background_sorted.dtype), side="right")
    return (n - le).astype(jnp.float32) / jnp.float32(n)


def empirical_pvals(background, sim) -> jax.Array:
    """p-values for a similarity matrix against a 1-D background sample."""
    bkg = jnp.sort(jnp.asarray(background).ravel())
    return ecdf_sf(bkg, jnp.asarray(sim))
