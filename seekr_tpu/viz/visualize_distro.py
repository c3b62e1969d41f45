"""Distribution plot of r-values (legacy ``seekr_visualize_distro``).

Reconstructs the legacy 1.x capability the reference dropped in its 2.0
rewrite (CHANGELOG 1.3.0 "seekr_visualize_distro command makes
distribution of r-values"; 1.4.0 "Let seekr_visualize_distro handle
other matrices").  No shipped tests pin it, so the contract is this
module's own: load a similarity/adjacency matrix (``.npy`` or labeled
CSV), take its strict upper triangle when square-and-symmetric (each
pair once, self-correlations excluded) else all finite values, and save
a histogram with summary statistics in the title.

Its 2.0-era successor is ``seekr_find_dist(plotfit=...)``, which fits
named distributions; this command is the quick look at the raw values.
"""

from __future__ import annotations

import numpy as np

from seekr_tpu.utils.adj import get_adj, triu_values
from seekr_tpu.viz.style import save_figure, setup_fonts


def distro_values(adj) -> np.ndarray:
    """Finite r-values of a matrix: strict upper triangle when the
    matrix is square and symmetric (5-decimal tolerance, same detector
    as adj_pval — GEMM roundoff must not flip a similarity matrix into
    the double-counting branch), else every cell."""
    from seekr_tpu.stats.adj_pval import _tiled_symmetric

    loaded = get_adj(adj)  # ndarray for .npy, DataFrame for CSV/in-memory
    mat = np.asarray(loaded, dtype=np.float64)
    if mat.ndim != 2:
        raise ValueError("expected a 2D matrix of r-values")
    if mat.shape[0] == mat.shape[1] and _tiled_symmetric(mat):
        vals = triu_values(mat)
        return vals[np.isfinite(vals)]
    vals = np.ravel(mat)
    return vals[np.isfinite(vals)]


def visualize_distro(adj, outputname="distro", bins=100,
                     xlabelsize=20, ylabelsize=20, xticksize=16,
                     yticksize=16, pformat="pdf", pdpi=300):
    """Histogram of a matrix's r-value distribution.

    Parameters
    ----------
    adj : similarity matrix — ndarray, DataFrame, or ``.npy``/CSV path
    outputname : output path without extension
    bins : histogram bin count
    pformat / pdpi : figure format and resolution (style.py fallback
        rules apply)
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    setup_fonts()
    vals = distro_values(adj)
    if vals.size == 0:
        print("The input matrix has no finite values. No plot is produced.")
        return None

    fig, ax = plt.subplots(figsize=(10, 6))
    ax.hist(vals, bins=int(bins), color="#4878CF", edgecolor="white",
            linewidth=0.3)
    ax.set_xlabel("r-value", fontsize=xlabelsize)
    ax.set_ylabel("count", fontsize=ylabelsize)
    ax.tick_params(axis="x", labelsize=xticksize)
    ax.tick_params(axis="y", labelsize=yticksize)
    ax.set_title(
        f"n={vals.size}  mean={vals.mean():.4f}  sd={vals.std():.4f}  "
        f"median={np.median(vals):.4f}", fontsize=xlabelsize)
    fig.tight_layout()
    save_figure(outputname, pformat, pdpi)
    plt.close(fig)
    return vals
