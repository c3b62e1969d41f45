"""Multiple-comparison correction of a p-value DataFrame.

Behavioral parity with seekr/adj_pval.py:61-129, backed by the in-house
``seekr_tpu.stats.multitest.multipletests`` (statsmodels-free):

  * symmetric input (detected by 5-decimal-rounded transpose equality with
    the diagonal excluded, seekr/adj_pval.py:53-59) -> only the upper
    triangle (k=1) is corrected; lower triangle + diagonal become NaN.
  * otherwise the full flattened matrix is corrected and reshaped back.
"""

from __future__ import annotations

import numpy as np

from seekr_tpu.stats.multitest import multipletests


def _tiled_symmetric(values: np.ndarray, tile: int = 1024) -> bool:
    """Cache-blocked ``round(a, 5) == round(a, 5).T`` with NaN == NaN.

    Comparing against a full-matrix transpose view is a strided walk over
    the whole array (~25 s at 13k x 13k); comparing mirror tiles keeps
    both operands cache-resident (~0.1 s) and exits on the first
    asymmetric tile.
    """
    m = values.shape[0]
    if values.dtype == np.float64 and values.flags.c_contiguous:
        from seekr_tpu import native
        from seekr_tpu.utils.adj import _NATIVE_MIN_M
        if native.host_stats_native_ok(m, _NATIVE_MIN_M):
            try:
                # native path rounds per-tile instead of materialising a
                # full rounded copy; bit-identical np.round(x, 5) ops
                return native.sym_round5(values)
            except (RuntimeError, ValueError):
                pass
    r = np.round(values, 5)
    for i0 in range(0, m, tile):
        a_row = r[i0:i0 + tile]
        for j0 in range(i0, m, tile):
            a = a_row[:, j0:j0 + tile]
            bt = r[j0:j0 + tile, i0:i0 + tile].T
            eq = a == bt
            if not eq.all():
                if not (eq | (np.isnan(a) & np.isnan(bt))).all():
                    return False
    return True


def is_symmetric(df) -> bool:
    """Transpose equality ignoring the diagonal, rounded to 5 decimals.

    Same decision as the reference's ``rounded.equals(rounded.T)``
    (seekr/adj_pval.py:53-59): axis labels must match (``DataFrame.equals``
    compares the axes) and values must be 5-decimal transpose-equal with
    NaNs considered equal. Homogeneous numeric frames take a tiled numpy
    path; anything else falls back to the literal pandas comparison.
    """
    if len(set(df.dtypes)) == 1 and df.dtypes.iloc[0].kind in "fiu":
        if not df.index.equals(df.columns):
            return False
        return _tiled_symmetric(df.to_numpy())
    df_no_diag = df.where(~np.eye(df.shape[0], dtype=bool))
    rounded = np.round(df_no_diag, 5)
    return rounded.equals(rounded.T)


def adj_pval(pvals, method, alpha=0.05, outputname=None):
    import pandas as pd

    if not isinstance(pvals, pd.DataFrame):
        print("The input pvals is not a dataframe. Please check the input.")
        return None

    if pvals.shape[0] == pvals.shape[1] and is_symmetric(pvals):
        print("The input pvals is a symmetric matrix. Only the upper "
              "triangle of the matrix (excluding diagonal) is used for "
              "multiple comparison correction.")
        from seekr_tpu.utils.adj import triu_fill, triu_values

        adj = multipletests(triu_values(pvals.to_numpy()), alpha=alpha,
                            method=method)[1]
        out = triu_fill(pvals.shape[0], adj)
        # copy=False: wrapping the 10^8.5-cell result without another
        # full-matrix copy (the array is not aliased elsewhere)
        adj_df = pd.DataFrame(out, index=pvals.index, columns=pvals.columns,
                              copy=False)
    else:
        print("The input pvals is not a symmetric matrix. The total matrix "
              "is used for multiple comparison correction.")
        adj = multipletests(np.ravel(pvals.to_numpy()), alpha=alpha,
                            method=method)[1]
        adj_df = pd.DataFrame(adj.reshape(pvals.shape), index=pvals.index,
                              columns=pvals.columns, copy=False)

    if outputname:
        adj_df.to_csv(f"{outputname}.csv")
    return adj_df
