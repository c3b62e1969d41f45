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


def is_symmetric(df) -> bool:
    """Transpose equality ignoring the diagonal, rounded to 5 decimals."""
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
        triu = np.triu_indices_from(pvals, k=1)
        adj = multipletests(pvals.values[triu], alpha=alpha, method=method)[1]
        out = np.full(pvals.shape, np.nan)
        out[triu] = adj
        adj_df = pd.DataFrame(out, index=pvals.index, columns=pvals.columns)
    else:
        print("The input pvals is not a symmetric matrix. The total matrix "
              "is used for multiple comparison correction.")
        adj = multipletests(pvals.to_numpy().flatten(), alpha=alpha,
                            method=method)[1]
        adj_df = pd.DataFrame(adj.reshape(pvals.shape), index=pvals.index,
                              columns=pvals.columns)

    if outputname:
        adj_df.to_csv(f"{outputname}.csv")
    return adj_df
