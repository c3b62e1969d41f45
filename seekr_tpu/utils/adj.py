"""Adjacency-matrix input coercion (legacy ``seekr.utils.get_adj``).

Reconstructs the legacy 1.x helper the reference removed in its 2.0
rewrite; behavior pinned by its shipped legacy tests
(/root/reference/seekr/tests/test_utils.py): ndarray and DataFrame pass
through unchanged, a ``.npy`` path loads to an ndarray, and any other
path is read as a labeled CSV DataFrame.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def get_adj(adj):
    """Coerce an adjacency input (ndarray / DataFrame / path) for graph use.

    Paths ending in ``.npy`` load as a bare ndarray; any other path is
    treated as a labeled CSV (first column = index). In-memory arrays
    and DataFrames are returned as-is (no copy).
    """
    if isinstance(adj, (str,)) or hasattr(adj, "__fspath__"):
        path = str(adj)
        if path.endswith(".npy"):
            return np.load(path)
        return pd.read_csv(path, index_col=0)
    return adj
