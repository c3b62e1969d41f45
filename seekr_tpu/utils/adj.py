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

# below this edge size the numpy row-slice loops win on launch overhead;
# SEEKR_TPU_HOST_SORT={numpy,native} overrides via the shared gate
_NATIVE_MIN_M = 2048


def _native_ok(mat: np.ndarray, m: int) -> bool:
    if (not isinstance(mat, np.ndarray) or mat.dtype != np.float64
            or not mat.flags.c_contiguous):
        return False
    from seekr_tpu.native import host_stats_native_ok
    return host_stats_native_ok(m, _NATIVE_MIN_M)


def triu_values(mat: np.ndarray) -> np.ndarray:
    """Upper-triangle (k=1) values in row-major order.

    Identical output to ``mat[np.triu_indices(m, 1)]`` but via row-slice
    copies: the index-array route materializes two m(m-1)/2 int64
    vectors and does one random-access gather per element (~35 s at
    m=13k on faulted pages); sequential slice copies run in ~0.2 s.
    """
    m = mat.shape[0]
    if _native_ok(mat, m):
        from seekr_tpu import native
        try:
            return native.triu_values_f64(mat)
        except (RuntimeError, ValueError):
            pass
    out = np.empty(m * (m - 1) // 2, dtype=mat.dtype)
    pos = 0
    for i in range(m - 1):
        row = mat[i, i + 1:]
        out[pos:pos + row.size] = row
        pos += row.size
    return out


def triu_fill(m: int, flat: np.ndarray, fill=np.nan) -> np.ndarray:
    """Scatter a row-major upper-triangle vector back into an m x m matrix.

    Inverse of :func:`triu_values`; everything outside the strict upper
    triangle becomes ``fill``. Row-slice writes for the same reason as
    the gather.
    """
    if isinstance(flat, np.ndarray) and flat.dtype == np.float64:
        from seekr_tpu import native
        if native.host_stats_native_ok(m, _NATIVE_MIN_M):
            try:
                return native.triu_fill_f64(m, flat, fill=fill)
            except (RuntimeError, ValueError, TypeError):
                pass
    # match the native path's float64-only contract: an integer flat
    # with the default fill=np.nan would silently cast NaN to INT_MIN
    flat = np.asarray(flat)
    dtype = flat.dtype if np.issubdtype(flat.dtype, np.floating) \
        else np.float64
    out = np.full((m, m), fill, dtype=dtype)
    pos = 0
    for i in range(m - 1):
        cnt = m - i - 1
        out[i, i + 1:] = flat[pos:pos + cnt]
        pos += cnt
    return out


def triu_index_to_ij(m: int, t) -> tuple:
    """Map row-major strict-upper-triangle flat indices to (i, j) pairs.

    Inverse of the layout :func:`triu_values` emits: row i contributes the
    m-1-i values (i, i+1)..(i, m-1) starting at flat offset
    i*m - i*(i+1)/2.  Vectorized via searchsorted on the per-row offsets
    (an [m] int64 array — trivial even at m=180k), so sampled find_dist can
    turn pool indices into gather coordinates without any m^2 structure.
    """
    t = np.asarray(t, dtype=np.int64)
    rows = np.arange(m, dtype=np.int64)
    offsets = rows * m - (rows * (rows + 1)) // 2
    i = np.searchsorted(offsets, t, side="right") - 1
    j = t - offsets[i] + i + 1
    return i, j


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
