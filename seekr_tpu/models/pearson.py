"""Public pearson() — all-pairs Pearson similarity of two count matrices.

Reference parity: seekr/pearson.py:32-44 (row standardization with
population std, inner product divided by the column count, optional .npy
save).  The GEMM runs on the accelerator; inputs/outputs are host numpy.
"""

from __future__ import annotations

import numpy as np

from seekr_tpu.ops.pearson import pearson_device, pearson_blocked
# Above this output size (elements), stream row blocks instead of one GEMM
# (shared with the CLI's stream-vs-materialize decision).
from seekr_tpu.io.stream import STREAM_CELL_THRESHOLD as _BLOCK_THRESHOLD


def pearson(counts1, counts2, row_standardize: bool = True, outfile: str | None = None) -> np.ndarray:
    """Calculates a row-standardized Pearson correlation matrix on device.

    Accepts host numpy OR device (jax) arrays; device inputs (e.g. from
    ``KmerCounter.get_counts_device``) are consumed in place — only the
    [m1, m2] result crosses to the host.
    """
    import jax

    from seekr_tpu.utils.logging import stage_timer

    # device (jax) arrays pass through untouched; anything else (numpy,
    # pandas DataFrame, list) is materialized as float32 numpy first.
    # Identity is preserved so the self-similarity case standardizes once
    # and holds one device copy (stream_pearson checks `is`).
    same = counts2 is counts1
    c1 = counts1 if isinstance(counts1, jax.Array) else np.asarray(counts1, dtype=np.float32)
    if not same and not isinstance(counts1, jax.Array) \
            and not isinstance(counts2, jax.Array) \
            and np.shape(counts1) == np.shape(counts2):
        # equal-content host arrays (e.g. two loads of the same artifact)
        # are a self-comparison too; buys the single-standardize +
        # exact-symmetry path below (never attempted on device arrays:
        # it would fetch them over the wire just to check)
        same = _equal_content(np.asarray(counts1), np.asarray(counts2))
    c2 = c1 if same else (counts2 if isinstance(counts2, jax.Array)
                          else np.asarray(counts2, dtype=np.float32))
    m1, m2 = c1.shape[0], c2.shape[0]
    with stage_timer("pearson", items=m1 * m2, unit="cells"):
        if m1 * m2 > _BLOCK_THRESHOLD:
            dist = pearson_blocked(c1, c2, row_standardize=row_standardize)
        else:
            dist = np.asarray(pearson_device(c1, c2, row_standardize=row_standardize))
    if same:
        if not dist.flags.writeable:
            # the sub-threshold path's np.asarray(jax.Array) is a
            # zero-copy READ-ONLY view of the device buffer
            dist = dist.copy()
        # self-similarity must be EXACTLY symmetric, like the reference's
        # np.inner output (its (i,j) and (j,i) are the same row-dot-row
        # reduction).  The blocked device GEMM computes them in
        # different-shaped row-block tiles whose documented ~1e-5
        # retiling differences would otherwise flip downstream 5-dp
        # symmetry detection (adj_pval.py triu-vs-full) at large m.
        # Canonical value = the upper triangle's.
        _mirror_upper_inplace(dist)
    if outfile:
        np.save(outfile, dist)
    return dist


def _equal_content(a1: np.ndarray, a2: np.ndarray) -> bool:
    """Same-shape content equality, NaN-tolerant, cheap on mismatches.

    A strided row probe rejects genuinely different matrices in O(m/8)
    rows; only a probe match pays the full confirm, and that runs in
    row chunks so the equal_nan machinery's isnan masks / masked copies
    stay bounded (a monolithic array_equal(equal_nan=True) on GENCODE-
    scale inputs would transiently allocate multiple GB).  equal_nan:
    computed-std counts can carry NaN columns (documented kmer_counts
    behavior); int inputs (the reference's own test matrices) don't
    support equal_nan, hence the fallback.
    """
    def _eq(x, y):
        try:
            return np.array_equal(x, y, equal_nan=True)
        except TypeError:
            return np.array_equal(x, y)

    if a1.ndim != 2:
        return _eq(a1, a2)
    rows = a1.shape[0]
    step = max(1, rows // 8)
    if not _eq(a1[::step], a2[::step]):
        return False
    per_row = a1.shape[1] or 1
    chunk = max(1, (1 << 24) // per_row)  # <=16M elements of temporaries
    for i in range(0, rows, chunk):
        if not _eq(a1[i:i + chunk], a2[i:i + chunk]):
            return False
    return True


def mirror_upper_inplace(a: np.ndarray, block: int = 4096) -> None:
    """Copy the strict upper triangle over the lower, blockwise (no
    full-size temporary; ~ms per GB on host).

    The canonical-symmetry primitive for self-similarity matrices: every
    in-memory self-Pearson producer (this module, models.workflow's
    big_pearson, find_pval's mesh collector) runs it so downstream 5-dp
    symmetric detection behaves like the reference's bitwise-symmetric
    np.inner output.
    """
    m = a.shape[0]
    for i0 in range(0, m, block):
        i1 = min(i0 + block, m)
        if i0:
            a[i0:i1, :i0] = a[:i0, i0:i1].T
        # diagonal block: mirror its own strict upper triangle
        d = a[i0:i1, i0:i1]
        il = np.tril_indices(i1 - i0, -1)
        d[il] = d.T[il]


_mirror_upper_inplace = mirror_upper_inplace  # existing-test alias


# `from seekr_tpu.models import pearson` yields the FUNCTION while
# `import seekr_tpu.models.pearson` yields this module — making the
# module callable keeps `seekr_tpu.models.pearson(...)` and
# `seekr_tpu.models.pearson.pearson(...)` both working in one process
# (same collision fix as the top-level reference-layout shims).
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(pearson)


_sys.modules[__name__].__class__ = _CallableModule
