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
            and not isinstance(counts2, jax.Array):
        # equal-content host arrays (e.g. two loads of the same artifact)
        # are a self-comparison too — the compare is ~ms against a
        # multi-second GEMM and buys the single-standardize +
        # exact-symmetry path below (never attempted on device arrays:
        # it would fetch them over the wire just to check)
        same = (np.shape(counts1) == np.shape(counts2)
                and np.array_equal(np.asarray(counts1), np.asarray(counts2)))
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


def _mirror_upper_inplace(a: np.ndarray, block: int = 4096) -> None:
    """Copy the strict upper triangle over the lower, blockwise (no
    full-size temporary; ~ms per GB on host)."""
    m = a.shape[0]
    for i0 in range(0, m, block):
        i1 = min(i0 + block, m)
        if i0:
            a[i0:i1, :i0] = a[:i0, i0:i1].T
        # diagonal block: mirror its own strict upper triangle
        d = a[i0:i1, i0:i1]
        il = np.tril_indices(i1 - i0, -1)
        d[il] = d.T[il]


# `from seekr_tpu.models import pearson` yields the FUNCTION while
# `import seekr_tpu.models.pearson` yields this module — making the
# module callable keeps `seekr_tpu.models.pearson(...)` and
# `seekr_tpu.models.pearson.pearson(...)` both working in one process
# (same collision fix as the top-level reference-layout shims).
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(pearson)


_sys.modules[__name__].__class__ = _CallableModule
