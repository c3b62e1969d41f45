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
    c2 = c1 if same else (counts2 if isinstance(counts2, jax.Array)
                          else np.asarray(counts2, dtype=np.float32))
    m1, m2 = c1.shape[0], c2.shape[0]
    with stage_timer("pearson", items=m1 * m2, unit="cells"):
        if m1 * m2 > _BLOCK_THRESHOLD:
            dist = pearson_blocked(c1, c2, row_standardize=row_standardize)
        else:
            dist = np.asarray(pearson_device(c1, c2, row_standardize=row_standardize))
    if outfile:
        np.save(outfile, dist)
    return dist


# `from seekr_tpu.models import pearson` yields the FUNCTION while
# `import seekr_tpu.models.pearson` yields this module — making the
# module callable keeps `seekr_tpu.models.pearson(...)` and
# `seekr_tpu.models.pearson.pearson(...)` both working in one process
# (same collision fix as the top-level reference-layout shims).
import sys as _sys


class _CallableModule(_sys.modules[__name__].__class__):
    __call__ = staticmethod(pearson)


_sys.modules[__name__].__class__ = _CallableModule
