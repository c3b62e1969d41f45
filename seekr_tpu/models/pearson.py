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
    """Calculates a row-standardized Pearson correlation matrix on device."""
    from seekr_tpu.utils.logging import stage_timer

    c1 = np.asarray(counts1, dtype=np.float32)
    # np.asarray is a no-copy pass-through, so identical inputs (the
    # self-similarity case) stay the SAME object and the blocked path's
    # stream_pearson standardizes once and holds one device copy
    c2 = c1 if counts2 is counts1 else np.asarray(counts2, dtype=np.float32)
    with stage_timer("pearson", items=c1.shape[0] * c2.shape[0], unit="cells"):
        if c1.shape[0] * c2.shape[0] > _BLOCK_THRESHOLD:
            dist = pearson_blocked(c1, c2, row_standardize=row_standardize)
        else:
            dist = np.asarray(pearson_device(c1, c2, row_standardize=row_standardize))
    if outfile:
        np.save(outfile, dist)
    return dist
